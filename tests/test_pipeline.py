"""Pipeline parallelism: schedule correctness, grads, quantized stages,
pp x dp composition, remat."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.ops.linear import linear
from ao_tpu.parallel.pipeline import (
    pipeline_apply, shard_stage_params, stack_stage_params, stage_pspecs,
)
from ao_tpu.parallel.sharding import make_mesh
from jax.sharding import PartitionSpec as P


def _mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + x


def _make_stages(key, n_stages, d, hidden):
    stages = []
    for i in range(n_stages):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        stages.append({
            "w1": jax.random.normal(k1, (d, hidden), jnp.float32) * 0.1,
            "b1": jnp.zeros((hidden,), jnp.float32),
            "w2": jax.random.normal(k2, (hidden, d), jnp.float32) * 0.1,
        })
    return stages


def _sequential(stage_fn, stages, microbatches):
    outs = []
    for m in range(microbatches.shape[0]):
        x = microbatches[m]
        for sp in stages:
            x = stage_fn(sp, x)
        outs.append(x)
    return jnp.stack(outs)


@pytest.mark.parametrize("n_mb", [4, 7, 2])
def test_pipeline_matches_sequential(n_mb):
    S, d, hidden = 4, 16, 32
    stages = _make_stages(jax.random.PRNGKey(0), S, d, hidden)
    mesh = make_mesh((S,), ("pp",))
    stacked = stack_stage_params(stages)
    mbs = jax.random.normal(jax.random.PRNGKey(1), (n_mb, 2, d), jnp.float32)

    got = pipeline_apply(_mlp_stage, stacked, mbs, mesh)
    want = _sequential(_mlp_stage, stages, mbs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_grad_matches_sequential():
    S, d, hidden, n_mb = 4, 8, 16, 6
    stages = _make_stages(jax.random.PRNGKey(2), S, d, hidden)
    mesh = make_mesh((S,), ("pp",))
    stacked = stack_stage_params(stages)
    mbs = jax.random.normal(jax.random.PRNGKey(3), (n_mb, 2, d), jnp.float32)

    def pipe_loss(sp):
        out = pipeline_apply(_mlp_stage, sp, mbs, mesh)
        return jnp.sum(out ** 2)

    def seq_loss(stage_list):
        return jnp.sum(_sequential(_mlp_stage, stage_list, mbs) ** 2)

    g_pipe = jax.grad(pipe_loss)(stacked)
    g_seq = jax.grad(seq_loss)(stages)
    g_seq_stacked = stack_stage_params(g_seq)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        g_pipe, g_seq_stacked)


def test_pipeline_remat_matches():
    S, d, hidden, n_mb = 2, 8, 16, 4
    stages = _make_stages(jax.random.PRNGKey(4), S, d, hidden)
    mesh = make_mesh((S,), ("pp",))
    stacked = stack_stage_params(stages)
    mbs = jax.random.normal(jax.random.PRNGKey(5), (n_mb, 2, d), jnp.float32)

    def loss(sp, remat):
        return jnp.sum(pipeline_apply(_mlp_stage, sp, mbs, mesh,
                                      remat=remat) ** 2)

    g0 = jax.grad(lambda sp: loss(sp, False))(stacked)
    g1 = jax.grad(lambda sp: loss(sp, True))(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
        g0, g1)


def test_pipeline_quantized_stages():
    """int8 weight-only quantized stage weights pipeline unchanged."""
    S, d, hidden, n_mb = 4, 32, 64, 4
    stages = _make_stages(jax.random.PRNGKey(6), S, d, hidden)
    qstages = [ao_tpu.quantize_(sp, ao_tpu.Int8WeightOnlyConfig())
               for sp in stages]

    def stage_fn(params, x):
        h = jnp.tanh(linear(x, params["w1"]) + params["b1"])
        return linear(h, params["w2"]) + x

    mesh = make_mesh((S,), ("pp",))
    stacked = stack_stage_params(qstages)
    sharded = shard_stage_params(stacked, mesh)
    mbs = jax.random.normal(jax.random.PRNGKey(7), (n_mb, 2, d), jnp.float32)

    got = pipeline_apply(stage_fn, sharded, mbs, mesh)
    want = _sequential(stage_fn, qstages, mbs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_pp_x_dp():
    """pp=2 x dp=2: microbatch batch dim sharded over dp."""
    S, d, hidden, n_mb = 2, 16, 32, 4
    stages = _make_stages(jax.random.PRNGKey(8), S, d, hidden)
    mesh = make_mesh((S, 2), ("pp", "dp"))
    stacked = stack_stage_params(stages)
    mbs = jax.random.normal(jax.random.PRNGKey(9), (n_mb, 4, d), jnp.float32)

    got = pipeline_apply(_mlp_stage, stacked, mbs, mesh,
                         mb_spec=P(None, "dp"))
    want = _sequential(_mlp_stage, stages, mbs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_rejects_pp_in_mb_spec():
    S, d, hidden = 2, 8, 8
    stages = _make_stages(jax.random.PRNGKey(10), S, d, hidden)
    mesh = make_mesh((S,), ("pp",))
    stacked = stack_stage_params(stages)
    mbs = jnp.zeros((2, 2, d), jnp.float32)
    with pytest.raises(ValueError):
        pipeline_apply(_mlp_stage, stacked, mbs, mesh, mb_spec=P("pp"))


def test_pipeline_rejects_stage_mesh_mismatch():
    stages = _make_stages(jax.random.PRNGKey(11), 3, 8, 8)
    mesh = make_mesh((4,), ("pp",))
    stacked = stack_stage_params(stages)
    mbs = jnp.zeros((2, 2, 8), jnp.float32)
    with pytest.raises(ValueError):
        pipeline_apply(_mlp_stage, stacked, mbs, mesh)


def test_stage_pspecs_shapes():
    stages = _make_stages(jax.random.PRNGKey(12), 2, 8, 8)
    stacked = stack_stage_params(stages)
    specs = stage_pspecs(stacked)
    assert specs["w1"] == P("pp", None, None)
    assert specs["b1"] == P("pp", None)


class TestLlamaPipeline:
    def _setup(self, quantize=None):
        from ao_tpu.models import llama

        cfg = llama.LlamaConfig(
            vocab_size=128, dim=64, n_layers=4, n_heads=4, n_kv_heads=2,
            ffn_dim=128, tie_embeddings=True, dtype=jnp.float32)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        if quantize is not None:
            params = ao_tpu.quantize_(params, quantize)
        return cfg, params

    def test_matches_plain_forward(self):
        from ao_tpu.models import llama
        from ao_tpu.parallel.pipeline import (
            pipeline_llama_forward, shard_stage_params, split_llama_stages)

        cfg, params = self._setup()
        mesh = make_mesh((2, 2), ("pp", "dp"))
        stacked = shard_stage_params(split_llama_stages(params, 2), mesh)
        toks = jax.random.randint(jax.random.PRNGKey(1), (4, 4, 8), 0, 128)

        got = jax.jit(lambda sp, t: pipeline_llama_forward(
            params, sp, t, cfg, mesh, mb_spec=P(None, "dp", None, None)
        ))(stacked, toks)
        for m in range(4):
            want, _ = llama.forward(params, toks[m], cfg)
            np.testing.assert_allclose(np.asarray(got[m]), np.asarray(want),
                                       rtol=2e-4, atol=2e-4)

    def test_quantized_stages_match(self):
        from ao_tpu.models import llama
        from ao_tpu.parallel.pipeline import (
            pipeline_llama_forward, shard_stage_params, split_llama_stages)

        cfg, qparams = self._setup(ao_tpu.Int8WeightOnlyConfig())
        mesh = make_mesh((4,), ("pp",))
        stacked = shard_stage_params(split_llama_stages(qparams, 4), mesh)
        toks = jax.random.randint(jax.random.PRNGKey(2), (4, 2, 8), 0, 128)
        got = pipeline_llama_forward(qparams, stacked, toks, cfg, mesh)
        for m in range(4):
            want, _ = llama.forward(qparams, toks[m], cfg)
            np.testing.assert_allclose(np.asarray(got[m]), np.asarray(want),
                                       rtol=2e-4, atol=2e-4)

    def test_gpipe_training_step(self):
        """grad of a pipelined LM loss w.r.t. the stacked stages is finite
        and matches the sequential model's grads on the layer leaves."""
        from ao_tpu.models import llama
        from ao_tpu.parallel.pipeline import (
            pipeline_llama_forward, shard_stage_params, split_llama_stages)

        cfg, params = self._setup()
        mesh = make_mesh((2,), ("pp",))
        toks = jax.random.randint(jax.random.PRNGKey(3), (2, 2, 8), 0, 128)

        def pipe_loss(stages):
            logits = pipeline_llama_forward(params, stages, toks, cfg, mesh,
                                            remat=True)
            return jnp.mean(logits ** 2)

        def seq_loss(layer_list):
            p = dict(params, layers=layer_list)
            tot = 0.0
            for m in range(2):
                logits, _ = llama.forward(p, toks[m], cfg)
                tot = tot + jnp.mean(logits ** 2)
            return tot / 2

        from ao_tpu.parallel.pipeline import split_llama_stages
        stacked = shard_stage_params(split_llama_stages(params, 2), mesh)
        # remat inside shard_map needs the jit (eager closed_call unsupported)
        g_pipe = jax.jit(jax.grad(pipe_loss))(stacked)
        g_seq = jax.grad(seq_loss)(list(params["layers"]))
        # reassemble seq grads into the stage stacking and compare
        per = len(params["layers"]) // 2
        g_seq_stacked = jax.tree.map(
            lambda *ls: jnp.stack([jnp.stack(ls[:per]), jnp.stack(ls[per:])]),
            *g_seq)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
            g_pipe, g_seq_stacked)
