"""Observability tests: quant logger stats, layer-wise numeric debugger,
roofline model.

(ref analog: test/prototype/test_quant_logger.py and the roofline checks in
torchao/testing/training/roofline_utils.py usage.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.utils.quant_logger import (
    attach_logger,
    clear_records,
    compare_layerwise,
    detach_logger,
    get_records,
)
from ao_tpu.utils.roofline import (
    TPU_SPECS,
    detect_tpu_spec,
    expected_quant_speedup,
    gemm_roofline_us,
    pct_speed_of_light,
)


def _cfg():
    return llama.LlamaConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
    )


class TestQuantLogger:
    def test_records_stats_under_jit(self):
        cfg = _cfg()
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        logged = attach_logger(params)
        clear_records()
        tokens = jnp.zeros((1, 4), jnp.int32)
        out, _ = jax.jit(lambda p, t: llama.forward(p, t, cfg))(logged, tokens)
        jax.block_until_ready(out)
        recs = get_records()
        # 2 layers x 7 linears
        assert any("wq" in k for k in recs)
        assert any("w2" in k for k in recs)
        r = next(iter(recs.values()))[0]
        assert r["in_absmax"] >= r["in_absmean"] >= 0

    def test_detach_restores(self):
        cfg = _cfg()
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        logged = attach_logger(params)
        back = detach_logger(logged)
        la = jax.tree_util.tree_leaves(params)
        lb = jax.tree_util.tree_leaves(back)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_logged_forward_matches_plain(self):
        cfg = _cfg()
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.zeros((1, 4), jnp.int32)
        ref, _ = llama.forward(params, tokens, cfg)
        out, _ = llama.forward(attach_logger(params), tokens, cfg)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)

    def test_compare_layerwise_flags_bad_layer(self):
        cfg = _cfg()
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        # int4-quantize only layer 1's w2 → that fqn should have the lowest
        # sqnr among mlp outputs
        qp = ao_tpu.quantize_(
            params, ao_tpu.Int4WeightOnlyConfig(group_size=16),
            filter_fn=lambda f, l: f == "layers.1.mlp.w2",
        )
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        scores = compare_layerwise(
            params, qp,
            lambda p: llama.forward(p, tokens, cfg)[0],
        )
        assert scores, "no layers captured"
        worst = min(scores, key=scores.get)
        assert worst == "layers.1.mlp.w2", scores


class TestRoofline:
    def test_decode_gemm_is_memory_bound(self):
        r = gemm_roofline_us(8, 4096, 4096, spec=TPU_SPECS["v5e"])
        assert r["bound"] == "memory"

    def test_prefill_gemm_is_compute_bound(self):
        r = gemm_roofline_us(8192, 4096, 4096, spec=TPU_SPECS["v5e"])
        assert r["bound"] == "compute"

    def test_int4_decode_speedup_near_4x(self):
        s = expected_quant_speedup(8, 4096, 14336, weight_bits=4,
                                   spec=TPU_SPECS["v5e"])
        assert 3.0 < s < 4.2, s

    def test_w8a8_prefill_speedup_from_int8_math(self):
        s = expected_quant_speedup(8192, 4096, 4096, weight_bits=8,
                                   act_bits=8, spec=TPU_SPECS["v5e"])
        assert 1.5 < s <= 2.2, s

    def test_pct_sol(self):
        r = gemm_roofline_us(8, 4096, 4096, spec=TPU_SPECS["v5e"])
        assert abs(pct_speed_of_light(
            r["roofline_us"] * 2, 8, 4096, 4096, spec=TPU_SPECS["v5e"]
        ) - 0.5) < 1e-6

    def test_detect_never_raises(self):
        assert detect_tpu_spec().name in TPU_SPECS


class TestBenchmarkUtils:
    def test_memory_footprint_ratio(self):
        import ao_tpu
        from ao_tpu.utils.benchmark import memory_footprint

        w = jax.random.normal(jax.random.PRNGKey(0), (256, 256), jnp.float32)
        dense = memory_footprint({"kernel": w})
        q = ao_tpu.quantize_({"kernel": w},
                             ao_tpu.Int4WeightOnlyConfig(group_size=64))
        quant = memory_footprint(q)
        assert dense["hp_bytes"] == 256 * 256 * 4
        assert quant["quantized_bytes"] == 256 * 256 // 2  # packed nibbles
        assert quant["total_bytes"] < dense["total_bytes"] / 4

    def test_profiler_runner_writes_trace(self, tmp_path):
        from ao_tpu.utils.benchmark import profiler_runner

        f = jax.jit(lambda x: (x @ x).sum())
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
        out = profiler_runner(str(tmp_path / "trace"), f, x)
        assert bool(jnp.isfinite(out))
        found = list((tmp_path / "trace").rglob("*.xplane.pb"))
        assert found, "no xplane trace written"

    def test_benchmark_model_returns_times(self):
        from ao_tpu.utils.benchmark import benchmark_model

        f = jax.jit(lambda x: x @ x)
        x = jax.random.normal(jax.random.PRNGKey(0), (128, 128))
        r = benchmark_model(f, (x,), iters=2, warmup=1)
        assert r["wall_us"] > 0
        assert r["device_us"] >= 0  # CPU xplane may report 0 device time
