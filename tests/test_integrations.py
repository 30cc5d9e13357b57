"""Integration-layer tests: fp8-act×int4-weight config, StableHLO export,
flax linen interception, perplexity harness.

(ref analog: test/integration/ e2e suite, pt2e export tests, and the
lm-eval benchmark scripts.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.eval import perplexity, ppl_delta_report, synthetic_tokens
from ao_tpu.integrations.export import (
    export_quantized,
    roundtrip_call,
    stablehlo_text,
)
from ao_tpu.models import llama
from ao_tpu.ops import linear
from ao_tpu.quantization.configs import Float8DynamicActivationInt4WeightConfig

sqnr = ao_tpu.compute_error


class TestFp8ActInt4Weight:
    def test_linear_sqnr(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (128, 64), jnp.float32)
        qp = ao_tpu.quantize_(
            {"kernel": w}, Float8DynamicActivationInt4WeightConfig(group_size=32)
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 128), jnp.float32)
        y = jax.jit(linear)(x, qp["kernel"])
        assert sqnr(x @ w, y) > 12

    def test_serde(self):
        c = Float8DynamicActivationInt4WeightConfig(group_size=64)
        assert ao_tpu.config_from_dict(ao_tpu.config_to_dict(c)) == c


class TestExport:
    def _quant_fwd(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
        qp = ao_tpu.quantize_({"kernel": w}, ao_tpu.Int4WeightOnlyConfig(group_size=32))
        x = jnp.ones((4, 64), jnp.float32)

        def fwd(qp, x):
            return linear(x, qp["kernel"])

        return fwd, (qp, x), w

    def test_stablehlo_contains_quant_arithmetic(self):
        fwd, args, _ = self._quant_fwd()
        txt = stablehlo_text(fwd, args)
        assert "stablehlo" in txt and "dot" in txt

    def test_serialize_roundtrip_same_result(self):
        fwd, args, w = self._quant_fwd()
        direct = fwd(*args)
        via_artifact = roundtrip_call(fwd, args)
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(via_artifact), rtol=1e-5
        )

    def test_multi_platform_export(self):
        fwd, args, _ = self._quant_fwd()
        exp = export_quantized(fwd, args, platforms=("cpu", "tpu"))
        assert set(p.lower() for p in exp.platforms) == {"cpu", "tpu"}


class TestFlax:
    def test_intercept_dense_with_quantized_kernel(self):
        import flax.linen as nn

        from ao_tpu.integrations.flax_linen import (
            intercept_dense,
            quantize_variables,
        )

        class MLP(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(64)(x)
                x = nn.relu(x)
                return nn.Dense(16)(x)

        m = MLP()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
        variables = m.init(jax.random.PRNGKey(1), x)
        ref = m.apply(variables, x)

        qvars = quantize_variables(variables, ao_tpu.Int8WeightOnlyConfig())
        from ao_tpu.quantization.qarrays.int8 import Int8Array

        assert isinstance(qvars["params"]["Dense_0"]["kernel"], Int8Array)

        with intercept_dense(m):
            out = m.apply(qvars, x)
        assert sqnr(ref, out) > 22

    def test_quant_dense_module(self):
        import flax.linen as nn

        from ao_tpu.integrations.flax_linen import QuantDense

        m = QuantDense(features=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
        variables = m.init(jax.random.PRNGKey(1), x)
        ref = m.apply(variables, x)
        qv = {"params": ao_tpu.quantize_(
            dict(variables["params"]), ao_tpu.Int8WeightOnlyConfig()
        )}
        out = m.apply(qv, x)
        assert sqnr(ref, out) > 22


class TestPerplexity:
    def _setup(self):
        cfg = llama.LlamaConfig(
            vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
        )
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        tokens = synthetic_tokens(jax.random.PRNGKey(1), 4096, cfg.vocab_size)
        return cfg, params, tokens

    def test_load_tokens_formats(self, tmp_path):
        from ao_tpu.eval import load_tokens

        toks = np.arange(100, dtype=np.int32) % 256
        p_npy = str(tmp_path / "t.npy")
        np.save(p_npy, toks.astype(np.uint16))
        np.testing.assert_array_equal(np.asarray(load_tokens(p_npy, 256)), toks)
        p_bin = str(tmp_path / "t.bin")
        toks.tofile(p_bin)
        np.testing.assert_array_equal(np.asarray(load_tokens(p_bin, 256)), toks)
        p_txt = str(tmp_path / "t.txt")
        np.savetxt(p_txt, toks, fmt="%d")
        np.testing.assert_array_equal(np.asarray(load_tokens(p_txt, 256)), toks)
        with pytest.raises(ValueError, match="outside"):
            load_tokens(p_npy, 50)  # vocab too small

    def test_ppl_on_loaded_corpus(self, tmp_path):
        from ao_tpu.eval import load_tokens

        cfg, params, tokens = self._setup()
        path = str(tmp_path / "corpus.npy")
        np.save(path, np.asarray(tokens))
        loaded = load_tokens(path, cfg.vocab_size)
        p1 = perplexity(lambda b: llama.forward(params, b, cfg)[0], tokens,
                        seq_len=128, batch_size=2)
        p2 = perplexity(lambda b: llama.forward(params, b, cfg)[0], loaded,
                        seq_len=128, batch_size=2)
        assert abs(p1 - p2) < 1e-3

    def test_cached_forward_matches_cacheless(self):
        """The decode-path (KV-cached, teacher-forced) ppl with a bf16
        cache must reproduce the cache-free forward's ppl — same math,
        different program — and int4 KV must degrade it."""
        from ao_tpu.eval.perplexity import cached_forward_fn, perplexity

        cfg, params, tokens = self._setup()
        toks = tokens[: 4 * 64]
        p_free = perplexity(lambda b: llama.forward(params, b, cfg)[0],
                            toks, seq_len=64, batch_size=2)
        p_bf16 = perplexity(cached_forward_fn(params, cfg), toks,
                            seq_len=64, batch_size=2)
        assert abs(p_free - p_bf16) < 1e-2 * p_free, (p_free, p_bf16)
        p_int8 = perplexity(cached_forward_fn(params, cfg, "int8"), toks,
                            seq_len=64, batch_size=2)
        p_int4 = perplexity(cached_forward_fn(params, cfg, "int4"), toks,
                            seq_len=64, batch_size=2)
        assert p_int4 > p_bf16, (p_int4, p_bf16)
        assert p_int8 <= p_int4, (p_int8, p_int4)  # the bench's ladder gate

    def test_ppl_sane_range(self):
        cfg, params, tokens = self._setup()
        p = perplexity(
            lambda b: llama.forward(params, b, cfg)[0], tokens,
            seq_len=128, batch_size=2,
        )
        # untrained model ≈ uniform over vocab
        assert 64 < p < 1024, p

    def test_quant_delta_ordering(self):
        """int8-WO must perturb ppl less than int4 g=16 on the same model."""
        cfg, params, tokens = self._setup()
        report = ppl_delta_report(
            params,
            lambda p: (lambda b: llama.forward(p, b, cfg)[0]),
            {
                "int8": lambda p: ao_tpu.quantize_(p, ao_tpu.Int8WeightOnlyConfig()),
                "int4": lambda p: ao_tpu.quantize_(
                    p, ao_tpu.Int4WeightOnlyConfig(group_size=16)
                ),
            },
            tokens, seq_len=128, batch_size=2,
        )
        assert abs(report["int8"]["delta"]) <= abs(report["int4"]["delta"]) + 1e-3
        assert report["baseline"]["ratio"] == 1.0
