"""Gemma model family tests: forward, quantization configs, KV-cache decode
consistency, logit softcap.

(ref analog: the reference's Gemma3 benchmark coverage, README.md:134.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import gemma

sqnr = ao_tpu.compute_error


def _cfg():
    return gemma.GemmaConfig(
        vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=1,
        head_dim=32, ffn_dim=128, dtype=jnp.float32,
    )


class TestGemma:
    def test_forward_shapes_and_softcap(self):
        cfg = _cfg()
        params = gemma.init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        logits, _ = jax.jit(lambda p, t: gemma.forward(p, t, cfg))(params, tokens)
        assert logits.shape == (1, 8, 256)
        assert float(jnp.max(jnp.abs(logits))) <= cfg.final_logit_softcap + 1e-3

    def test_quantize_all_configs(self):
        cfg = _cfg()
        params = gemma.init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        ref, _ = gemma.forward(params, tokens, cfg)
        for qcfg, bound in [
            (ao_tpu.Int8WeightOnlyConfig(), 18),
            (ao_tpu.Int4WeightOnlyConfig(group_size=32), 8),
            (ao_tpu.Float8DynamicActivationFloat8WeightConfig(), 14),
        ]:
            qp = ao_tpu.quantize_(params, qcfg)
            out, _ = jax.jit(lambda p, t: gemma.forward(p, t, cfg))(qp, tokens)
            assert sqnr(ref, out) > bound, type(qcfg).__name__

    def test_kv_cache_decode_matches_full_forward(self):
        cfg = _cfg()
        params = gemma.init_params(jax.random.PRNGKey(0), cfg)
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, 256)
        full, _ = gemma.forward(params, toks, cfg)

        caches = gemma.init_kv_caches(cfg, 1, 16, dtype=jnp.float32)
        # prefill first 3, then decode 3 one-by-one
        pos = jnp.arange(3, dtype=jnp.int32)[None]
        logits, caches = gemma.forward(
            params, toks[:, :3], cfg, positions=pos, kv_caches=caches,
            cache_index=0)
        outs = [logits[:, -1]]
        for i in range(3, 6):
            pos = jnp.full((1, 1), i, jnp.int32)
            logits, caches = gemma.forward(
                params, toks[:, i:i + 1], cfg, positions=pos,
                kv_caches=caches, cache_index=i)
            outs.append(logits[:, -1])
        np.testing.assert_allclose(
            np.asarray(outs[-1]), np.asarray(full[:, -1]), rtol=1e-3,
            atol=1e-3)

    def test_embed_scaling_applied(self):
        cfg = _cfg()
        params = gemma.init_params(jax.random.PRNGKey(0), cfg)
        # zeroing embed rows must zero the pre-norm stream scaling too
        p2 = dict(params)
        p2["embed"] = params["embed"] * 0.0
        tokens = jnp.zeros((1, 4), jnp.int32)
        l1, _ = gemma.forward(params, tokens, cfg)
        l2, _ = gemma.forward(p2, tokens, cfg)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))


class TestGemmaServing:
    """The engine and one-shot decode are model-agnostic via the registry."""

    def test_generate_and_engine_match(self):
        from ao_tpu.serving.decode import generate
        from ao_tpu.serving.engine import Engine, ServeConfig

        cfg = gemma.GEMMA_TINY
        params = gemma.init_params(jax.random.PRNGKey(0), cfg)
        prompt = [3, 17, 42, 9]
        toks = generate(params, jnp.asarray(prompt, jnp.int32)[None], cfg,
                        6, max_seq=64)
        ref = [int(t) for t in np.asarray(toks)[0]]

        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)))
        eng.submit(prompt, 6)
        done = eng.run()
        assert done[0].generated == ref

    def test_paged_gemma(self):
        from ao_tpu.serving.engine import Engine, ServeConfig

        cfg = gemma.GEMMA_TINY
        params = gemma.init_params(jax.random.PRNGKey(0), cfg)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,),
            kv_layout="paged", page_size=8))
        eng.submit([5, 6, 7, 8], 5)
        done = eng.run()
        assert len(done[0].generated) == 5

    def test_unregistered_config_raises(self):
        from ao_tpu.models import resolve_model

        with pytest.raises(TypeError, match="no model registered"):
            resolve_model(object())
