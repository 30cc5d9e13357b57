"""Quantized SDPA tests.

(ref analog: test/prototype/test_attention.py and the quantized_sdpa CPU
kernel tests — SQNR vs fp32 SDPA, causal correctness, rotation benefit.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.ops.attention import quantized_sdpa, sdpa_reference

sqnr = ao_tpu.compute_error


def _qkv(key=0, b=2, h=4, sq=16, sk=16, d=32):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, sk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, sk, d), jnp.float32)
    return q, k, v


class TestQuantizedSDPA:
    @pytest.mark.parametrize("dtype,bound", [("int8", 25), ("float8_e4m3fn", 18)])
    def test_sqnr_vs_fp32(self, dtype, bound):
        q, k, v = _qkv()
        ref = sdpa_reference(q, k, v, causal=True)
        out = jax.jit(
            lambda q, k, v: quantized_sdpa(q, k, v, dtype=dtype, causal=True)
        )(q, k, v)
        assert sqnr(ref, out) > bound

    def test_causal_masking_no_leakage(self):
        """With v = one-hot basis rows, output channel j at query i must be
        exactly zero for j > i (future positions contribute nothing)."""
        s = 8
        q, k, _ = _qkv(sq=s, sk=s, d=s)
        v = jnp.broadcast_to(jnp.eye(s, dtype=jnp.float32), (2, 4, s, s))
        out = np.asarray(quantized_sdpa(q, k, v, dtype="int8", causal=True))
        for i in range(s):
            np.testing.assert_array_equal(out[:, :, i, i + 1:], 0.0)

    def test_decode_shape_cache_offset(self):
        """sq=1 against longer cache: mask offset must align to the end."""
        q, k, v = _qkv(sq=1, sk=12)
        ref = sdpa_reference(q, k, v, causal=True)
        out = quantized_sdpa(q, k, v, dtype="int8", causal=True)
        assert sqnr(ref, out) > 22

    def test_rotation_helps_outliers(self):
        q, k, v = _qkv()
        # plant channel outliers in q/k
        boost = jnp.ones((32,)).at[::7].set(20.0)
        q, k = q * boost, k * boost
        ref = sdpa_reference(q, k, v, causal=True)
        plain = sqnr(ref, quantized_sdpa(q, k, v, dtype="int8"))
        rot = sqnr(ref, quantized_sdpa(q, k, v, dtype="int8", rotate=True))
        assert rot > plain, (float(plain), float(rot))

    def test_rotation_exact_in_fp32(self):
        """Rotation cancels exactly inside q·kᵀ (no quant)."""
        from ao_tpu.algorithms.spinquant import hadamard_transform

        q, k, _ = _qkv(d=64)
        s1 = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        s2 = jnp.einsum(
            "bhqd,bhkd->bhqk", hadamard_transform(q), hadamard_transform(k)
        )
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-3)


class TestLlamaQuantSDPA:
    def test_forward_close_to_bf16_sdpa(self):
        base = llama.LlamaConfig(
            vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
        )
        params = llama.init_params(jax.random.PRNGKey(0), base)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 64)
        ref, _ = llama.forward(params, tokens, base)
        import dataclasses

        for dt, bound in [("int8", 22), ("float8_e4m3fn", 15)]:
            cfg = dataclasses.replace(base, sdpa=dt)
            out, _ = jax.jit(lambda p, t: llama.forward(p, t, cfg))(params, tokens)
            assert sqnr(ref, out) > bound, dt

    def test_decode_path_with_quant_kv(self):
        import dataclasses

        base = llama.LlamaConfig(
            vocab_size=64, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
            ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
        )
        cfg = dataclasses.replace(base, sdpa="int8")
        params = llama.init_params(jax.random.PRNGKey(0), base)
        caches = llama.init_kv_caches(base, batch=1, max_seq=8, dtype=jnp.float32)
        tok = jnp.zeros((1, 1), jnp.int32)
        pos = jnp.zeros((1, 1), jnp.int32)
        logits, caches = llama.forward(
            params, tok, cfg, positions=pos, kv_caches=caches, cache_index=0
        )
        assert logits.shape == (1, 1, 64)
