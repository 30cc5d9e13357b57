"""Paged KV cache tests: allocator, pool writes, reference attention.
(The Pallas kernel parity test lives in the TPU suite.)"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.serving.paged import (
    PageAllocator,
    PagedKVPool,
    paged_attention,
    paged_decode_attention_reference,
)

sqnr = ao_tpu.compute_error


class TestAllocator:
    def test_alloc_release(self):
        a = PageAllocator(8)
        ids = [a.alloc() for _ in range(7)]
        assert sorted(ids) == list(range(1, 8))  # page 0 reserved
        with pytest.raises(RuntimeError):
            a.alloc()
        a.release(ids[:3])
        assert a.alloc() in ids[:3]


class TestPool:
    def test_append_token_and_gather(self):
        pool = PagedKVPool.create(8, 4, 2, 16, "bf16")
        table = jnp.array([[1, 2, 0, 0], [3, 0, 0, 0]], jnp.int32)
        xs = []
        for t in range(6):
            x = jax.random.normal(jax.random.PRNGKey(t), (2, 2, 16))
            pool = pool.append_token(x, table, jnp.array([t, t % 4]))
            xs.append(x)
        got = np.asarray(pool.gather(table[0], jnp.float32))
        for t in range(6):
            np.testing.assert_allclose(
                got[t], np.asarray(xs[t][0]), rtol=1e-2, atol=1e-2)

    def test_quantized_pool_roundtrip(self):
        pool = PagedKVPool.create(8, 8, 2, 32, "int8")
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 2, 32))
        pool = pool.write_prompt(x, jnp.array([2, 5], jnp.int32))
        got = pool.gather(jnp.array([2, 5, 0, 0], jnp.int32), jnp.float32)
        assert sqnr(x, got[:16]) > 30

    def test_int4_pool_roundtrip(self):
        pool = PagedKVPool.create(8, 8, 2, 32, "int4")
        assert pool.pages.shape == (8, 1, 2, 32)  # 8 tokens per int32 word
        assert pool.pages.dtype == jnp.int32
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 2, 32))
        pool = pool.write_prompt(x, jnp.array([2, 5], jnp.int32))
        got = pool.gather(jnp.array([2, 5, 0, 0], jnp.int32), jnp.float32)
        assert sqnr(x, got[:16]) > 14  # 4-bit per-vector

    def test_int4_append_token_matches_write(self):
        """Nibble RMW appends reproduce what a bulk write stores."""
        ps, hkv, d = 8, 2, 16
        table = jnp.array([[1, 2], [3, 0]], jnp.int32)
        pool = PagedKVPool.create(8, ps, hkv, d, "int4")
        xs = []
        for t in range(10):
            x = jax.random.normal(jax.random.PRNGKey(t), (2, hkv, d))
            pool = pool.append_token(x, table, jnp.array([t, t % ps]))
            xs.append(x)
        got = np.asarray(pool.gather(table[0], jnp.float32))
        for t in range(10):
            q, s = pool._quant(xs[t][0])
            want = np.asarray((q - 8).astype(jnp.float32) * s)
            np.testing.assert_allclose(got[t], want, atol=1e-6)


class TestPagedAttention:
    def test_reference_matches_dense(self):
        b, h, hkv, d, ps, mp = 2, 4, 2, 32, 8, 4
        kp = PagedKVPool.create(16, ps, hkv, d, "bf16")
        vp = PagedKVPool.create(16, ps, hkv, d, "bf16")
        lens = [20, 9]
        table = np.zeros((b, mp), np.int32)
        alloc = PageAllocator(16)
        ks = jax.random.normal(jax.random.PRNGKey(0), (b, mp * ps, hkv, d))
        vs = jax.random.normal(jax.random.PRNGKey(1), (b, mp * ps, hkv, d))
        for bi, ln in enumerate(lens):
            npg = -(-ln // ps)
            ids = [alloc.alloc() for _ in range(npg)]
            table[bi, :npg] = ids
            kp = kp.write_prompt(ks[bi, :npg * ps], jnp.asarray(ids))
            vp = vp.write_prompt(vs[bi, :npg * ps], jnp.asarray(ids))
        table = jnp.asarray(table)
        lengths = jnp.asarray(lens, jnp.int32)
        q = jax.random.normal(jax.random.PRNGKey(2), (b, h, d))
        out = paged_attention(q, kp, vp, table, lengths)

        # dense reference on the gathered cache
        from ao_tpu.ops.attention import sdpa_reference

        for bi, ln in enumerate(lens):
            kd = kp.gather(table[bi], jnp.float32)[:ln]
            vd = vp.gather(table[bi], jnp.float32)[:ln]
            g = h // hkv
            ref = sdpa_reference(
                q[bi][None, :, None, :].transpose(0, 1, 2, 3),
                jnp.repeat(kd, g, 1).transpose(1, 0, 2)[None],
                jnp.repeat(vd, g, 1).transpose(1, 0, 2)[None],
                causal=False,
            )
            assert sqnr(ref[0, :, 0], out[bi]) > 30
