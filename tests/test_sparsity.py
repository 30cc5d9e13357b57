"""Sparsity tests: 2:4 prune/compress/decompress, block-sparse, Wanda,
runtime-sparsified training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.ops import linear
from ao_tpu.quantization.primitives import compute_error
from ao_tpu.sparsity.blocksparse import BlockSparseArray
from ao_tpu.sparsity.configs import (
    BlockSparseWeightConfig,
    SemiSparseWeightConfig,
    WandaSparseConfig,
    sparsify_,
)
from ao_tpu.sparsity.sparse24 import (
    Sparse24Array,
    compress_2to4,
    decompress_2to4,
    prune_2to4,
    semi_sparse_linear,
)

KEY = jax.random.PRNGKey(7)


def weights(k=128, n=64):
    return jax.random.normal(KEY, (k, n), jnp.float32) * 0.05


class TestSparse24:
    def test_prune_structure(self):
        w = weights()
        p = np.asarray(prune_2to4(w))
        groups = p.reshape(-1, 4, p.shape[-1])
        nnz = (groups != 0).sum(axis=1)
        assert nnz.max() <= 2

    def test_prune_keeps_largest(self):
        w = jnp.array([[1.0], [-5.0], [0.1], [3.0]])
        p = np.asarray(prune_2to4(w)).ravel()
        np.testing.assert_allclose(p, [0.0, -5.0, 0.0, 3.0])

    def test_compress_roundtrip(self):
        w = prune_2to4(weights())
        vals, mb = compress_2to4(w)
        assert vals.shape == (64, 64) and mb.shape == (32, 64)
        back = decompress_2to4(vals, mb)
        np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=1e-6)

    def test_array_and_linear(self):
        w = weights(256, 128)
        x = jax.random.normal(KEY, (8, 256), jnp.bfloat16)
        sw = Sparse24Array.from_hp(w)
        y = linear(x, sw)
        y_ref = x.astype(jnp.float32) @ prune_2to4(w)
        assert float(compute_error(y_ref, y)) > 25.0

    def test_memory_reduction(self):
        w = weights(256, 128)
        sw = Sparse24Array.from_hp(w)
        dense_bytes = 256 * 128 * 2  # bf16
        assert sw.nbytes < dense_bytes * 0.65  # values bf16 K/2 + meta

    def test_training_linear_grads(self):
        w = weights(64, 32)
        x = jax.random.normal(KEY, (4, 64), jnp.float32)

        def loss(w):
            return jnp.sum(semi_sparse_linear(x, w) ** 2)

        g = jax.grad(loss)(w)
        assert np.isfinite(np.asarray(g)).all()
        # dense gradient: even pruned positions receive signal (STE)
        p = np.asarray(prune_2to4(w))
        pruned_positions = p == 0
        assert np.abs(np.asarray(g)[pruned_positions]).max() > 0


class TestBlockSparse:
    def test_roundtrip_exact(self):
        w = weights(128, 128)
        # zero half the blocks
        wb = np.asarray(w).reshape(2, 64, 2, 64).copy()
        wb[0, :, 1, :] = 0
        w = jnp.asarray(wb.reshape(128, 128))
        bs = BlockSparseArray.from_hp(w, 64)
        assert bs.nnz_blocks == 3
        np.testing.assert_allclose(
            np.asarray(bs.dequantize(jnp.float32)), np.asarray(w), atol=1e-2
        )

    def test_keep_fraction(self):
        w = weights(128, 128)
        bs = BlockSparseArray.from_hp(w, 64, keep_fraction=0.5)
        # 2 kept blocks (+ zero padding blocks for empty col-strips, a
        # kernel invariant) — the dense image must have exactly 2 live blocks
        dq = np.asarray(bs.dequantize(jnp.float32))
        blocks = dq.reshape(2, 64, 2, 64).transpose(0, 2, 1, 3)
        live = (np.abs(blocks).sum(axis=(2, 3)) > 0).sum()
        assert live == 2 and 2 <= bs.nnz_blocks <= 4
        y = linear(jax.random.normal(KEY, (4, 128), jnp.bfloat16), bs)
        assert y.shape == (4, 128)

    def test_config(self):
        p = sparsify_({"wq": weights(128, 128)}, BlockSparseWeightConfig(blocksize=64, keep_fraction=0.5))
        assert isinstance(p["wq"], BlockSparseArray)


class TestWanda:
    def test_observe_convert(self):
        w = weights(128, 64)
        x = jax.random.normal(KEY, (32, 128), jnp.float32)
        # make some channels high-activation
        x = x.at[:, :8].mul(10.0)
        obs = sparsify_({"wq": w}, WandaSparseConfig(step="observe"))
        _ = linear(x, obs["wq"])
        sp = sparsify_(obs, WandaSparseConfig(step="convert"))
        assert isinstance(sp["wq"], Sparse24Array)
        # wanda should beat plain magnitude pruning on output error
        y_ref = x @ w
        e_wanda = float(compute_error(y_ref, x @ sp["wq"].dequantize(jnp.float32)))
        e_mag = float(compute_error(y_ref, x @ prune_2to4(w)))
        assert e_wanda > e_mag, (e_wanda, e_mag)

    def test_semi_sparse_config(self):
        p = sparsify_({"wq": weights()}, SemiSparseWeightConfig())
        assert isinstance(p["wq"], Sparse24Array)


class TestActivationSparse:
    def test_activation_pruned_2to4(self):
        from ao_tpu.sparsity.sparse24 import (
            prune_2to4_lastdim, semi_sparse_activation_linear)

        x = jax.random.normal(KEY, (8, 32))
        xp = prune_2to4_lastdim(x)
        nz = np.asarray(xp != 0).reshape(8, 8, 4).sum(-1)
        np.testing.assert_array_equal(nz, 2)

        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
        y = semi_sparse_activation_linear(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(xp @ w),
                                   rtol=1e-5)

    def test_ste_gradients(self):
        from ao_tpu.sparsity.sparse24 import semi_sparse_activation_linear

        x = jax.random.normal(KEY, (8, 32))
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
        g = jax.random.normal(jax.random.PRNGKey(2), (8, 16))
        dx, dw = jax.vjp(semi_sparse_activation_linear, x, w)[1](g)
        # dx is dense (straight-through), dw uses the pruned activation
        assert float((np.asarray(dx) != 0).mean()) > 0.9


class TestSparse24Int4:
    """Marlin-sparse analog: 2:4 + int4, both compressed (3/8 B/elem)."""

    def test_bytes_and_dequant(self):
        from ao_tpu.sparsity.sparse24 import Sparse24Int4Array, prune_2to4

        w = jax.random.normal(jax.random.PRNGKey(0), (256, 128), jnp.float32)
        a = Sparse24Int4Array.from_hp(w, group_size=64)
        k, n = w.shape
        assert a.qdata.shape == (k // 4, n)
        assert a.metadata.shape == (k // 8, n)
        payload = a.qdata.nbytes + a.metadata.nbytes
        assert payload == k * n // 4 + k * n // 8  # 3/8 byte per element
        dq = a.dequantize(jnp.float32)
        ref = prune_2to4(w)
        # pruned positions are EXACT zeros; kept values within int4 error
        mask = np.asarray(ref) == 0
        assert np.all(np.asarray(dq)[mask] == 0)
        err = ao_tpu.compute_error(ref, dq)
        assert float(err) > 20.0

    def test_config_and_linear(self):
        from ao_tpu.ops import linear
        from ao_tpu.sparsity.configs import Sparse24Int4WeightConfig, sparsify_
        from ao_tpu.sparsity.sparse24 import Sparse24Int4Array, prune_2to4

        w = jax.random.normal(jax.random.PRNGKey(1), (128, 64), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 128), jnp.float32)
        sp = sparsify_({"kernel": w}, Sparse24Int4WeightConfig(group_size=32))
        assert isinstance(sp["kernel"], Sparse24Int4Array)
        y = linear(x, sp["kernel"])
        ref = x @ prune_2to4(w)
        assert float(ao_tpu.compute_error(ref, y)) > 18.0
        y2 = jax.jit(linear)(x, sp["kernel"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5)

    def test_checkpoint_roundtrip(self):
        from ao_tpu.ops import linear
        from ao_tpu.sparsity.configs import Sparse24Int4WeightConfig, sparsify_

        w = jax.random.normal(jax.random.PRNGKey(3), (128, 64), jnp.float32)
        sp = sparsify_({"kernel": w}, Sparse24Int4WeightConfig(group_size=32))
        tensors, meta = ao_tpu.flatten_quantized_state_dict(sp)
        back = ao_tpu.unflatten_quantized_state_dict(tensors, meta)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 128), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(linear(x, sp["kernel"])),
            np.asarray(linear(x, back["kernel"])))
