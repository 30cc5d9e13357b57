"""2:4 semi-structured sparsity.

(ref: torchao/sparsity/sparse_api.py:73 ``SemiSparseWeightConfig``,
float8_sparse_2x4_* tensors, sparsity/training/autograd.py:22 runtime
sparsify. TPU re-design: there are no sparse tensor cores on TPU, so the
honest win is HBM bandwidth — the compressed layout stores 2 values per
group of 4 plus 2-bit indices (bf16: 36 bits/group vs 64 dense → 1.78x
fewer weight bytes; int4 values: 12+4 bits vs 32 → 2x). Decompression is
select/mask arithmetic (VPU), structurally identical to the int4 dequant
epilogue, so it fuses into the same Pallas matmul pattern. Validation is
decode (memory-bound) speedup, not FLOPs — SURVEY §7.5.)

Layout (weights (K, N), groups of 4 along K):
  values: (K/2, N)  — the two kept values per group, in ascending position
  meta:   (K/4, N) uint8 — idx0 | (idx1 << 2), idx0 < idx1 ∈ {0..3}
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass


def prune_2to4(w: jax.Array) -> jax.Array:
    """Magnitude-prune to 2:4 along axis -2: zero the 2 smallest |w| in
    every contiguous group of 4. Returns the dense pruned weight."""
    k = w.shape[-2]
    if k % 4 != 0:
        raise ValueError(f"K={k} must be a multiple of 4")
    shape = w.shape
    wg = w.reshape(shape[:-2] + (k // 4, 4) + shape[-1:])
    a = jnp.abs(wg)
    # rank within each group: keep the top-2
    order = jnp.argsort(a, axis=-2)  # ascending
    ranks = jnp.argsort(order, axis=-2)
    mask = ranks >= 2
    return (wg * mask).reshape(shape)


def compress_2to4(w_pruned: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dense 2:4-pruned (K, N) → (values (K/2, N), meta (K/4, N) uint8)."""
    k, n = w_pruned.shape[-2], w_pruned.shape[-1]
    shape = w_pruned.shape
    wg = w_pruned.reshape(shape[:-2] + (k // 4, 4) + (n,))
    nz = wg != 0
    # positions of the kept elements (ties for zeros broken by position):
    # sort by (is_zero, position) ascending → first two entries = kept idx
    pos = jnp.arange(4).reshape((1,) * (wg.ndim - 2) + (4, 1))
    sort_key = jnp.where(nz, pos, pos + 4)  # nonzeros first, stable by pos
    order = jnp.argsort(sort_key, axis=-2)
    idx0 = jnp.take_along_axis(order, jnp.zeros_like(order[..., :1, :]), axis=-2)
    idx1 = jnp.take_along_axis(order, jnp.ones_like(order[..., :1, :]), axis=-2)
    # guarantee idx0 < idx1 even in all-zero groups
    lo = jnp.minimum(idx0, idx1)
    hi = jnp.maximum(idx0, idx1)
    v0 = jnp.take_along_axis(wg, lo, axis=-2)
    v1 = jnp.take_along_axis(wg, hi, axis=-2)
    values = jnp.concatenate([v0, v1], axis=-2).reshape(
        shape[:-2] + (k // 4, 2, n)
    )
    # interleave (v0, v1) per group → (K/2, N)
    values = values.reshape(shape[:-2] + (k // 2, n))
    mb = (lo | (hi << 2)).astype(jnp.uint8).reshape(shape[:-2] + (k // 4, n))
    return values, mb


def decompress_2to4(values: jax.Array, mb: jax.Array) -> jax.Array:
    """Inverse of compress: (K/2, N) + meta → dense (K, N)."""
    kq, n = mb.shape[-2], mb.shape[-1]
    shape = mb.shape
    vals = values.reshape(shape[:-2] + (kq, 2, n))
    v0, v1 = vals[..., 0, :], vals[..., 1, :]
    lo = (mb & 0x3).astype(jnp.int32)
    hi = ((mb >> 2) & 0x3).astype(jnp.int32)
    out = jnp.zeros(shape[:-2] + (kq, 4, n), values.dtype)
    for p in range(4):
        contrib = v0 * (lo == p) + v1 * (hi == p)
        out = out.at[..., p, :].set(contrib.astype(values.dtype))
    return out.reshape(shape[:-2] + (kq * 4, n))


@qarray_dataclass
class Sparse24Array(QuantizedArray):
    """2:4 compressed weight (optionally to be composed with quantization)."""

    values: jax.Array  # (K/2, N)
    metadata: jax.Array  # (K/4, N) uint8
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(cls, hp: jax.Array, dequant_dtype: str = "bfloat16"):
        pruned = prune_2to4(hp.astype(jnp.float32))
        values, mb = compress_2to4(pruned)
        return cls(
            values=values.astype(jnp.dtype(dequant_dtype)),
            metadata=mb,
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    def dequantize(self, output_dtype=None):
        out = decompress_2to4(self.values, self.metadata)
        return out.astype(output_dtype or self.dtype)


# ---------------------------------------------------------------------------
# runtime-sparsified training linear (ref: sparsity/training/autograd.py:22)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def semi_sparse_linear(x: jax.Array, w: jax.Array) -> jax.Array:
    """y = x @ prune_2to4(w): weight sparsified each forward; dense,
    straight-through gradients (ref: _SparsifyFunc semantics)."""
    return x @ prune_2to4(w).astype(x.dtype)


def _ssl_fwd(x, w):
    wp = prune_2to4(w)
    return x @ wp.astype(x.dtype), (x, wp)


def _ssl_bwd(res, g):
    x, wp = res
    gf = g.astype(jnp.float32)
    dx = gf @ wp.T.astype(jnp.float32)
    dw = x.astype(jnp.float32).T @ gf  # dense grad (STE through the mask)
    return dx.astype(x.dtype), dw


semi_sparse_linear.defvjp(_ssl_fwd, _ssl_bwd)


@jax.custom_vjp
def semi_sparse_activation_linear(x: jax.Array, w: jax.Array) -> jax.Array:
    """y = prune_2to4(x) @ w: ACTIVATION sparsified each forward (ref: the
    activation-sparse variant in sparsity/training — SquaredReLU-style
    activations are naturally ~90% sparse, 2:4 structure makes it usable).
    Straight-through gradients to the dense activation."""
    return prune_2to4_lastdim(x).astype(x.dtype) @ w.astype(x.dtype)


def prune_2to4_lastdim(x: jax.Array) -> jax.Array:
    """Keep the 2 largest-|x| of every 4 along the LAST axis."""
    shape = x.shape
    if shape[-1] % 4:
        raise ValueError(f"last dim {shape[-1]} not a multiple of 4")
    g = x.reshape(*shape[:-1], shape[-1] // 4, 4)
    order = jnp.argsort(jnp.abs(g), axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    return jnp.where(ranks >= 2, g, 0).reshape(shape)


def _ssal_fwd(x, w):
    xp = prune_2to4_lastdim(x)
    return xp.astype(x.dtype) @ w.astype(x.dtype), (xp, w)


def _ssal_bwd(res, g):
    xp, w = res
    gf = g.astype(jnp.float32)
    dx = gf @ w.T.astype(jnp.float32)  # STE: dense grad to the activation
    dw = xp.astype(jnp.float32).T @ gf
    return dx.astype(xp.dtype), dw.astype(w.dtype)


semi_sparse_activation_linear.defvjp(_ssal_fwd, _ssal_bwd)


# ---------------------------------------------------------------------------
# Structured-compressed int4 + 2:4 (the marlin-sparse analog, SURVEY build
# plan #5; ref: torchao sparsity/README.md:28 — Int4WeightOnly over a
# MarlinSparseLayout, 2.37x + -67.7% mem on A100. TPU re-design: no sparse
# tensor cores, so the win is BYTES — 2 kept int4 codes per group of 4
# (K*N/4 B) + 2x2-bit positions (K*N/8 B) = 3/8 B/elem vs 1/2 for dense
# int4. Dequant is a vectorized one-hot scatter; the fused-gather Pallas
# kernel stays opt-in for VPU-richer generations (on v5e 2:4 expansion adds
# VPU work per byte saved — see PARITY known gaps).
# ---------------------------------------------------------------------------


@qarray_dataclass
class Sparse24Int4Array(QuantizedArray):
    """2:4-pruned weight with int4-quantized kept values, both compressed."""

    qdata: jax.Array  # (K/4, N) uint8 — two kept 4-bit codes per group of 4
    metadata: jax.Array  # (K/8, N) uint8 — two groups' 2x2-bit positions
    scale: jax.Array  # (K/g, N) f32
    zero_point: jax.Array  # (K/g, N) f32 (tinygemm float domain)
    group_size: int = meta(default=128)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(cls, hp: jax.Array, group_size: int = 128,
                dequant_dtype: str = "bfloat16") -> "Sparse24Int4Array":
        from ao_tpu.quantization import primitives as P

        k, n = hp.shape
        g = group_size
        if k % max(g, 8) or g % 8:
            raise ValueError(f"K={k} needs K%{max(g, 8)}==0 and g%8==0")
        pruned = prune_2to4(hp.astype(jnp.float32))
        values, mb = compress_2to4(pruned)  # (K/2, N), (K/4, N) 4-bit

        # per-(g,1) qparams of the ORIGINAL groups == per-(g/2,1) groups of
        # the compressed rows (each original group contributes exactly g/2
        # kept rows, in order); absmax over kept rows == absmax over group
        block = (g // 2, 1)
        scale, zp = P.choose_qparams_affine_tinygemm(
            values, block, quant_min=0, quant_max=15)
        codes = P.quantize_affine_tinygemm(
            values, block, scale, zp, 0, 15).astype(jnp.uint8)

        # pack code pairs along K: (K/2, N) -> (K/4, N)
        qdata = (codes[0::2] | (codes[1::2] << 4)).astype(jnp.uint8)
        # pack metadata pairs: (K/4, N) 4-bit -> (K/8, N)
        meta_packed = (mb[0::2] | (mb[1::2] << 4)).astype(jnp.uint8)
        return cls(
            qdata=qdata, metadata=meta_packed, scale=scale, zero_point=zp,
            group_size=g, _shape=(k, n), _dequant_dtype=dequant_dtype,
        )

    def dequantize(self, output_dtype=None):
        from ao_tpu.quantization import primitives as P

        k, n = self._shape
        # unpack codes -> (K/2, N), dequant kept values
        lo = (self.qdata & 0xF).astype(jnp.uint8)
        hi = (self.qdata >> 4).astype(jnp.uint8)
        codes = jnp.stack([lo, hi], axis=1).reshape(k // 2, n)
        vals = P.dequantize_affine_tinygemm(
            codes, (self.group_size // 2, 1), self.scale, self.zero_point,
            0, 15, output_dtype=jnp.float32,
        )
        # unpack metadata -> (K/4, N) 4-bit (lo_idx | hi_idx<<2)
        ml = (self.metadata & 0xF).astype(jnp.uint8)
        mh = (self.metadata >> 4).astype(jnp.uint8)
        mb = jnp.stack([ml, mh], axis=1).reshape(k // 4, n)
        return decompress_2to4(vals, mb).astype(output_dtype or self.dtype)
