"""SINQ: Sinkhorn-Normalized Quantization (arXiv:2509.22944) — dual-scale
low-bit weight quantization.

(ref: torchao/quantization/quant_primitives.py:2107
``_choose_qparams_and_quantize_scale_only_sinq``. Behavior contract kept:
Sinkhorn-normalize row/column standard deviations of the group-tiled weight
for ``niter`` iterations, then symmetric round-to-nearest in the normalized
space; the reconstruction uses a per-(group, out-channel) scale times a
per-position-in-group scale shared across all groups.)

TPU layout: weights are (K, N) with groups of size g along K. Storage:
  qdata      int4-packed (K/2, N)
  scale      (K/g, N)  — RTN scale × Sinkhorn row factor
  col_scale  (g, 1)    — Sinkhorn per-position-in-group factor (global)
Dequant: w[k, n] = q[k, n] · scale[k//g, n] · col_scale[k%g].
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import register_quantize_handler
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.qarrays.int4 import pack_int4, unpack_int4


def sinkhorn_qparams(
    w: jax.Array,
    group_size: int = 64,
    bits: int = 4,
    niter: int = 20,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (q int8 values in [qmin, qmax] shaped (K, N),
    scale (K/g, N), col_scale (g, 1)).

    Math (ref :2130-2160): tile W into (rows, g) groups; alternately divide
    out column stds (per position-in-group, global) and row stds (per
    group-row), accumulating the factors; symmetric-quantize the balanced
    matrix per row; combine the RTN scale with the row Sinkhorn factor.
    """
    k, n = w.shape
    if k % group_size:
        raise ValueError(f"K={k} must be a multiple of group_size={group_size}")
    qmax = 2 ** (bits - 1) - 1
    qmin = -(2 ** (bits - 1))
    g = group_size

    # (rows, g): each row is one (group, out-channel) tile; groups along K
    wt = w.astype(jnp.float32).T.reshape(n * (k // g), g)

    std0 = jnp.std(wt, axis=0)
    std1 = jnp.std(wt, axis=1)
    q_floor = jnp.maximum(jnp.minimum(jnp.min(std0), jnp.min(std1)), 1e-8)

    def body(_, carry):
        w_hat, s_col, s_row = carry
        q_col = jnp.maximum(jnp.std(w_hat, axis=0) / q_floor, 1e-8)
        w_hat = w_hat / q_col[None, :]
        s_col = s_col * q_col
        q_row = jnp.maximum(jnp.std(w_hat, axis=1) / q_floor, 1e-8)
        w_hat = w_hat / q_row[:, None]
        s_row = s_row * q_row
        return w_hat, s_col, s_row

    w_hat, s_col, s_row = jax.lax.fori_loop(
        0, niter, body, (wt, jnp.ones((g,)), jnp.ones((wt.shape[0],)))
    )

    rtn = jnp.maximum(jnp.max(jnp.abs(w_hat), axis=1, keepdims=True) / qmax, 1e-8)
    q = jnp.clip(jnp.round(w_hat / rtn), qmin, qmax)

    # back to (K, N): rows index (n, k//g)
    qkn = q.reshape(n, k // g, g).transpose(1, 2, 0).reshape(k, n)
    scale = (rtn[:, 0] * s_row).reshape(n, k // g).T  # (K/g, N)
    return qkn.astype(jnp.int8), scale, s_col.reshape(g, 1)


@qarray_dataclass
class SINQArray(QuantizedArray):
    qdata: jax.Array  # packed uint8 (K/2, N)
    scale: jax.Array  # (K/g, N) f32
    col_scale: jax.Array  # (g, 1) f32
    block_size: Tuple[int, ...] = meta(default=())
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @property
    def group_size(self) -> int:
        return self.block_size[-2]

    @classmethod
    def from_hp(
        cls,
        hp: jax.Array,
        group_size: int = 64,
        bits: int = 4,
        niter: int = 20,
        dequant_dtype: str = "bfloat16",
    ) -> "SINQArray":
        if hp.ndim != 2:
            raise ValueError("SINQ supports 2-D weights")
        if bits != 4:
            raise ValueError("packed SINQ currently supports 4-bit")
        q, scale, col = sinkhorn_qparams(hp, group_size, bits, niter)
        u = (q.astype(jnp.int32) + 8).astype(jnp.uint8)
        return cls(
            qdata=pack_int4(u, group_size, axis=-2),
            scale=scale,
            col_scale=col,
            block_size=(group_size, 1),
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        k, n = self.shape
        g = self.group_size
        q = unpack_int4(self.qdata, g, axis=-2).astype(jnp.int32) - 8
        qg = q.reshape(k // g, g, n).astype(jnp.float32)
        v = qg * self.scale[:, None, :] * self.col_scale[None, :, :]
        return v.reshape(k, n).astype(out_dtype)


@dataclasses.dataclass(frozen=True)
class SINQConfig(AOBaseConfig):
    """4-bit weight-only quantization with SINQ dual scales."""

    group_size: int = 64
    niter: int = 20
    version: int = 1


@register_quantize_handler(SINQConfig)
def _sinq_transform(weight: jax.Array, config: SINQConfig):
    if weight.ndim != 2 or weight.shape[-2] % config.group_size:
        return weight
    return SINQArray.from_hp(
        weight, group_size=config.group_size, niter=config.niter
    )


# linear impl: dual scales defeat an epilogue (both live along K), so
# dequant+matmul — the packed nibbles still carry the 4-bit HBM win
from ao_tpu.ops.dispatch import implements  # noqa: E402
from ao_tpu.ops.linear import frozen_weight_ste  # noqa: E402


@implements("linear", SINQArray)
@frozen_weight_ste
def _sinq_linear(x: jax.Array, w: SINQArray, b: Optional[jax.Array]):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = jnp.matmul(x2, w.dequantize(x2.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.reshape(*lead, y.shape[-1])
