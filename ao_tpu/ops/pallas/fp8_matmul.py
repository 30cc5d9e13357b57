"""Blockwise-scaled fp8 matmul (DeepSeek-style 1x128 / 128x128 scales).

(ref: the triton ``_blockwise_fp8_gemm`` torchao
quantize_/workflows/float8/kernels.py:33-149, itself derived from
DeepSeek-V3. TPU re-design: grid (M/tm, N/tn, K/128) with the k-block as
the innermost arbitrary dimension; each step is one fp8 (tm,128)x(128,tn)
MXU dot with f32 accumulation, scaled by the activation's per-(row, kblock)
scale and the weight's per-(kblock, nblock) scale in the epilogue of the
step — no separate dequant pass, scales stay in VMEM.)

Activation scales sx: (M, K/128); weight scales sw: (K/128, N/128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape

BLK = 128


def _kernel(x_ref, sx_ref, w_ref, sw_ref, out_ref, acc_ref, *,
            n_kb: int, tn: int, out_dtype):
    j = pl.program_id(1)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # (tm, BLK) fp8
    w = w_ref[:]  # (BLK, tn) fp8
    part = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # scale tables are loaded whole (tile rules forbid 1-wide blocks) and
    # this step's row/column is picked with a one-hot masked reduction —
    # dynamic lane/sublane slicing is not lowerable, the masked sum is
    # cheap VPU work on tiny operands
    sx_all = sx_ref[:]  # (tm, n_kb_total)
    cols = jax.lax.broadcasted_iota(jnp.int32, sx_all.shape, 1)
    sx = jnp.sum(jnp.where(cols == kb, sx_all, 0.0), axis=1, keepdims=True)

    swe = sw_ref[:]  # (n_kb_total, tn) — pre-expanded weight scales
    rows = jax.lax.broadcasted_iota(jnp.int32, swe.shape, 0)
    sw = jnp.sum(jnp.where(rows == kb, swe, 0.0), axis=0, keepdims=True)

    acc_ref[:] += part * sx * sw

    @pl.when(kb == n_kb - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _impl(qx, sx, qw, sw, *, out_dtype):
    m, k = qx.shape
    n = qw.shape[1]
    n_kb = k // BLK

    tm = 256 if m > 256 else ((m + 7) // 8) * 8
    pad_m = (-m) % tm
    if pad_m:
        qx = jnp.pad(qx, ((0, pad_m), (0, 0)))
        sx = jnp.pad(sx, ((0, pad_m), (0, 0)), constant_values=1.0)
    mp = m + pad_m
    tn = 512 if n % 512 == 0 else (256 if n % 256 == 0 else 128)

    # pre-expand weight scales to (K/128, N): per-(kblock, column) — still
    # tiny (1/128 of the weight bytes) and lane-aligned for the kernel
    swe = jnp.repeat(sw, BLK, axis=1)

    grid = (mp // tm, n // tn, n_kb)
    out = pl.pallas_call(
        functools.partial(_kernel, n_kb=n_kb, tn=tn, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, BLK), lambda i, j, kb: (i, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n_kb), lambda i, j, kb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, tn), lambda i, j, kb: (kb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_kb, tn), lambda i, j, kb: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kb: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + k * n + mp * n * 2,
            transcendentals=0,
        ),
    )(qx, sx, qw, swe)
    return out[:m] if pad_m else out


def fp8_blockwise_matmul_pallas(qx, sx, qw, sw, out_dtype=jnp.bfloat16):
    """qx (M, K) fp8 with sx (M, K/128) f32 per-(token, k-block) scales;
    qw (K, N) fp8 with sw (K/128, N/128) f32 block scales."""
    if qx.ndim != 2 or qw.ndim != 2:
        raise UnsupportedShape("2-D only")
    m, k = qx.shape
    kw, n = qw.shape
    if k != kw or k % BLK or n % BLK:
        raise UnsupportedShape(f"K={k}, N={n} must be multiples of {BLK}")
    if tuple(sx.shape) != (m, k // BLK):
        raise UnsupportedShape(f"sx shape {sx.shape} != {(m, k // BLK)}")
    if tuple(sw.shape) != (k // BLK, n // BLK):
        raise UnsupportedShape(f"sw shape {sw.shape} != {(k // BLK, n // BLK)}")
    return _impl(qx, sx.astype(jnp.float32), qw, sw.astype(jnp.float32),
                 out_dtype=out_dtype)
