"""Fused int8-weight × bf16-activation matmul (weight-only).

(ref analog: the reference's int8 weight-only path lowers to a plain
torch.mm over a dequantized weight (int8_tensor.py) and relies on inductor
fusion. Here the Pallas kernel streams the weight as int8 — 1/2 the HBM
bytes of bf16 — converts in VMEM (i8→bf16 is a native Mosaic cast, unlike
the int4 nibble unpack), and issues one MXU dot per tile. Per-out-channel
symmetric scales commute out of the contraction and apply in the output
epilogue, so the inner loop is convert+dot only.

Measured on v5e, M=8 standalone: 26.8 us vs 30.9 us XLA at K=N=4096
(~93% vs ~82% of int8-bytes SoL), 83.8 vs 101.5 us at K=4096 N=14336.
In a full decode step the two paths measure within noise of each other —
XLA's latency-hiding scheduler already overlaps weight streaming with
attention — so the win is isolated-kernel latency, not end-to-end
decode throughput on v5e.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape


def _kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k, out_dtype):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.bfloat16)  # native i8→bf16 cast
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _():
        # per-out-channel scale epilogue (commutes out of the contraction)
        out_ref[:] = (acc_ref[:] * s_ref[0].astype(jnp.float32)
                      ).astype(out_dtype)


def _pick_tiles(m, k, n):
    tm = m if m <= 256 else 256
    tn = 512 if n % 512 == 0 else (256 if n % 256 == 0 else 128)
    tk = k
    for cand in (2048, 1024, 512):
        if k % cand == 0:
            tk = cand
            break
    return tm, tk, tn


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _int8_wo_matmul_impl(x, qw, s, *, out_dtype):
    m, k = x.shape
    n = qw.shape[1]
    tm, tk, tn = _pick_tiles(m, k, n)
    pad_m = (-m) % tm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    grid = (mp // tm, n // tn, k // tk)
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=grid[2], out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k * 2 + k * n + n * 4 + mp * n * 2,
            transcendentals=0,
        ),
    )(x, qw, s)
    return out[:m] if pad_m else out


def int8_wo_matmul_pallas(x, qw, scale, zero_point):
    """x (M, K) hp; qw int8 (K, N); scale (1, N) per-out-channel symmetric
    (the Int8WeightOnlyConfig default). Grouped/asymmetric layouts fall back
    to the XLA path."""
    if x.ndim != 2 or qw.ndim != 2:
        raise UnsupportedShape("kernel handles 2-D only")
    if zero_point is not None:
        raise UnsupportedShape("symmetric only")
    k, n = qw.shape
    if scale.shape != (1, n):
        raise UnsupportedShape(f"per-out-channel scale required, got "
                               f"{scale.shape}")
    if n % 128 or k % 128:
        raise UnsupportedShape(f"K={k}, N={n} must be 128-aligned")
    return _int8_wo_matmul_impl(
        x.astype(jnp.bfloat16), qw, scale.astype(jnp.float32),
        out_dtype=jnp.bfloat16,
    )
