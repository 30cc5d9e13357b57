"""Producer-epilogue activation quantization — Pallas TPU.

The w8a8 int8 MXU primitive is ~90% SoL and 1.85x bf16 at prefill shapes
(benchmarks/results/r4/gemm_sol_m2048.json), but the standalone per-token
quantize chain costs what the MXU saves: XLA's fusion of
produce->amax->rescale->cast re-reads the f32 activation (a DiT-XL step
profiled ~3.5ms of quantize-path ops against ~3.4ms of GEMM savings —
w8a8 0.99x bf16 e2e, PARITY r4 note). The consumer-side fused-quant
linear was measured net-negative (per-M-tile weight re-reads) and
reverted.

These kernels fuse the quantize into the PRODUCER instead: layernorm /
GELU / SwiGLU read their input once from HBM and emit int8 qdata +
per-token f32 scales directly — the high-precision activation never
round-trips HBM at all. ~3 bytes/elem of traffic instead of ~9.
(ref analog: the reference gets this from inductor epilogue fusion on
its quantize_fp8_row triton kernels, float8_tensor.py:338.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape


def _row_quant(y):
    """Per-row symmetric int8: y (bm, D) f32 -> (q i8, scale f32 (bm, 1))."""
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    sc = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(y / sc), -127, 127).astype(jnp.int8)
    return q, sc


def _ln_mod_quant_kernel(h_ref, sh_ref, sm_ref, q_ref, s_ref, *, eps):
    x = h_ref[0].astype(jnp.float32)  # (bm, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + sm_ref[0].astype(jnp.float32)) + sh_ref[0].astype(
        jnp.float32)
    q, sc = _row_quant(y)
    q_ref[0] = q
    s_ref[0] = jnp.broadcast_to(sc, s_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("eps", "bm"))
def _ln_mod_quant_impl(h, shift, smod, *, eps, bm):
    b, t, d = h.shape
    return pl.pallas_call(
        functools.partial(_ln_mod_quant_kernel, eps=eps),
        grid=(b, t // bm),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 128), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), jnp.int8),
            jax.ShapeDtypeStruct((b, t, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * t * d, bytes_accessed=b * t * (3 * d + 4),
            transcendentals=b * t),
    )(h, shift.reshape(b, 1, d), smod.reshape(b, 1, d))


def _pick_bm(t: int, d: int) -> int:
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if t % bm == 0 and bm * d * 12 <= 6 * 1024 * 1024:
            return bm
    raise UnsupportedShape(f"no row block for T={t}, D={d}")


def _pad_rows(x, t: int):
    tp = -(-t // 8) * 8
    if tp == t:
        return x, t
    return jnp.pad(x, ((0, 0), (0, tp - t), (0, 0))), tp


def norm_modulate_quant_pallas(h, shift, smod, eps):
    """LN (no affine) + AdaLN modulate + per-token int8 quantize in one
    HBM pass. h (B, T, D); shift/smod (B, D). Returns (q i8 (B,T,D),
    scale f32 (B,T,1))."""
    b, t, d = h.shape
    if d % 128:
        raise UnsupportedShape(f"D={d} misaligned")
    hp, tp = _pad_rows(h, t)
    bm = _pick_bm(tp, d)
    q, s = _ln_mod_quant_impl(hp, shift, smod, eps=float(eps), bm=bm)
    return q[:, :t], s[:, :t, :1]


def _gelu_quant_kernel(y_ref, q_ref, s_ref):
    y = jax.nn.gelu(y_ref[0].astype(jnp.float32), approximate=True)
    q, sc = _row_quant(y)
    q_ref[0] = q
    s_ref[0] = jnp.broadcast_to(sc, s_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("bm",))
def _gelu_quant_impl(y, *, bm):
    b, t, d = y.shape
    return pl.pallas_call(
        _gelu_quant_kernel,
        grid=(b, t // bm),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 128), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), jnp.int8),
            jax.ShapeDtypeStruct((b, t, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * t * d, bytes_accessed=b * t * (3 * d + 4),
            transcendentals=2 * b * t * d),
    )(y)


def gelu_quant_pallas(y):
    """tanh-GELU + per-token int8 quantize, one HBM pass. y (B, T, D)."""
    b, t, d = y.shape
    if d % 128:
        raise UnsupportedShape(f"D={d} misaligned")
    yp, tp = _pad_rows(y, t)
    bm = _pick_bm(tp, d)
    q, s = _gelu_quant_impl(yp, bm=bm)
    return q[:, :t], s[:, :t, :1]


def _silu_mul_quant_kernel(a_ref, b_ref, q_ref, s_ref, *, act):
    a = a_ref[0].astype(jnp.float32)
    gate = (jax.nn.silu(a) if act == "silu"
            else jax.nn.gelu(a, approximate=True))
    y = gate * b_ref[0].astype(jnp.float32)
    q, sc = _row_quant(y)
    q_ref[0] = q
    s_ref[0] = jnp.broadcast_to(sc, s_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("bm", "act"))
def _silu_mul_quant_impl(a, bb, *, bm, act="silu"):
    b, t, d = a.shape
    return pl.pallas_call(
        functools.partial(_silu_mul_quant_kernel, act=act),
        grid=(b, t // bm),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 128), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, d), jnp.int8),
            jax.ShapeDtypeStruct((b, t, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * t * d, bytes_accessed=b * t * (5 * d + 4),
            transcendentals=b * t * d),
    )(a, bb)


def silu_mul_quant_pallas(a, b, act: str = "silu"):
    """Gated-MLP product (silu(a)*b SwiGLU / gelu(a)*b GeGLU) + per-token
    int8 quantize, one HBM pass over each input. a/b (B, T, D)."""
    bb, t, d = a.shape
    if d % 128:
        raise UnsupportedShape(f"D={d} misaligned")
    ap, tp = _pad_rows(a, t)
    bp, _ = _pad_rows(b, t)
    bm = _pick_bm(tp, d)
    q, s = _silu_mul_quant_impl(ap, bp, bm=bm, act=act)
    return q[:, :t], s[:, :t, :1]
