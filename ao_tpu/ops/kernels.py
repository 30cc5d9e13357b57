"""Kernel backend selection + XLA/emulated implementations of the hot ops.

(ref analog: torchao's KernelPreference AUTO/TORCH/MSLK/EMULATED selection,
quantize_/common/kernel_preference.py:17, and the mslk/triton call sites.)

Backends:
  * "pallas"   — fused Pallas TPU kernels (ao_tpu.ops.pallas.*)
  * "xla"      — jnp/lax ops arranged so XLA hits the MXU natively
                 (int8xint8→int32 dot_general, scaled epilogues)
  * "emulated" — dequantize to high precision then dot; bit-exact reference
                 for numerics tests (ref: KernelPreference.EMULATED)
  * "auto"     — pallas for the ops where it wins on TPU, else xla

EXPERIMENTAL under backend("pallas"): the fused fp8-blockwise GEMM and the
per-block BSR kernel are validated for numerics but LOSE to the XLA paths
on v5e (no native fp8 MXU there) — "auto" never selects them on this
generation. They target fp8-native TPUs (v6e+), which this repo has not
been able to measure on; treat their perf as unproven until then.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P

_BACKEND = "auto"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "pallas", "xla", "emulated"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


@contextlib.contextmanager
def backend(name: str):
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev


def on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return "tpu" in dev.platform.lower() or "tpu" in str(dev).lower()
    except Exception:
        return False


def _use_pallas() -> bool:
    b = _BACKEND
    if b == "pallas":
        return True
    if b == "auto":
        return on_tpu()
    return False


# ---------------------------------------------------------------------------
# int8 weight-only
# ---------------------------------------------------------------------------


def int8_wo_matmul(x, qw, sw, zw, wbs):
    """x (M, K) hp; qw int8 (K, N); sw rank-preserved scale."""
    k, n = qw.shape[-2], qw.shape[-1]
    if zw is None and sw.shape == (1, n):
        if _use_pallas() and x.ndim == 2 and x.shape[0] <= 1024:
            from ao_tpu.ops.pallas import UnsupportedShape
            from ao_tpu.ops.pallas.int8_matmul import int8_wo_matmul_pallas

            try:
                # streams the weight as int8 with an in-kernel cast;
                # ~93% of int8-bytes SoL standalone on v5e vs ~82% for the
                # XLA path. Decode-suite A/B (6L llama dims, bs8): e2e
                # EXACT parity with XLA (2212 tok/s both) — the scheduler
                # overlaps either implementation equally inside the full
                # step, so the kernel's value is isolated/microbench
                # contexts; kept as default because it is never slower.
                return int8_wo_matmul_pallas(x, qw, sw.reshape(1, n), zw)
            except UnsupportedShape:
                pass
        # per-out-channel symmetric: fold scale into the output epilogue so
        # the weight is read as int8 (cast fuses into the dot prologue)
        y = jnp.matmul(x, qw.astype(x.dtype))
        return y * sw.reshape(1, n).astype(y.dtype)
    w_dq = P.dequantize_affine(qw, wbs, sw, zw, output_dtype=x.dtype)
    return jnp.matmul(x, w_dq)


# ---------------------------------------------------------------------------
# int8 dynamic-activation x int8 weight (W8A8)
# ---------------------------------------------------------------------------


def int8_dynamic_matmul(qx, sx, zx, qw, sw, zw, wbs, out_dtype=jnp.bfloat16):
    """Integer matmul with int32 accumulation on the MXU.

    y = (qx - zx) @ (qw - zw) * sx * sw
      = [qx@qw - zx*colsum(qw) - rowsum(qx)*zw + K*zx*zw] * sx * sw

    (ref: zero-point correction int8_tensor.py:319-330; on TPU the
    int8xint8→int32 dot_general IS the fast path — no custom kernel needed
    for the plain case.)
    """
    m, k = qx.shape
    n = qw.shape[-1]
    per_channel_w = sw.shape == (1, n) or sw.size == 1
    per_token_x = sx.shape == (m, 1) or sx.size == 1
    if not (per_channel_w and per_token_x):
        # per-group weight scales: fall back to dequant + hp matmul
        # (ref: int8_tensor.py:338-345 does the same)
        x_dq = P.dequantize_affine(
            qx, (1, k) if sx.shape == (m, 1) else (m, k), sx, zx,
            output_dtype=jnp.float32,
        )
        w_dq = P.dequantize_affine(qw, wbs, sw, zw, output_dtype=jnp.float32)
        return jnp.matmul(x_dq, w_dq).astype(out_dtype)

    acc = jax.lax.dot_general(
        qx, qw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc = acc.astype(jnp.float32)
    if zx is not None:
        colsum_w = jnp.sum(qw.astype(jnp.int32), axis=0, keepdims=True).astype(
            jnp.float32
        )
        acc = acc - zx.reshape(m, 1).astype(jnp.float32) * colsum_w
    if zw is not None:
        rowsum_x = jnp.sum(qx.astype(jnp.int32), axis=1, keepdims=True).astype(
            jnp.float32
        )
        zw_f = zw.reshape(1, -1).astype(jnp.float32)
        acc = acc - rowsum_x * zw_f
        if zx is not None:
            acc = acc + (
                k
                * zx.reshape(m, 1).astype(jnp.float32)
                * zw_f
            )
    y = acc * sx.reshape(-1, 1).astype(jnp.float32) * sw.reshape(1, -1).astype(
        jnp.float32
    )
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# int4 weight-only (groupwise)
# ---------------------------------------------------------------------------


def int4_wo_matmul(x, packed, scale, zp, group_size, zp_domain, layout=None):
    """x (M, K) hp; packed uint8 (K/2, N) split-half layout or int32 (K/8, N)
    magic/magic8 layout; scale/zp (K/g, N). ``layout`` defaults to dtype
    inference (int32 = magic) — pass the container's layout for magic8."""
    if layout is None:
        layout = "magic" if packed.dtype == jnp.int32 else "halves"
    # The fused WO kernels tile M at <=256 and re-read + re-decode the
    # whole packed weight per M-tile — cheap while the re-reads
    # ((M/256) x 0.5B/weight) undercut XLA's dequant materialization
    # (~4B/weight f32 round-trip), which flips around M~2k: measured
    # DiT-XL M=2048 ran 0.53x bf16 through the fused kernel vs 0.68x
    # XLA-dequant, while generate()'s M=1024 prefill ran ~2x FASTER
    # fused (decode_suite e2e 2767 vs 1445 tok/s when a 256 gate pushed
    # prefill to XLA). Gate at 1024. Same on int8/fp4/LUT WO dispatches.
    if _use_pallas() and layout != "magic8" and x.shape[0] <= 1024:
        from ao_tpu.ops.pallas import UnsupportedShape

        try:
            from ao_tpu.ops.pallas import int4_matmul as pk

            if layout == "magic":
                return pk.int4_wo_magic_pallas(
                    x, packed, scale, zp, group_size, zp_domain
                )
            return pk.int4_wo_matmul_pallas(
                x, packed, scale, zp, group_size, zp_domain
            )
        except (ImportError, UnsupportedShape):
            pass
    return _int4_wo_matmul_xla(x, packed, scale, zp, group_size, zp_domain,
                               layout)


def _int4_wo_matmul_xla(x, packed, scale, zp, group_size, zp_domain,
                        layout=None):
    from ao_tpu.quantization.qarrays.int4 import (
        unpack_int4, unpack_int4_magic, unpack_int4_magic8,
    )

    if layout is None:
        layout = "magic" if packed.dtype == jnp.int32 else "halves"
    bs = (group_size, 1)
    if layout == "magic" and packed.ndim == 2 and x.ndim == 2:
        return _int4_wo_magic_xla_permuted(
            x, packed, scale, zp, group_size, zp_domain)
    if layout == "magic":
        u = unpack_int4_magic(packed, group_size).astype(jnp.int32) - 8
    elif layout == "magic8":
        u = unpack_int4_magic8(packed, group_size).astype(jnp.int32) - 8
    else:
        u = unpack_int4(packed, group_size, axis=-2).astype(jnp.int32) - 8
    if zp_domain is P.ZeroPointDomain.FLOAT:
        w_dq = P.dequantize_affine_tinygemm(
            u, bs, scale, zp, -8, 7, output_dtype=x.dtype
        )
    else:
        w_dq = P.dequantize_affine(u, bs, scale, zp, output_dtype=x.dtype)
    return jnp.matmul(x, w_dq)


def _int4_wo_magic_xla_permuted(x, packed, scale, zp, group_size, zp_domain):
    """Universal 2-D XLA path for the magic layout WITHOUT the interleaving
    unpack (serves both the M>1024 prefill fallback and any small-M call
    that reaches XLA, e.g. non-TPU backends or Pallas UnsupportedShape —
    the avoided interleave materialization is a weight-side cost and thus
    M-independent, while the x lane shuffle it adds is O(M*K) and fuses).
    ``unpack_int4_magic``'s natural-order reconstruction makes XLA
    materialize two nested interleaves (plane stride-4 groups x in-group
    stride-2 row pairs) — measured 885us vs bf16's 358us at M=2048 4096²
    (the split-half layout's concat-only unpack costs only +34us). A
    groupwise dot is order-free inside each group and group blocks can
    come out in ANY order as long as x's K columns and the scale rows
    match, so: emit the nibbles in their STORAGE order — (t, j, h, r')
    flattens to concat-only stacks, group index 4t+j comes out natural —
    and permute x's in-group columns (2r'+h -> (h, r')), one cheap (M, K)
    lane shuffle that XLA fuses. Measured at M=2048: 437us N=4096 /
    2056us N=14336 (was 885/3542; split-half sits at 392/1474 — the
    residual is XLA materializing the u8 stack where unpack_int4's 3-D
    concat fuses; benchmarks/results/r4/gemm_sol_m2048.json)."""
    m, k = x.shape
    kw, n = packed.shape
    g = group_size
    ng = k // g
    nt = ng // 4
    pb = packed.reshape(nt, g // 2, n)
    # cast each plane to uint8 BEFORE stacking: the stack is a fusion
    # barrier XLA materializes, and 8 int32 shifted copies would cost 4x
    # the bytes of the u8 nibble planes (i32 stacks measured 2902us, u8
    # stacks 2056us, u8 3-D concats 2473us at M=2048 K=4096 N=14336)
    planes = []
    for j in range(4):
        planes.append(jnp.stack(
            [((pb >> (4 * j)) & 0xF).astype(jnp.uint8),
             ((pb >> (4 * j + 16)) & 0xF).astype(jnp.uint8)], axis=1))
    # (nt, 4, 2, g/2, n) -> (K, n): row (t, j, h, r') = logical row
    # (4t+j)*g + 2r' + h; flatten order (t, j) = natural group order
    u = jnp.stack(planes, axis=1).reshape(k, n).astype(jnp.int32) - 8
    if zp_domain is P.ZeroPointDomain.FLOAT:
        w_dq = P.dequantize_affine_tinygemm(
            u, (g, 1), scale, zp, -8, 7, output_dtype=x.dtype)
    else:
        w_dq = P.dequantize_affine(u, (g, 1), scale, zp, output_dtype=x.dtype)
    # in-group index 2r'+h decomposes row-major as (r', h); kernel order
    # is (h, r')
    xp = x.reshape(m, ng, g // 2, 2).swapaxes(2, 3).reshape(m, k)
    return jnp.matmul(xp, w_dq)


# ---------------------------------------------------------------------------
# float8
# ---------------------------------------------------------------------------


def fp8_wo_matmul(x, qw, sw, wbs):
    w_dq = P.dequantize_float8(qw, wbs, sw, output_dtype=x.dtype)
    return jnp.matmul(x, w_dq)


def fp8_dynamic_matmul(qx, sx, qw, sw, wbs, out_dtype=jnp.bfloat16):
    """fp8 act x fp8 weight with rowwise (per-token x per-out-channel) scales.

    On TPU generations with native fp8 MXU support XLA lowers the fp8
    dot_general directly; otherwise it upcasts — either way the scale
    epilogue stays fused.  Blockwise (deepseek 1x128/128x128) scales go
    through the Pallas kernel.
    """
    m, k = qx.shape
    n = qw.shape[-1]
    rowwise = (sx.shape in ((m, 1), (1, 1))) and (sw.shape in ((1, n), (1, 1)))
    if rowwise:
        acc = jax.lax.dot_general(
            qx, qw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        y = acc * sx.reshape(-1, 1) * sw.reshape(1, -1)
        return y.astype(out_dtype)
    if _BACKEND == "pallas":
        # explicit opt-in only: v5e has no native fp8 MXU, so the fused
        # kernel loses to dequant+bf16-dot there (measured 82 vs 52us at
        # m=128); on fp8-native gens (v6e+) flip AUTO to prefer it
        from ao_tpu.ops.pallas import UnsupportedShape

        try:
            from ao_tpu.ops.pallas import fp8_matmul as pk

            return pk.fp8_blockwise_matmul_pallas(qx, sx, qw, sw, out_dtype)
        except (ImportError, UnsupportedShape):
            pass
    # emulated blockwise
    xbs = tuple(qx.shape[i] // sx.shape[i] for i in range(qx.ndim))
    x_dq = P.dequantize_float8(qx, xbs, sx, output_dtype=jnp.float32)
    w_dq = P.dequantize_float8(qw, wbs, sw, output_dtype=jnp.float32)
    return jnp.matmul(x_dq, w_dq).astype(out_dtype)
