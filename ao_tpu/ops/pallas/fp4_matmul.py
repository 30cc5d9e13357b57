"""Fused fp4 (e2m1) dequant x bf16 matmul — MXFP4 and NVFP4 weight-only.

(ref analog: the NVFP4/MXFP4 scaled-mm inference paths
torchao/prototype/mx_formats/nvfp4_tensor.py:52 and mx_tensor.py:510 AUTO →
torch._scaled_mm on SM100. TPU has no fp4 hardware; this kernel constructs
bf16 weights from e2m1 codes with pure integer bit-surgery + one
i32→bf16 bitcast, so the 4-bit checkpoint keeps its HBM-bandwidth win.)

Packing ("fp4 magic", see qarrays/fp4.py pack_fp4_magic): i32 words
(K/8, N); plane j = logical rows [j*K/4, (j+1)*K/4); word-row r holds the
remapped codes of rows (j*K/4 + 2r, j*K/4 + 2r + 1) at bits [4j] / [16+4j].
Code remap swaps the e2m1 em-field 0 <-> 1 so the in-kernel construction
  bits16 = ((c & 7) << 6) | ((c & 8) << 12) + 0x3F00 (per nonzero half)
is exact for every nonzero value ((1+m/2) * 2^(e-1) lands on the bf16
grid). TRUE-ZERO codes (em == 1 after remap, detected by one shared
OR-reduce per word) are killed by DENORMAL FLUSH: the exponent base is
added as the masked carry-free constant (tj<<14)-(tj<<8), so zero codes
keep exponent field 0 and the v5e MXU flushes them to exact 0 — no
halfword mask expand, no final AND (the round-2 mask chain measured
7.5us of a 20.3us kernel in an on-chip ablation).

Block scales apply POST-DOT as f32 rows on the (M, tn) accumulator — the
int4 magic kernel's group-scale structure:
  * MXFP4 (e8m0, 32-block): raw uint8 bytes DMA into the kernel (1/4 the
    bytes of the round-2 pre-built i32 sadd array) and become exact
    power-of-two f32 rows via one shift+bitcast.
  * NVFP4 (e4m3, 16-block): byte pairs packed into i32 words at quantize
    time (pack_nvfp4_scale_pairs), constructed to bf16 rows in-kernel
    ((s & 0x7F) << 4 | exp bias); the f32 per-tensor scale is applied on
    the (M, N) output (linearity: y = pts * (x @ (S .* C))).

Measured on v5e (M=8, K=N=4096, 2026-08): mxfp4 22.7-24.9us and BIT-EXACT
vs the emulated dequant reference (flush-kill + power-of-two f32 scale
rows reproduce it identically); nvfp4 26.0-28.5us at 49.4dB (one bf16
rounding in the e4m3 row construction) — down from 36.5us for the round-2
per-element scale multiply. Both against 468us for the emulated
dequant+matmul path and 45.8us bf16 dense. M<8 pads to a full 8-sublane
tile (_tile_m): Mosaic ran the M=1 tile at 76us/168us before the pad.

Structure ablation (on-chip, M=8 4096², 2026-08 round 3): the e2m1
DECODE ITSELF is the floor — decode + unscaled plane dot measures
22.5us, so the per-block dot + post-dot f32 scale FMA structure (this
kernel, 24.9us) pays only ~2.4us for all 128 block scales. Folding the
scale as a bf16 row-multiply into the decoded plane (exact, one dot per
plane) measured 38.4-41.3us in repeat/broadcast/chunked variants — the
(k/4, tn) element-wise multiply costs far more than the small-dot issue
overhead it removes, and fewer, bigger dots also lose the VPU/MXU
pipelining of the block loop. Remaining gap to the int4 kernel's 12.85us
is decode ops: e2m1 needs ~6 i32 lane-ops/weight (field split + masked
exponent-base zero-kill + sign placement) vs int4 magic's ~1.4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape


def _e2m1_plane(w, t8, j):
    """Plane-j e2m1 codes -> bf16 rows (1+m/2)*2^(e-1), with TRUE-ZERO
    codes killed by DENORMAL FLUSH: the exponent base 0x3F00 is added as a
    MASKED CONSTANT (tj<<14)-(tj<<8) — carry-free per half — so zero codes
    keep exponent field 0 (bits 0x0040|sign) and the v5e MXU/VPU flush
    them to exact +/-0.0 (flush measured on-chip; on a gen that honored
    denormals they'd contribute 2^-127 relative ~1 — negligible either
    way). This replaces the halfword mask-expand + AND of the round-2
    kernel: the zero-kill rides the base add for 0 extra vector ops."""
    ow = w if j == 0 else (w >> (4 * j))
    em = (ow & 0x00070007) << 6
    sg = (ow & 0x00080008) << 12
    tj = (t8 >> (4 * j)) & 0x00010001
    mbase = (tj << 14) - (tj << 8)  # 0x3F00 per nonzero half
    return pltpu.bitcast((em + sg) + mbase, jnp.bfloat16)


def _mx_kernel(x0, x1, x2, x3, w_ref, su8_ref, out_ref, acc_ref, *,
               out_dtype):
    """MXFP4 with the e8m0 block scale applied POST-DOT as f32 rows on the
    (M, tn) accumulator (the int4 magic kernel's group-scale structure at
    32-row granularity) — scales DMA as raw uint8 (1/4 the bytes of the
    round-2 pre-built i32 sadd array) and become exact power-of-two f32
    rows via one shift+bitcast."""
    w = w_ref[:]
    tkw, tn = w.shape
    nb = tkw // 16  # 32-row e8m0 blocks per plane
    xr = (x0, x1, x2, x3)

    z = w ^ 0x11111111
    t8 = (z | (z >> 1) | (z >> 2)) & 0x11111111

    # e8m0 byte e -> f32 2^(e-127) exactly: the in-plane construction
    # carries (1+m/2)*2^(e2m1_e - 1), so c*s = (1+m/2)*2^(e2m1_e + e - 128)
    # — identical to the emulated dequant
    sexp = su8_ref[:].astype(jnp.int32)  # (4*nb, tn) plane-major
    s = pltpu.bitcast(sexp << 23, jnp.float32)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for j in range(4):
        c = _e2m1_plane(w, t8, j)  # (2*tkw, tn) = (1+m/2)*2^(e-1)
        for t in range(nb):
            r0 = 32 * t
            pg = jnp.dot(xr[j][:, r0:r0 + 32], c[r0:r0 + 32],
                         preferred_element_type=jnp.float32)
            acc_ref[:] += s[j * nb + t][None, :] * pg

    out_ref[:] = acc_ref[:].astype(out_dtype)


def _nv_kernel(x0, x1, x2, x3, w_ref, sw_ref, out_ref, acc_ref, *,
               out_dtype):
    """NVFP4 with the e4m3 block scale applied POST-DOT as f32 rows on the
    (M, tn) accumulator — the int4 magic kernel's group-scale structure at
    16-row granularity — instead of the round-2 per-element bf16 multiply
    over the weight plane (measured 36.5us vs 26.0us for post-dot at M=8
    4096² before the flush-kill). Trades 16-row MXU dots (memory-bound
    shapes leave the MXU idle) for ~2 VPU lane-ops/weight + the repeat."""
    w = w_ref[:]
    tkw, tn = w.shape
    nbs = tkw // 8  # 16-row e4m3 blocks per plane
    xr = (x0, x1, x2, x3)

    z = w ^ 0x11111111
    t8 = (z | (z >> 1) | (z >> 2)) & 0x11111111

    # e4m3 scale bytes (pairs packed per i32) -> f32 rows: value
    # (1+m/8)*2^(e-7) has bf16 bits ((c&0x7F)<<4) + (120<<7)
    sw = sw_ref[:]  # (4*nbs/2, tn) i32, plane-major row pairs
    sbits = ((sw & 0x007F007F) << 4) + 0x3C003C00
    s = pltpu.bitcast(sbits, jnp.bfloat16).astype(jnp.float32)  # (4*nbs, tn)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for j in range(4):
        c = _e2m1_plane(w, t8, j)  # (2*tkw, tn) = (1+m/2)*2^(e-1)
        for t in range(nbs):
            r0 = 16 * t
            pg = jnp.dot(xr[j][:, r0:r0 + 16], c[r0:r0 + 16],
                         preferred_element_type=jnp.float32)
            acc_ref[:] += s[j * nbs + t][None, :] * pg

    out_ref[:] = acc_ref[:].astype(out_dtype)


def _tile_m(m):
    """Pad tiny M up to a full 8-sublane tile: Mosaic handles (1, x)
    operands poorly here — measured on v5e (4096², 2026-08) M=1 ran at
    76us (mxfp4) / 168us (nvfp4) vs 24.9/28.5 at M=8, so decode-latency
    callers were 3-6x off the kernel's real speed. Padding M→8 makes M<8
    cost exactly the M=8 time."""
    if m < 8:
        return 8
    return m if m <= 256 else 256


def _pick_tn_fp4(m, k, n, scale_rows):
    tm = _tile_m(m)

    def vmem_bytes(tn):
        return (
            4 * tm * (k // 4) * 2
            + 2 * (k // 8) * tn * 4
            + scale_rows * tn * 4
            + tm * tn * 6
        )

    budget = int(15.5 * 1024 * 1024)
    for tn in (1024, 512, 256, 128):
        if n % tn == 0 and vmem_bytes(tn) <= budget:
            return tn
    raise UnsupportedShape(f"no VMEM-feasible N tile for m={m} k={k} n={n}")


def _run(kernel, x, word, scale_arr, scale_rows, out_dtype):
    m, k = x.shape
    kw, n = word.shape
    tn = _pick_tn_fp4(m, k, n, scale_rows)
    xs4 = [x[:, j * (k // 4):(j + 1) * (k // 4)] for j in range(4)]

    tm = _tile_m(m)
    pad_m = (-m) % tm
    if pad_m:
        xs4 = [jnp.pad(xj, ((0, pad_m), (0, 0))) for xj in xs4]
    mp = m + pad_m

    grid = (mp // tm, n // tn, 1)
    cost = pl.CostEstimate(
        flops=2 * mp * k * n,
        bytes_accessed=mp * k * 2 + kw * n * 4 + scale_rows * n * 4
        + mp * n * 2,
        transcendentals=0,
    )
    out = pl.pallas_call(
        functools.partial(kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            *[pl.BlockSpec((tm, k // 4), lambda i, j, kk: (i, 0),
                           memory_space=pltpu.VMEM) for _ in range(4)],
            pl.BlockSpec((kw, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((scale_rows, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(*xs4, word, scale_arr)
    return out[:m] if pad_m else out


@functools.partial(jax.jit, static_argnames=())
def _mxfp4_impl(x, word, scale_u8):
    # raw e8m0 bytes straight to the kernel: the exponent-add words are
    # built in-kernel (1/4 the scale DMA of a pre-built i32 sadd array)
    return _run(_mx_kernel, x, word, scale_u8, scale_u8.shape[0],
                jnp.bfloat16)


def mxfp4_wo_matmul_pallas(x, word, scale_u8):
    """x (M, K) hp; word i32 (K/8, N) fp4-magic; scale_u8 (K/32, N) e8m0
    bytes (biased exponents)."""
    if x.ndim != 2 or word.ndim != 2:
        raise UnsupportedShape("kernel handles 2-D only")
    m, k = x.shape
    kw, n = word.shape
    if k != 8 * kw or k % 128 != 0 or n % 128 != 0:
        raise UnsupportedShape(f"mxfp4 magic needs K%128==0, got {k}x{n}")
    if (k // 32) % 32 != 0:
        # uint8 scale tiles need a (32, 128)-aligned sublane count
        raise UnsupportedShape(f"mxfp4 magic needs K%1024==0 scales, K={k}")
    return _mxfp4_impl(x.astype(jnp.bfloat16), word,
                       scale_u8.astype(jnp.uint8))


@functools.partial(jax.jit, static_argnames=())
def _nvfp4_impl(x, word, sw):
    return _run(_nv_kernel, x, word, sw, sw.shape[0], jnp.bfloat16)


def nvfp4_wo_matmul_pallas(x, word, scale_words, per_tensor_scale):
    """x (M, K) hp; word i32 (K/8, N) fp4-magic; scale_words i32 (K/32, N)
    pre-packed e4m3 pair-words (qarrays/fp4.pack_nvfp4_scale_pairs — packed
    at quantize time, zero per-call prep); per-tensor f32 scalar applied
    POST-DOT on the (M, N) output (linearity: y = pts * (x @ (S .* C)))."""
    if x.ndim != 2 or word.ndim != 2:
        raise UnsupportedShape("kernel handles 2-D only")
    m, k = x.shape
    kw, n = word.shape
    if k != 8 * kw or k % 64 != 0 or n % 128 != 0:
        raise UnsupportedShape(f"nvfp4 magic needs K%64==0, got {k}x{n}")
    if scale_words.dtype != jnp.int32:
        # back-compat: containers restored from pre-pack-at-quantize-time
        # checkpoints carry raw e4m3 (K/16, N) scales — pack on the fly
        # (the same cheap op that used to run per call)
        from ao_tpu.quantization.qarrays.fp4 import pack_nvfp4_scale_pairs

        scale_words = pack_nvfp4_scale_pairs(scale_words)
    y = _nvfp4_impl(x.astype(jnp.bfloat16), word, scale_words)
    if per_tensor_scale is not None:
        y = y.astype(jnp.float32) * per_tensor_scale.astype(jnp.float32)
    return y
