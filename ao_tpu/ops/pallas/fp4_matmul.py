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
  bits16 = ((c & 7) << 6) | ((c & 8) << 12) + (base + scale_exp) << 7
is exact for every nonzero value ((1+m/2) * 2^(e-1) lands on the bf16
grid) and zero is detectable as em == 1 (one shared OR-reduce per word
covers all 8 nibbles; the mask is applied in the integer domain).

Scales:
  * MXFP4 (e8m0, 32-block): pure powers of two — folded into the bf16
    exponent with an integer 3-D broadcast ADD before the bitcast. No
    per-group dots, no floating multiply.
  * NVFP4 (e4m3, 16-block): the scale byte pair is packed into i32 words
    outside, constructed to bf16 in-kernel ((s & 0x7F) << 4 | exp bias),
    and multiplied into the plane with a 16-row broadcast; the f32
    per-tensor scale folds into the activation outside.

Measured on v5e (M=8, K=N=4096): mxfp4 23.6us and BIT-EXACT vs the
emulated dequant reference (the integer exponent-add reproduces it
identically); nvfp4 37us at 49.8dB vs emulated (one bf16 rounding from
the scale multiply). Both against 468us for the emulated dequant+matmul
path and 46us bf16 dense. The VPU op-count floor (~7 lane-ops/nibble for
construct+mask+scale vs ~3 for int4, plus nvfp4's per-element bf16
multiply) puts fp4 at 1.6-2.5x the int4 kernel's ~15us — the e2m1→bf16
bit-layout gap is the structural cost on a VPU with no sub-word SIMD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape


def _common_planes(w, j, t8):
    ow = w if j == 0 else (w >> (4 * j))
    em = (ow & 0x00070007) << 6
    sg = (ow & 0x00080008) << 12
    bits = em + sg
    tj = (t8 >> (4 * j)) & 0x00010001
    return bits, tj


def _mx_kernel(x0, x1, x2, x3, w_ref, sadd_ref, out_ref, acc_ref, *,
               out_dtype):
    w = w_ref[:]
    tkw, tn = w.shape
    nb = tkw // 16  # 32-row e8m0 blocks per plane
    xr = (x0, x1, x2, x3)

    z = w ^ 0x11111111
    t8 = (z | (z >> 1) | (z >> 2)) & 0x11111111

    acc_ref[:] = jnp.zeros_like(acc_ref)
    sadd = sadd_ref[:]  # (4*nb, tn) i32, plane-major
    for j in range(4):
        bits, tj = _common_planes(w, j, t8)
        b3 = bits.reshape(nb, 16, tn) + sadd[j * nb:(j + 1) * nb][:, None, :]
        bits = b3.reshape(tkw, tn) & ((tj << 16) - tj)
        c = pltpu.bitcast(bits, jnp.bfloat16)
        acc_ref[:] += jnp.dot(xr[j][:], c, preferred_element_type=jnp.float32)

    out_ref[:] = acc_ref[:].astype(out_dtype)


def _nv_kernel(x0, x1, x2, x3, w_ref, sw_ref, out_ref, acc_ref, *,
               out_dtype):
    w = w_ref[:]
    tkw, tn = w.shape
    nb = tkw // 8  # 16-row e4m3 blocks per plane
    xr = (x0, x1, x2, x3)

    z = w ^ 0x11111111
    t8 = (z | (z >> 1) | (z >> 2)) & 0x11111111

    # e4m3 scale bytes (pairs packed per i32) -> bf16 rows: value
    # (1+m/8)*2^(e-7) has bf16 bits ((c&0x7F)<<4) + (120<<7)
    sw = sw_ref[:]  # (4*nb/2, tn) i32, plane-major row pairs
    sbits = ((sw & 0x007F007F) << 4) + 0x3C003C00
    sbf = pltpu.bitcast(sbits, jnp.bfloat16)  # (4*nb, tn)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for j in range(4):
        bits, tj = _common_planes(w, j, t8)
        bits = (bits + (0x3F003F00)) & ((tj << 16) - tj)
        c = pltpu.bitcast(bits, jnp.bfloat16)  # value (1+m/2)*2^(e-1)
        # row-repeat + 2-D multiply: measurably cheaper than the
        # (nb, 16, tn) broadcast form on v5e (37us vs 50us end-to-end)
        sexp = jnp.repeat(sbf[j * nb:(j + 1) * nb], 16, axis=0)
        c = c * sexp
        acc_ref[:] += jnp.dot(xr[j][:], c, preferred_element_type=jnp.float32)

    out_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_tn_fp4(m, k, n, scale_rows):
    tm = m if m <= 256 else 256

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

    tm = m if m <= 256 else 256
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
def _mxfp4_impl(x, word, sexp):
    # per-half exponent add: base 62<<7 + (e8m0 - 63)<<7, both halves
    d = (jnp.maximum(sexp, 63) - 63) << 7
    sadd = (d + (d << 16)) + 0x1F001F00
    return _run(_mx_kernel, x, word, sadd, sexp.shape[0], jnp.bfloat16)


def mxfp4_wo_matmul_pallas(x, word, scale_u8):
    """x (M, K) hp; word i32 (K/8, N) fp4-magic; scale_u8 (K/32, N) e8m0
    bytes (biased exponents)."""
    if x.ndim != 2 or word.ndim != 2:
        raise UnsupportedShape("kernel handles 2-D only")
    m, k = x.shape
    kw, n = word.shape
    if k != 8 * kw or k % 128 != 0 or n % 128 != 0:
        raise UnsupportedShape(f"mxfp4 magic needs K%128==0, got {k}x{n}")
    return _mxfp4_impl(x.astype(jnp.bfloat16), word,
                       scale_u8.astype(jnp.int32))


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
        raise UnsupportedShape("nvfp4 magic layout needs pre-packed scales")
    y = _nvfp4_impl(x.astype(jnp.bfloat16), word, scale_words)
    if per_tensor_scale is not None:
        y = y.astype(jnp.float32) * per_tensor_scale.astype(jnp.float32)
    return y
