"""Fused int4-dequant × bf16-activation matmul (weight-only groupwise).

TPU-native replacement for the reference's tinygemm/mslk int4 GEMMs
(ref: aten._weight_int4pack_mm call site torchao .../int4_tile_packed_to_4d_tensor.py:287,
mslk bf16i4bf16_rowwise .../int4_tensor.py). The packing is NOT the CUDA
tile/WGMMA layout — it is the group-local split-half layout from
ao_tpu.quantization.qarrays.int4: within each quantization group of g rows,
byte j holds logical rows j (low nibble) and j + g/2 (high nibble).

Unpacking is a mask + shift + sublane concat inside the per-group reshape
the dequant performs anyway, so the kernel issues ONE MXU dot per tile and
never interleaves lanes. Dequant is normalized to w = u * s + b
(u = nibble 0..15):
  * FLOAT zp domain: s = scale, b = zero_point        (dq = u*s + zp)
  * INT zp domain:   s = scale, b = -(8 + zp) * scale
The (s, b) normalization happens outside the kernel (tiny elementwise op
fused by XLA). Accumulation is f32 in VMEM scratch across the K grid dim.

Three kernels, selected by the container layout:
  * int32 "magic" layout (default for 2-D weight-only) — nibble→bf16 via
    integer bit-ops + bitcast, per-group post-dot scaling, in-kernel
    lane-reduced affine bias; 81.0% of the int4-bytes roofline at M=8
    4096² g=128 on v5e (12.85us linear-level, benchmarks/gemm_sol.py — the
    canonical table; the measured DMA ceiling itself is ~90% of roofline,
    so the kernel sits at ~90% of achievable). At M=512 the kernel ties
    bf16 dense (~99us vs 97us measured) and past one 256-row M tile it
    re-reads the packed weight per tile, so auto-dispatch gates it to
    M<=256 and routes prefill through XLA dequant+matmul
    (kernels.int4_wo_matmul).
  * int32 "magic8" layout (auto for int8-activation weights) — W4A8 on
    the int8 MXU, 82.9% SoL (12.5us, ~93% of the DMA ceiling); see the
    W4A8 section below.
  * uint8 split-half layout (MoE 3-D / odd group counts / K-sharding
    fallbacks) — two-plane f32-dequant kernel, 19.7us on the same shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape
from ao_tpu.quantization import primitives as P


def _kernel(x_ref, w_ref, s_ref, b_ref, out_ref, acc_ref, *,
            n_kp: int, group_size: int, out_dtype):
    kp = pl.program_id(2)

    @pl.when(kp == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[:]
    tkp, tn = packed.shape  # packed rows = logical rows / 2
    tkl = 2 * tkp
    g = group_size
    ng = tkl // g
    gh = g // 2

    # unpack group-local split halves: (tkp, tn) -> (ng, g, tn)
    p32 = packed.astype(jnp.int32)
    lo = (p32 & 0xF).astype(jnp.float32).reshape(ng, gh, tn)
    hi = (p32 >> 4).astype(jnp.float32).reshape(ng, gh, tn)
    w3 = jnp.concatenate([lo, hi], axis=1)  # (ng, g, tn), logical order
    s = s_ref[:].reshape(ng, 1, tn)
    b = b_ref[:].reshape(ng, 1, tn)
    w = (w3 * s + b).reshape(tkl, tn).astype(jnp.bfloat16)

    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kp == n_kp - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel_twoplane(xlo_ref, xhi_ref, w_ref, s_ref, b_ref, out_ref, acc_ref,
                     *, n_kp: int, group_size: int, out_dtype):
    """Decode-shape variant (small M): dequantize the lo/hi nibble planes
    SEPARATELY and issue two full-length dots against the matching halves
    of the activation (pre-split outside the kernel — (m, K) is tiny). This
    skips the sublane concat copy of the combined plane; measured on v5e it
    is slightly faster and ~9 dB more accurate than the concat kernel at
    M=8 (f32 dequant, one fewer bf16 round-trip through VMEM)."""
    kp = pl.program_id(2)

    @pl.when(kp == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[:]
    tkp, tn = packed.shape
    g = group_size
    ng = 2 * tkp // g
    gh = g // 2

    p32 = packed.astype(jnp.int32)  # mosaic lacks a u8→bf16/f32 cast
    lo = (p32 & 0xF).astype(jnp.float32).reshape(ng, gh, tn)
    hi = (p32 >> 4).astype(jnp.float32).reshape(ng, gh, tn)
    s = s_ref[:].reshape(ng, 1, tn)
    b = b_ref[:].reshape(ng, 1, tn)
    lo_dq = (lo * s + b).reshape(tkp, tn).astype(jnp.bfloat16)
    hi_dq = (hi * s + b).reshape(tkp, tn).astype(jnp.bfloat16)

    acc_ref[:] += jnp.dot(xlo_ref[:], lo_dq, preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xhi_ref[:], hi_dq, preferred_element_type=jnp.float32)

    @pl.when(kp == n_kp - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _valid_tkp(cand, kp, g):
    """BlockSpec legality of a K/2-tile: every operand the tile touches —
    x (tm, 2c): 2c %128 or == k; scale (2c/g, tn): %8 rows or == k/g."""
    gh = g // 2
    k = 2 * kp
    if kp % cand or cand % gh:
        return False
    tkl = 2 * cand
    if tkl % 128 and tkl != k:
        return False
    if (tkl // g) % 8 and tkl != k:
        return False
    return True


def candidate_tiles(m, kp, n, g):
    """All legal (tm, tkp, tn) tile combos for the autotuner. tm is legal
    when it's a multiple of 8 (multi-block rows) or covers the whole padded
    m (single block); candidates keep to one tm per regime plus 256."""
    tms = {m if m <= 256 else 256}
    if 8 < m <= 256 and m % 8:
        tms.add(min(256, (m + 7) // 8 * 8))
    tns = [t for t in (128, 256, 512, 1024) if n % t == 0]
    tkps = sorted({c for c in (64, 128, 256, 512, 1024, 2048, kp)
                   if c <= kp and _valid_tkp(c, kp, g)})
    return [(tm, tkp, tn) for tm in sorted(tms) for tkp in tkps
            for tn in tns]


def _pick_tiles(m, kp, n, g):
    # consult the measured-autotune cache first (ops/pallas/autotune.py)
    from ao_tpu.ops.pallas.autotune import lookup_tuned

    tuned = lookup_tuned("int4_wo_matmul", m, 2 * kp, n, g)
    if tuned is not None and _valid_tkp(tuned[1], kp, g):
        return tuple(tuned)

    # heuristic (tile sweep on v5e 2026-08): tkl=4096 (tkp=2048), tn=512
    tm = m if m <= 256 else 256
    tn = 512 if n % 512 == 0 else (256 if n % 256 == 0 else 128)
    tkp = kp  # whole-K fallback: full-dim blocks are always legal
    for cand in (2048, 1024, 512, 256, 128, 64):
        if _valid_tkp(cand, kp, g):
            tkp = cand
            break
    return tm, tkp, tn


@functools.partial(jax.jit,
                   static_argnames=("group_size", "out_dtype", "tiles"))
def _int4_wo_matmul_impl(x, packed, s, b, *, group_size, out_dtype,
                         tiles=None):
    m, k = x.shape
    kp, n = packed.shape
    g = group_size

    tm, tkp, tn = tiles if tiles is not None else _pick_tiles(m, kp, n, g)
    tkl = 2 * tkp

    pad_m = (-m) % tm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    grid = (mp // tm, n // tn, kp // tkp)
    cost = pl.CostEstimate(
        flops=2 * mp * k * n,
        bytes_accessed=mp * k * 2 + kp * n + (k // g) * n * 8 + mp * n * 2,
        transcendentals=0,
    )

    if m <= 64 and mp == tm:
        gh = g // 2
        xg = x.reshape(mp, k // g, g)
        xlo = xg[:, :, :gh].reshape(mp, kp)
        xhi = xg[:, :, gh:].reshape(mp, kp)
        out = pl.pallas_call(
            functools.partial(
                _kernel_twoplane, n_kp=grid[2], group_size=g,
                out_dtype=out_dtype,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tkp), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, tkp), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tkp, tn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tkl // g, tn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tkl // g, tn), lambda i, j, kk: (kk, j),
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
        )(xlo, xhi, packed, s, b)
        return out[:m] if pad_m else out

    out = pl.pallas_call(
        functools.partial(
            _kernel, n_kp=grid[2], group_size=g, out_dtype=out_dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tkl), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tkp, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tkl // g, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tkl // g, tn), lambda i, j, kk: (kk, j),
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
    )(x, packed, s, b)

    return out[:m] if pad_m else out


# ---------------------------------------------------------------------------
# "magic" layout kernel: nibble -> bf16 via integer bit-ops + bitcast
# ---------------------------------------------------------------------------
#
# qdata is the pack_int4_magic int32 layout (qarrays/int4.py): bit-plane j of
# a word block holds the rows of quantization groups {g' ≡ j mod 4} in natural
# order. Per plane j and group-chunk t the kernel does
#     ow = ((w >> 4j) & 0x000F000F) | 0x43004300        # 3 int ops / 2 weights
#     c  = bitcast_bf16(ow)                             # rows = 128 + u, EXACT
#     acc += s[4t+j] * dot(x_j[t], c)                   # scale in f32 post-dot
#     acc += xsum_j[t] * b2'[4t+j]                      # bias row absorbs -136s
# so the per-weight VPU cost is ~1.4 ops (no int->float converts, no
# recenter subtract on the weight plane) and the groupwise scale multiplies
# an (M, tn) f32 accumulator, not the weights. The rows decode UNSHIFTED to
# 128+u; the -136*s recenter (128 bitcast offset + the u-8 symmetric zero)
# folds into the affine-bias row b2' = b + 8s - 136s applied via the exact
# per-group activation sums: sum_k x_k * (128 + u_k) * s + xsum * b2'
# = sum_k x_k (u_k s + b). Interleaving extraction with each group's dot
# lets Mosaic pipeline VPU against MXU.
#
# Measured on v5e (M=8, K=N=4096, g=128, gemm_sol.py linear-level):
# 12.85us = 81.0% of the int4-bytes roofline (folding the recenter into
# the bias row bought 15.0 -> 12.85us; SQNR 53.0dB), vs 11.6us pure-DMA
# floor (the DMA engine itself tops out at ~90% of roofline — bf16 dense
# reaches 89.8%; normalized to that ceiling the kernel is at ~90% of
# achievable) and 19.7us for the split-half two-plane kernel. Post-dot
# f32 scaling beats pre-rounded bf16 weights by ~2.4dB; the affine bias
# is an in-kernel f32 lane reduction (see _w4a8 notes — an (m, ngf) xsum
# INPUT is a v5e Mosaic pathology and an MXU bias dot loses precision).
# At M=512 (prefill) it also beats the bf16 dense matmul (99 vs ~145us
# in the same harness). The remaining SoL gap is the nibble→bf16 VPU
# cost — the magic8 W4A8 kernel below sidesteps it on the int8 MXU.


def _magic_kernel(x0, x1, x2, x3, w_ref, s_ref, b_ref, out_ref,
                  acc_ref, *, group_size: int, out_dtype):
    acc_ref[:] = jnp.zeros_like(acc_ref)
    w = w_ref[:]
    tkw, _ = w.shape
    g = group_size
    nt = 8 * tkw // (4 * g)
    xr = (x0, x1, x2, x3)
    s = s_ref[:].astype(jnp.float32)  # DMA'd bf16, applied in f32
    # rows decode UNSHIFTED to 128+u; the -136 recenter folds into the
    # bias row in f32 HERE (cheap (ngf, tn) op) rather than a bf16
    # subtract over the whole weight plane (one VPU op per 2 weights on
    # the hot path) or a bf16 rounding of the big bias (-20dB)
    b = b_ref[:].astype(jnp.float32) - 136.0 * s
    for j in range(4):
        shifted = w if j == 0 else (w >> (4 * j))
        for t in range(nt):
            wr0, wr1 = t * g // 2, (t + 1) * g // 2
            ow = (shifted[wr0:wr1] & 0x000F000F) | 0x43004300
            c = pltpu.bitcast(ow, jnp.bfloat16)
            r0 = t * g
            pg = jnp.dot(xr[j][:, r0:r0 + g], c,
                         preferred_element_type=jnp.float32)
            acc_ref[:] += s[4 * t + j][None, :] * pg
            # affine bias: per-group activation sums computed IN-KERNEL by
            # a lane reduction (an (m, ngf) xsum input block is narrower
            # than 128 lanes — a Mosaic post-run pathology on v5e — and an
            # MXU bias dot costs f32 precision), then one f32 FMA row
            xs = jnp.sum(xr[j][:, r0:r0 + g].astype(jnp.float32), axis=1,
                         keepdims=True)
            acc_ref[:] += xs * b[4 * t + j][None, :]
    out_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_tn_magic(m, k, n, group_size):
    from ao_tpu.ops.pallas.autotune import lookup_tuned

    tm = m if m <= 256 else 256
    ngf = k // group_size

    def vmem_bytes(tn):
        # x planes + packed words (double-buffered) + scales/bias + acc/out
        return (
            4 * tm * (k // 4) * 2
            + 2 * (k // 8) * tn * 4
            + 2 * ngf * tn * 2
            + tm * tn * 6
            + tm * ngf * 4
        )

    budget = int(15.5 * 1024 * 1024)  # v5e scoped-vmem limit is 16M
    tuned = lookup_tuned("int4_wo_magic", m, k, n, 0)
    if (tuned is not None and n % tuned[2] == 0
            and vmem_bytes(tuned[2]) <= budget):
        return tuned[2]
    for tn in (1024, 512, 256, 128):
        if n % tn == 0 and vmem_bytes(tn) <= budget:
            return tn
    raise UnsupportedShape(
        f"no VMEM-feasible N tile for m={m}, k={k}, n={n}"
    )


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def _int4_wo_magic_impl(x, word, s, b2, *, group_size, out_dtype):
    m, k = x.shape
    kw, n = word.shape
    g = group_size
    ngf = k // g
    tn = _pick_tn_magic(m, k, n, g)

    # plane-j activations: groups with g' % 4 == j, natural row order
    xg = x.reshape(m, ngf // 4, 4, g)
    xs4 = [xg[:, :, j].reshape(m, k // 4) for j in range(4)]

    tm = m if m <= 256 else 256
    pad_m = (-m) % tm
    if pad_m:
        xs4 = [jnp.pad(xj, ((0, pad_m), (0, 0))) for xj in xs4]
    mp = m + pad_m

    grid = (mp // tm, n // tn, 1)
    kq = k // 4
    cost = pl.CostEstimate(
        flops=2 * mp * k * n,
        bytes_accessed=mp * k * 2 + kw * n * 4 + ngf * n * 2 + mp * n * 2,
        transcendentals=0,
    )
    out = pl.pallas_call(
        functools.partial(_magic_kernel, group_size=g, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            *[pl.BlockSpec((tm, kq), lambda i, j, kk: (i, 0),
                           memory_space=pltpu.VMEM) for _ in range(4)],
            pl.BlockSpec((kw, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngf, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngf, tn), lambda i, j, kk: (0, j),
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
    )(*xs4, word, s, b2)
    return out[:m] if pad_m else out


def int4_wo_magic_pallas(x, word, scale, zp, group_size, zp_domain):
    """x (M, K) hp; word int32 (K/8, N) magic layout; scale/zp (K/g, N)."""
    if x.ndim != 2 or word.ndim != 2:
        raise UnsupportedShape("kernel handles 2-D only")
    m, k = x.shape
    kw, n = word.shape
    if k != 8 * kw:
        raise UnsupportedShape(f"K mismatch {k} vs packed {kw}*8")
    g = group_size
    if n % 128 != 0 or (k // g) % 4 != 0 or (g // 2) % 8 != 0:
        raise UnsupportedShape(
            f"N={n} or K={k} misaligned for magic layout (g={g})"
        )

    s = scale.astype(jnp.float32)
    if zp_domain is P.ZeroPointDomain.FLOAT:
        b = zp.astype(jnp.float32)
    elif zp is None:
        b = -8.0 * s
    else:
        b = -(8.0 + zp.astype(jnp.float32)) * s
    b2 = b + 8.0 * s  # kernel rows are q = u - 8

    x = x.astype(jnp.bfloat16)
    # scales/bias travel as bf16 (halves their DMA; the kernel multiplies in
    # f32 — scale rounding ~2^-9 sits far below int4 quantization error)
    return _int4_wo_magic_impl(
        x, word, s.astype(jnp.bfloat16), b2.astype(jnp.bfloat16),
        group_size=g, out_dtype=jnp.bfloat16
    )


# ---------------------------------------------------------------------------
# W4A8: int8 activations x "magic8" int4 weights on the int8 MXU
# ---------------------------------------------------------------------------
#
# (ref analog: the int8-dynamic-activation int4-weight CUDA/CPU path,
# quant_api.py Int8DynamicActivationInt4WeightConfig.) qdata is the 2-plane
# pack_int4_magic8 layout (qarrays/int4.py): plane A = even quantization
# groups, plane B = odd groups; word byte b holds plane A row 4r+b in the
# low nibble and plane B row 4r+b in the high nibble. Per group-pair t:
#     a8 = bitcast_i8(w[t] & 0x0F0F0F0F)        # plane A group 2t rows,
#     acc += s[2t]   * dot_i8(xa[t], a8)        #   natural order, NO zero
#     b8 = bitcast_i8((w[t] >> 4) & 0x0F0F0F0F) #   rows, NO converts
#     acc += s[2t+1] * dot_i8(xb[t], b8)
# so the weights never leave the integer domain: the MXU runs exact
# i8xi8->i32 dots at exact-K MACs (the earlier 4-plane attempt needed
# zero-interleaved activations that doubled the MACs and cost ~10us of XLA
# prep), per-weight VPU cost is ~1 op (one shift+mask per TWO weights),
# and groupwise scales multiply exact i32 partials in f32. The affine bias
# is an in-kernel per-group lane reduction of the int8 activations (exact
# in f32) FMA'd against the bias rows; per-token activation scales apply
# outside. On the int8 MXU (2x bf16 peak) this wins at prefill M too.
#
# Measured on v5e (K=N=4096, g=128, device_time_us incl. activation-plane
# prep, vs the bf16 magic-WO kernel in the same harness): M=8 14.0us vs
# 17.8, M=64 23.6 vs 25.5, M=512 98.2 vs 126.8 (and vs ~123us bf16 dense).
# SQNR vs the exact q/dq emulation: 52.6dB (f32 rounding only — the int
# core and the f32 bias reductions are exact).


def _w4a8_kernel(xa, xb, w_ref, s_ref, b_ref, out_ref,
                 acc_ref, *, group_size: int, out_dtype):
    w = w_ref[:]
    tkw, _ = w.shape
    g = group_size
    nt = 8 * tkw // (2 * g)  # group-pairs in this K tile
    s = s_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    # whole-plane extraction up front: per-group-slice bitcasts wedge the
    # v5e (the kernel "completes" but the chip hangs on the next program)
    a8 = pltpu.bitcast(w & 0x0F0F0F0F, jnp.int8)        # (4*tkw, tn)
    b8 = pltpu.bitcast((w >> 4) & 0x0F0F0F0F, jnp.int8)
    for t in range(nt):
        r0 = t * g
        pa = jnp.dot(xa[:, r0:r0 + g], a8[r0:r0 + g],
                     preferred_element_type=jnp.int32)
        acc_ref[:] += s[2 * t][None, :] * pa.astype(jnp.float32)
        # affine bias via in-kernel lane reduction (exact: int8 group sums
        # fit f32) — an (m, ngf) xsum INPUT block is narrower than 128
        # lanes, a Mosaic post-run pathology on v5e, and an XLA epilogue
        # costs (m, n) extra bandwidth at prefill M
        xsa = jnp.sum(xa[:, r0:r0 + g].astype(jnp.float32), axis=1,
                      keepdims=True)
        acc_ref[:] += xsa * b[2 * t][None, :]
        pb = jnp.dot(xb[:, r0:r0 + g], b8[r0:r0 + g],
                     preferred_element_type=jnp.int32)
        acc_ref[:] += s[2 * t + 1][None, :] * pb.astype(jnp.float32)
        xsb = jnp.sum(xb[:, r0:r0 + g].astype(jnp.float32), axis=1,
                      keepdims=True)
        acc_ref[:] += xsb * b[2 * t + 1][None, :]
    out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def _int4_w4a8_impl(xq, word, s, b, *, group_size, out_dtype):
    m, k = xq.shape
    kw, n = word.shape
    g = group_size
    ngf = k // g
    tn = _pick_tn_magic(m, k, n, g)

    # plane activations: two contiguous slices of the group-pair reshape
    # (cheap — no zero interleaving)
    pair = xq.reshape(m, ngf // 2, 2, g)
    xa = pair[:, :, 0].reshape(m, k // 2)
    xb = pair[:, :, 1].reshape(m, k // 2)

    tm = m if m <= 256 else 256
    pad_m = (-m) % tm
    if pad_m:
        xa = jnp.pad(xa, ((0, pad_m), (0, 0)))
        xb = jnp.pad(xb, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    cost = pl.CostEstimate(
        flops=2 * mp * k * n,
        bytes_accessed=mp * k + kw * n * 4 + 2 * ngf * n * 2 + mp * n * 4,
        transcendentals=0,
    )
    # Grid order decides which operand stays VMEM-resident between steps.
    # Decode (one M tile): n sweeps, weight blocks stream once — order
    # irrelevant. Prefill (many M tiles): put N OUTER and M INNER so the
    # weight/scale blocks' index maps are constant across the inner M
    # sweep and Mosaic elides their re-fetch — weights then DMA once
    # TOTAL instead of once per M tile (the re-read made the fused path
    # 0.5x bf16 on a DiT-XL M=2048 step; x re-reads cost only
    # n_tiles * M*K int8 bytes, far smaller at prefill shapes).
    m_tiles, n_tiles = mp // tm, n // tn
    if m_tiles > 1:
        grid = (n_tiles, m_tiles, 1)
        xmap = lambda j, i, kk: (i, 0)      # noqa: E731
        wmap = lambda j, i, kk: (0, j)      # noqa: E731
        omap = lambda j, i, kk: (i, j)      # noqa: E731
    else:
        grid = (m_tiles, n_tiles, 1)
        xmap = lambda i, j, kk: (i, 0)      # noqa: E731
        wmap = lambda i, j, kk: (0, j)      # noqa: E731
        omap = lambda i, j, kk: (i, j)      # noqa: E731
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, group_size=g, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k // 2), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k // 2), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, tn), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((ngf, tn), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((ngf, tn), wmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), omap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(xa, xb, word, s, b)
    return out[:m] if pad_m else out


def int4_w4a8_matmul_pallas(xq, sx, word, scale, zp, group_size, zp_domain):
    """xq (M, K) int8 (symmetric per-token, scale sx (M, 1) f32); word int32
    (K/8, N) magic8 layout. Returns f32 (M, N) already scaled by sx."""
    if xq.ndim != 2 or word.ndim != 2:
        raise UnsupportedShape("kernel handles 2-D only")
    m, k = xq.shape
    kw, n = word.shape
    g = group_size
    if k != 8 * kw:
        raise UnsupportedShape(f"K mismatch {k} vs packed {kw}*8")
    if n % 128 != 0 or (k // g) % 2 != 0 or g % 8 != 0:
        raise UnsupportedShape(
            f"N={n} or K={k} misaligned for magic8 layout (g={g})"
        )
    s = scale.astype(jnp.float32)
    if zp_domain is P.ZeroPointDomain.FLOAT:
        b = zp.astype(jnp.float32)
    elif zp is None:
        b = -8.0 * s
    else:
        b = -(8.0 + zp.astype(jnp.float32)) * s
    y = _int4_w4a8_impl(
        xq, word, s.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        group_size=g, out_dtype=jnp.float32,
    )
    return y * sx.astype(jnp.float32)


def int4_wo_matmul_pallas(x, packed, scale, zp, group_size, zp_domain):
    """x (M, K) hp; packed uint8 (K/2, N) group-local split-half layout;
    scale/zp (K/g, N)."""
    if x.ndim != 2 or packed.ndim != 2:
        raise UnsupportedShape("kernel handles 2-D only")
    m, k = x.shape
    kp, n = packed.shape
    if k != 2 * kp:
        raise UnsupportedShape(f"K mismatch {k} vs packed {kp}*2")
    if n % 128 != 0 or kp % (group_size // 2) != 0:
        raise UnsupportedShape(f"N={n} or K/2={kp} misaligned (g={group_size})")

    # normalize qparams to w = u*s + b
    s = scale.astype(jnp.float32)
    if zp_domain is P.ZeroPointDomain.FLOAT:
        b = zp.astype(jnp.float32)
    elif zp is None:
        b = -8.0 * s
    else:
        b = -(8.0 + zp.astype(jnp.float32)) * s

    x = x.astype(jnp.bfloat16)
    return _int4_wo_matmul_impl(
        x, packed, s, b, group_size=group_size, out_dtype=jnp.bfloat16
    )


# ---------------------------------------------------------------------------
# magic8 → per-channel int8 requantization (prefill W4A8 feeder)
# ---------------------------------------------------------------------------


def _requant_kernel(w_ref, a_ref, b_ref, out_ref, *, group_size: int):
    """word (g*PP/8... (pp*g/8? — block holds PP group-pairs) magic8 →
    natural-order int8 rows (2*PP*g, tn):
    out[k] = round(a'[g(k)] * u[k] + b'[g(k)]), a'/b' the per-group
    dequant params pre-divided by the per-channel int8 scale."""
    w = w_ref[:]
    kwb, tn = w.shape
    g = group_size
    npairs = 8 * kwb // (2 * g)  # pairs in THIS block
    a8 = pltpu.bitcast(w & 0x0F0F0F0F, jnp.int8)         # (4kwb, tn) plane A
    b8 = pltpu.bitcast((w >> 4) & 0x0F0F0F0F, jnp.int8)  # plane B
    aa = a_ref[:].astype(jnp.float32)
    bb = b_ref[:].astype(jnp.float32)
    for t in range(npairs):
        ua = a8[t * g:(t + 1) * g].astype(jnp.float32)
        va = jnp.round(ua * aa[2 * t][None, :] + bb[2 * t][None, :])
        out_ref[2 * t * g:(2 * t + 1) * g] = jnp.clip(
            va, -127.0, 127.0).astype(jnp.int8)
        ub = b8[t * g:(t + 1) * g].astype(jnp.float32)
        vb = jnp.round(ub * aa[2 * t + 1][None, :] + bb[2 * t + 1][None, :])
        out_ref[(2 * t + 1) * g:(2 * t + 2) * g] = jnp.clip(
            vb, -127.0, 127.0).astype(jnp.int8)


def _requant_tiles(npairs: int, g: int, n: int):
    """Pick (pp group-pairs per block, tn lanes) for the requant grid.

    Constraints: the out block is (2*pp*g, tn) int8 and the word block
    (pp*g//4, tn) i32 — together they must stay well under the 16M scoped
    VMEM limit (a full-K block is 22M at K=14336). The a/b scale-row
    blocks are (2*pp, tn), and Mosaic requires every block's sublane dim
    be a multiple of 8 OR equal to the full array dim — so pp must be a
    multiple of 4 unless pp == npairs. Prefer the widest tn, then the
    largest legal pp."""
    for tn in (512, 256, 128):
        if n % tn:
            continue
        for pp in range(npairs, 0, -1):
            if npairs % pp or (pp != npairs and pp % 4):
                continue
            if (2 * pp * g * tn + pp * g // 2 * tn * 4) <= 4 << 20:
                return pp, tn
    raise UnsupportedShape(f"no VMEM-feasible requant tile (pairs={npairs}, "
                           f"g={g}, n={n})")


@functools.partial(jax.jit, static_argnames=("group_size",))
def _requant_impl(word, a_rows, b_rows, *, group_size):
    kw, n = word.shape
    k = 8 * kw
    g = group_size
    ngf = a_rows.shape[0]
    npairs = ngf // 2
    pp, tn = _requant_tiles(npairs, g, n)
    grid = (npairs // pp, n // tn)
    return pl.pallas_call(
        functools.partial(_requant_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pp * g // 4, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * pp, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * pp, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * pp * g, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n, bytes_accessed=kw * n * 4 + k * n, transcendentals=0),
    )(word, a_rows, b_rows)


def int4_magic8_requant_int8_pallas(word, scale, bias, s8, group_size):
    """magic8 words (K/8, N) + per-group dequant params w = u*scale + bias
    ((K/g, N) each) + per-channel int8 scale s8 (1, N) → int8 (K, N) with
    w ≈ qw8 * s8. One fused pass over the packed bytes (reads 0.5B/weight,
    writes 1B/weight) — the XLA unpack→dequant→requant chain materializes
    the f32 (K, N) dequant (measured: it capped prefill W4A8 at ~1.0x bf16
    where this kernel's output feeds a native int8 dot at ~1.6x)."""
    if word.ndim != 2:
        raise UnsupportedShape("requant kernel handles 2-D only")
    kw, n = word.shape
    g = group_size
    if n % 128 != 0 or (8 * kw // g) % 2 != 0 or g % 8 != 0:
        raise UnsupportedShape(f"magic8 requant misaligned (K={8*kw}, g={g})")
    inv = 1.0 / s8
    a_rows = (scale.astype(jnp.float32) * inv).astype(jnp.float32)
    b_rows = (bias.astype(jnp.float32) * inv).astype(jnp.float32)
    return _requant_impl(word, a_rows, b_rows, group_size=g)
