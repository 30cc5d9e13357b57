"""Fused 16-entry-LUT dequant × bf16 matmul — NF4 / shared-codebook 4-bit.

(ref analog: the reference's NF4 `LinearNF4` and codebook linears run
dequantize-then-mm on CUDA, nf4_tensor.py:1063; on a memory-bound TPU
decode step that throws away the 4-bit bandwidth win. This kernel keeps
the packed codes in HBM and builds the bf16 codebook VALUES in-register
with a 4-level masked select tree — no gather, no int→float convert.)

Layout: the int4 "magic" word layout (qarrays/int4.py pack_int4_magic) —
plane j of word block t covers quantization group 4t+j; extracting plane
nibbles of the (g/2, tn) word slice gives TWO code halfwords per i32.

LUT construction — integer XOR select tree (~53 lane-ops per 2 weights):
    masks  m_i = halfword-expanded bit i of each nibble      (4 x 4 ops)
    leaves v_h = c_2h ^ (m_0 & (c_2h ^ c_2h+1))              (8 x 2 ops)
    tree   v   = a ^ (m_i & (a ^ b))  over bits 1..3         (7 x 3 ops)
where c_t are the bf16 bit patterns of the codebook entries duplicated
into both 16-bit halves, carried as RUNTIME i32 SMEM scalars — scalar
XORs run on SREGs, so k-means LUTs work under jit without recompiling
and without any per-element cost. One pltpu.bitcast i32→bf16 then yields
the decoded rows in natural group order, BIT-EXACT vs the bf16-rounded
codebook (no arithmetic on values, only on bit patterns).

Per-group scalers (K/g, N) multiply the f32 partial dots exactly like the
int4 magic kernel; there is no affine bias (the codebook carries sign).

Measured on v5e (K=N=4096, g=64, this structure, 2026-08): M=8 78.9us
(~27 i32 lane-ops/weight vs the int4 magic kernel's ~1.4) — ~14% SoL of
the 4-bit roofline, 6x faster than the 468us dequantize+matmul fallback
and 6.8x faster than the bf16 FMA-select-tree variant it replaces
(536us — Mosaic does NOT keep bf16 arithmetic packed 2-per-lane on v5e;
see git history). It is SLOWER than bf16 dense (45.8us at M=8, 89.5us at
M=512 vs 238us here): a generic 16-entry runtime LUT costs ~15 sub-lane
selects per weight and the VPU has no sub-word SIMD, so NF4/codebook
containers trade decode speed for the 4x memory saving — this kernel is
the fastest NF4 execution path at every M, but pick Int4WeightOnly when
decode latency (not checkpoint memory) is the constraint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape


def lut_words_arr(codebook: jax.Array) -> jax.Array:
    """Flat float codebook(s), 16 entries each → (1, ceil/128*128) i32 of
    the bf16 bit patterns duplicated into both 16-bit halves (SMEM scalar
    words for the in-kernel XOR select tree). Traceable (runtime
    codebooks — k-means LUTs — work under jit)."""
    cb = codebook.reshape(-1).astype(jnp.bfloat16)
    if cb.shape[0] % 16:
        raise ValueError("codebook size must be a multiple of 16")
    bits = jax.lax.bitcast_convert_type(cb, jnp.uint16).astype(jnp.uint32)
    words = jax.lax.bitcast_convert_type(bits | (bits << 16), jnp.int32)
    pad = (-words.shape[0]) % 128
    return jnp.pad(words, (0, pad)).reshape(1, -1)


def _decode_lut(ow, cwords):
    """ow: i32 (rows, tn) with one code nibble in each 16-bit half →
    bf16 (2*rows, tn) decoded values via the masked XOR select tree.
    ``cwords`` are 16 i32 SMEM scalars (bf16 bit pattern of each entry in
    both halves); scalar XORs between them fold on SREGs, and every
    vector op is a plain i32 AND/XOR/shift, sub-lane safe (no carries
    cross the halfword boundary). Decode is BIT-EXACT vs indexing the
    bf16-rounded codebook."""
    masks = []
    for i in range(4):
        bi = (ow >> i) & 0x00010001
        # halfword-expand bit i: (bi<<16) - bi maps {0,1}x{0,1} halves to
        # {0x0000,0xFFFF} each (the high half's lost carry is exactly the
        # low half's borrow — see round-2 notes)
        masks.append((bi << 16) - bi)
    # leaves over code bit 0: v_h = c_2h ^ (m0 & (c_2h ^ c_2h+1))
    vals = []
    for h in range(8):
        c0, c1 = cwords[2 * h], cwords[2 * h + 1]
        vals.append((masks[0] & (c0 ^ c1)) ^ c0)
    # tree over bits 1..3
    for level in range(1, 4):
        m = masks[level]
        vals = [a ^ (m & (a ^ b)) for a, b in zip(vals[0::2], vals[1::2])]
    return pltpu.bitcast(vals[0], jnp.bfloat16)


def _lut4_kernel(x0, x1, x2, x3, w_ref, s_ref, lut_ref, out_ref, acc_ref, *,
                 group_size: int, groups_per_lut: int, out_dtype):
    """groups_per_lut == 0: one shared 16-entry LUT. Otherwise LUT
    ``(4t+j) // groups_per_lut`` decodes group 4t+j — the SMEM offsets are
    static per python-loop iteration, so per-group tables cost only the
    scalar reloads."""
    acc_ref[:] = jnp.zeros_like(acc_ref)
    w = w_ref[:]
    tkw, _ = w.shape
    g = group_size
    nt = 8 * tkw // (4 * g)
    xr = (x0, x1, x2, x3)
    s = s_ref[:].astype(jnp.float32)
    shared = [lut_ref[0, t] for t in range(16)] if groups_per_lut == 0 else None
    for j in range(4):
        shifted = w if j == 0 else (w >> (4 * j))
        for t in range(nt):
            gi = 4 * t + j
            if shared is not None:
                cvals = shared
            else:
                base = (gi // groups_per_lut) * 16
                cvals = [lut_ref[0, base + i] for i in range(16)]
            wr0, wr1 = t * g // 2, (t + 1) * g // 2
            ow = shifted[wr0:wr1] & 0x000F000F
            c = _decode_lut(ow, cvals)  # bf16 (g, tn), natural order, exact
            r0 = t * g
            pg = jnp.dot(xr[j][:, r0:r0 + g], c,
                         preferred_element_type=jnp.float32)
            acc_ref[:] += s[gi][None, :] * pg
    out_ref[:] = acc_ref[:].astype(out_dtype)


def _tile_m(m):
    """Pad tiny M up to a full 8-sublane tile (same v5e Mosaic behavior as
    fp4_matmul._tile_m: M=1 measured 89.5us vs 80.4us at M=8). Large
    (prefill) M uses 128-row tiles: the 4 full-K x blocks are the dominant
    VMEM term and halving them keeps the kernel inside the scoped budget
    alongside an XLA-pinned output (see _pick_tn)."""
    if m < 8:
        return 8
    if m <= 512:
        return m if m <= 256 else 256
    return 128


def _pick_tn(m, k, n, group_size):
    tm = _tile_m(m)
    mp = m + (-m) % tm
    ngf = k // group_size

    def vmem_bytes(tn):
        return (
            4 * tm * (k // 4) * 2
            + 2 * (k // 8) * tn * 4
            + 2 * ngf * tn * 4
            + tm * tn * 6
        )

    # XLA may place the whole (mp, n) kernel OUTPUT in scoped vmem when it
    # fits (observed at M=1024 N=4096: "scoped allocation 17.04M > 16M"
    # killed the nf4 prefill compile) — reserve for it
    budget = int(15.5 * 1024 * 1024) - min(mp * n * 2, 8 * 1024 * 1024)
    for tn in (1024, 512, 256, 128):
        if n % tn == 0 and vmem_bytes(tn) <= budget:
            return tn
    raise UnsupportedShape(f"no VMEM-feasible N tile for m={m} k={k} n={n}")


@functools.partial(jax.jit, static_argnames=("group_size", "groups_per_lut",
                                             "out_dtype"))
def _lut4_impl(x, word, s, lutw, *, group_size, groups_per_lut, out_dtype):
    m, k = x.shape
    kw, n = word.shape
    g = group_size
    ngf = k // g
    tn = _pick_tn(m, k, n, g)

    xg = x.reshape(m, ngf // 4, 4, g)
    xs4 = [xg[:, :, j].reshape(m, k // 4) for j in range(4)]

    tm = _tile_m(m)
    pad_m = (-m) % tm
    if pad_m:
        xs4 = [jnp.pad(xj, ((0, pad_m), (0, 0))) for xj in xs4]
    mp = m + pad_m

    grid = (mp // tm, n // tn, 1)
    cost = pl.CostEstimate(
        flops=2 * mp * k * n,
        bytes_accessed=mp * k * 2 + kw * n * 4 + ngf * n * 4 + mp * n * 2,
        transcendentals=0,
    )
    out = pl.pallas_call(
        functools.partial(_lut4_kernel, group_size=g,
                          groups_per_lut=groups_per_lut, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            *[pl.BlockSpec((tm, k // 4), lambda i, j, kk: (i, 0),
                           memory_space=pltpu.VMEM) for _ in range(4)],
            pl.BlockSpec((kw, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ngf, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lutw.shape, lambda i, j, kk: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(*xs4, word, s, lutw)
    return out[:m] if pad_m else out


def lut4_wo_magic_pallas(x, word, scalers, codebook, group_size):
    """x (M, K) hp; word i32 (K/8, N) magic layout (pack_int4_magic over
    the CODE nibbles); scalers (K/g, N) f32; codebook (16,) floats shared,
    or (L, 16) per-row-block LUTs with K/L a multiple of group_size (may be
    traced arrays — k-means LUTs work under jit).
    Returns (M, N) bf16 = x @ (codebook[codes] * scalers)."""
    if x.ndim != 2 or word.ndim != 2:
        raise UnsupportedShape("kernel handles 2-D only")
    m, k = x.shape
    kw, n = word.shape
    g = group_size
    if k != kw * 8 or k % g or (k // g) % 4:
        raise UnsupportedShape(
            f"K={k} incompatible with magic layout (g={g})")
    if n % 128 or k % 128:
        raise UnsupportedShape(f"K={k}/N={n} not lane-aligned")
    codebook = jnp.asarray(codebook)
    if codebook.ndim == 2:
        n_luts = codebook.shape[0]
        rows_per_lut = k // n_luts
        if k % n_luts or rows_per_lut % g:
            raise UnsupportedShape(
                f"{n_luts} LUTs over K={k} don't align with group {g}")
        groups_per_lut = rows_per_lut // g
    else:
        groups_per_lut = 0
    lutw = lut_words_arr(codebook)
    return _lut4_impl(
        x.astype(jnp.bfloat16), word, scalers.astype(jnp.float32), lutw,
        group_size=g, groups_per_lut=groups_per_lut, out_dtype=jnp.bfloat16,
    )
