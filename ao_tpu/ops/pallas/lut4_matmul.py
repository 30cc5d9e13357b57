"""Fused 16-entry-LUT dequant × bf16 matmul — NF4 / shared-codebook 4-bit.

(ref analog: the reference's NF4 `LinearNF4` and codebook linears run
dequantize-then-mm on CUDA, nf4_tensor.py:1063; on a memory-bound TPU
decode step that throws away the 4-bit bandwidth win. This kernel keeps
the packed codes in HBM and builds the bf16 codebook VALUES in-register
with a 4-level masked select tree — no gather, no int→float convert.)

Layout: the int4 "magic" word layout (qarrays/int4.py pack_int4_magic) —
plane j of word block t covers quantization group 4t+j; extracting plane
nibbles of the (g/2, tn) word slice gives TWO code halfwords per i32.

LUT construction (per plane slice, ~36 lane-ops per 2 weights):
    masks  m_i = bf16 {0,1} pairs: (bit_i-pair * 0x3F80) bitcast (4 x 3 ops)
    leaves v_h = c_2h + m_0 * (c_2h+1 - c_2h)  scalar c/d     (8 x 1 FMA)
    tree   v   = a + m_i * (b - a)  over bits 1..3            (7 x 2 ops)
with the codebook values as 16 f32 SMEM scalars (bf16 grid points), so
RUNTIME codebooks (k-means LUTs) work without recompilation. Every
select is a PACKED bf16 op (v5e runs bf16 elementwise 2-per-lane); each
non-leaf select adds one bf16 rounding of a value difference (~2^-9
relative), far below the 4-bit quantization error. (The earlier integer
XOR select tree — exact but ~51 lane-ops/2w since every op is a 1-per-
lane i32 op — measured 78.9us at M=8 4096²; see git history.)

Per-group scalers (K/g, N) multiply the f32 partial dots exactly like the
int4 magic kernel; there is no affine bias (the codebook carries sign).

The VPU cost (~18 lane-ops/weight vs int4's ~1.4) makes this slower than
the int4 kernel but far faster than the dequantize+matmul fallback
(which streams the full bf16 weight through HBM); measure with
benchmarks/gemm_sol.py on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape


def lut_words_arr(codebook: jax.Array) -> jax.Array:
    """Flat float codebook(s), 16 entries each → (1, ceil/128*128) f32 of
    the bf16-ROUNDED values (exact bf16 grid points, carried as f32 SMEM
    scalars). Traceable (runtime codebooks — k-means LUTs — work under
    jit)."""
    cb = codebook.reshape(-1).astype(jnp.bfloat16).astype(jnp.float32)
    if cb.shape[0] % 16:
        raise ValueError("codebook size must be a multiple of 16")
    pad = (-cb.shape[0]) % 128
    return jnp.pad(cb, (0, pad)).reshape(1, -1)


def _decode_lut(ow, cvals):
    """ow: i32 (rows, tn) with one code nibble in each 16-bit half →
    bf16 (2*rows, tn) decoded values via an FMA select tree. ``cvals`` are
    16 f32 SMEM scalars (bf16 grid points).

    The masks become bf16 {0,1} PAIRS via one integer multiply
    (bi * 0x3F803F80 keeps the halves carry-free) + bitcast, and every
    select is a packed bf16 FMA ``a + m*(b-a)`` — v5e executes bf16
    elementwise ops 2-per-lane, so the float tree costs ~36 lane-ops per
    2 weights vs ~51 for the integer XOR tree (measured 78.9us → see
    module docstring). The scalar leaf constants c/d fold in SREGs. Each
    non-leaf select adds one bf16 rounding of a VALUE DIFFERENCE (~2^-9
    relative) — far below the 4-bit quantization error."""
    mf = []
    for i in range(4):
        bi = (ow >> i) & 0x00010001
        # (b_hi*2^16 + b_lo) * 0x3F80 = b_hi*0x3F80*2^16 + b_lo*0x3F80 —
        # carry-free since 0x3F80 < 2^16 and the halves' products don't
        # overlap (multiplying by the DOUBLED constant 0x3F803F80 would
        # cross-carry when both bits are set)
        mf.append(pltpu.bitcast(bi * 0x3F80, jnp.bfloat16))
    # leaves over code bit 0: v_h = c_2h + m0 * (c_2h+1 - c_2h), scalar c/d
    vals = []
    for h in range(8):
        c0 = cvals[2 * h].astype(jnp.bfloat16)
        d = (cvals[2 * h + 1] - cvals[2 * h]).astype(jnp.bfloat16)
        vals.append(c0 + mf[0] * d)
    # tree over bits 1..3
    for level in range(1, 4):
        m = mf[level]
        vals = [a + m * (b - a) for a, b in zip(vals[0::2], vals[1::2])]
    return vals[0]


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
            c = _decode_lut(ow, cvals)  # bf16 (g, tn), natural order
            r0 = t * g
            pg = jnp.dot(xr[j][:, r0:r0 + g], c,
                         preferred_element_type=jnp.float32)
            acc_ref[:] += s[gi][None, :] * pg
    out_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_tn(m, k, n, group_size):
    tm = m if m <= 256 else 256
    ngf = k // group_size

    def vmem_bytes(tn):
        return (
            4 * tm * (k // 4) * 2
            + 2 * (k // 8) * tn * 4
            + 2 * ngf * tn * 4
            + tm * tn * 6
        )

    budget = int(15.5 * 1024 * 1024)
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

    tm = m if m <= 256 else 256
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
