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

Measured on v5e (M=8, K=N=4096, g=128): ~21 us vs ~46 us bf16 dense
(2.2x); VPU-dequant bound at ~50% of int4-bytes HBM speed-of-light.
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
