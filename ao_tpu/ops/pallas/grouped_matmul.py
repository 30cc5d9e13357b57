"""Fused int4 grouped (ragged) GEMMs over magic-packed expert stacks.

MoE decode is HBM-bound on the EXPERT WEIGHTS: with T tokens spread over E
experts, the ragged matmul reads every active expert's (K, N) weight once
while the MXU does only T*K*N MACs. The XLA path (`jax.lax.ragged_dot`,
moe/grouped.py) has no int4 input mode, so quantized expert stacks had to
dequantize to bf16 first — materializing (and reading) 4x the bytes and
forfeiting the entire 4-bit bandwidth win exactly where it matters most.

(ref analog: torchao's grouped-mm overrides keep weights in fp8 via
torch._scaled_grouped_mm — moe_training/tensor.py:52-130; for int4 the
reference has no grouped kernel at all. TPU-native design instead of a
megablocks-style gather kernel:)

Masked dense-per-expert accumulation. At decode token counts the MXU is
idle — FLOPs are free, bandwidth is not — so each expert's weight tile is
decoded once (magic nibble→bf16 bit-surgery, identical to
ops/pallas/int4_matmul.py) and dotted against the FULL (T, K) activation
block; a per-token expert mask (computed in-kernel from a prefetched
token→expert id row against `program_id`) selects which output rows the
expert contributes to:

    out[t] = sum_e  1[e(t) == e] * (x[t] @ deq(W_e))

The grid is (M tiles, N tiles, E) with E innermost ("arbitrary"), so the
f32 accumulator tile lives in VMEM scratch across experts and every packed
word streams from HBM exactly once. Token-sorting, group offsets, and
gather/scatter all disappear — the mask does the ragged bookkeeping at a
cost of E*T*K*N MACs, which stays under the weight-stream DMA time for
T <= ~256 on v5e (191 TFLOP/s bf16 vs ~0.5 B/weight at ~700 GB/s:
2*E*T*K*N/191e12 < E*K*N/2/700e9  =>  T < ~680; the dispatch gate is
conservative and the large-T path falls back to dequant+ragged_dot, which
is compute-bound there anyway).

Empty experts cost their weight read but contribute nothing (mask is all
zero) — correct for any group_sizes, including degenerate routing.

Two kernels, mirroring the 2-D pair:
  * weight-only "magic" layout — bf16 MXU dots, per-group post-dot f32
    scaling, in-kernel lane-reduced affine bias.
  * W4A8 "magic8" layout — int8 activations on the int8 MXU (2x peak),
    exact i8×i8→i32 dots, per-token activation scales applied outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape
from ao_tpu.ops.pallas.int4_matmul import _pick_tn_magic
from ao_tpu.quantization import primitives as P


def _expert_mask(ids_ref, e):
    """(tm, 1) f32 mask of tokens owned by expert ``e``.

    ids travel as an f32 (Tpad, 128) lane-broadcast array (pad rows = -1):
    a full-lane compare followed by a lane-max reduction is the proven
    v5e-safe way to get a (tm, 1) row vector (sub-128-lane input blocks are
    a Mosaic post-run pathology; see int4_matmul.py's xsum notes).
    """
    ef = e.astype(jnp.float32)
    hit = jnp.where(ids_ref[:] == ef, 1.0, 0.0)
    return jnp.max(hit, axis=1, keepdims=True)


def _grouped_magic_kernel(ids_ref, x0, x1, x2, x3, w_ref, s_ref, b_ref,
                          out_ref, acc_ref, eacc_ref, *,
                          n_e: int, group_size: int, out_dtype):
    e = pl.program_id(2)

    @pl.when(e == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
    tkw, _ = w.shape
    g = group_size
    nt = 8 * tkw // (4 * g)
    xr = (x0, x1, x2, x3)
    s = s_ref[:].astype(jnp.float32)
    # rows decode UNSHIFTED to 128+u; -136 recenter folded into the bias
    # row in f32 (see int4_matmul._magic_kernel)
    b = b_ref[:].astype(jnp.float32) - 136.0 * s
    eacc_ref[:] = jnp.zeros_like(eacc_ref)
    # identical bit-surgery to int4_matmul._magic_kernel: plane j of a word
    # block holds groups {g' ≡ j mod 4}; rows decode to bf16 128+u
    for j in range(4):
        shifted = w if j == 0 else (w >> (4 * j))
        for t in range(nt):
            wr0, wr1 = t * g // 2, (t + 1) * g // 2
            ow = (shifted[wr0:wr1] & 0x000F000F) | 0x43004300
            c = pltpu.bitcast(ow, jnp.bfloat16)
            r0 = t * g
            pg = jnp.dot(xr[j][:, r0:r0 + g], c,
                         preferred_element_type=jnp.float32)
            eacc_ref[:] += s[4 * t + j][None, :] * pg
            xs = jnp.sum(xr[j][:, r0:r0 + g].astype(jnp.float32), axis=1,
                         keepdims=True)
            eacc_ref[:] += xs * b[4 * t + j][None, :]
    acc_ref[:] += _expert_mask(ids_ref, e) * eacc_ref[:]

    @pl.when(e == n_e - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_tn_grouped(m, k, n, group_size):
    # per-program VMEM footprint matches the 2-D magic kernel (one expert's
    # word/scale blocks at a time) plus the second (tm, tn) f32 scratch and
    # the (tm, 128) id block
    tn = _pick_tn_magic(m, k, n, group_size)
    return tn


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def _int4_grouped_magic_impl(x, ids128, word3, s3, b3, *, group_size,
                             out_dtype):
    m, k = x.shape
    n_e, kw, n = word3.shape
    g = group_size
    ngf = k // g
    tn = _pick_tn_grouped(m, k, n, g)

    xg = x.reshape(m, ngf // 4, 4, g)
    xs4 = [xg[:, :, j].reshape(m, k // 4) for j in range(4)]

    tm = m if m <= 256 else 256
    pad_m = (-m) % tm
    if pad_m:
        xs4 = [jnp.pad(xj, ((0, pad_m), (0, 0))) for xj in xs4]
        ids128 = jnp.pad(ids128, ((0, pad_m), (0, 0)),
                         constant_values=-1.0)
    mp = m + pad_m

    grid = (mp // tm, n // tn, n_e)
    kq = k // 4
    cost = pl.CostEstimate(
        flops=2 * n_e * mp * k * n,
        bytes_accessed=(mp * k * 2 + n_e * kw * n * 4
                        + 2 * n_e * ngf * n * 2 + mp * n * 2),
        transcendentals=0,
    )
    out = pl.pallas_call(
        functools.partial(_grouped_magic_kernel, n_e=n_e, group_size=g,
                          out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, 128), lambda i, j, e: (i, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((tm, kq), lambda i, j, e: (i, 0),
                           memory_space=pltpu.VMEM) for _ in range(4)],
            pl.BlockSpec((None, kw, tn), lambda i, j, e: (e, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ngf, tn), lambda i, j, e: (e, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ngf, tn), lambda i, j, e: (e, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, e: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32),
                        pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(ids128, *xs4, word3, s3, b3)
    return out[:m] if pad_m else out


def _ids_to_lanes(ids: jax.Array) -> jax.Array:
    """(T,) int32 token→expert ids → (T, 128) f32 lane-broadcast array."""
    return jnp.broadcast_to(
        ids.astype(jnp.float32)[:, None], (ids.shape[0], 128)
    )


def int4_grouped_magic_pallas(x, word3, scale3, zp3, ids, group_size,
                              zp_domain):
    """x (T, K) hp; word3 int32 (E, K/8, N) magic layout; scale3/zp3
    (E, K/g, N); ids (T,) int32 expert owning each token. Returns (T, N)
    bf16 = x[t] @ deq(W[ids[t]])."""
    if x.ndim != 2 or word3.ndim != 3:
        raise UnsupportedShape("grouped kernel needs (T, K) x (E, K/8, N)")
    m, k = x.shape
    n_e, kw, n = word3.shape
    g = group_size
    if k != 8 * kw:
        raise UnsupportedShape(f"K mismatch {k} vs packed {kw}*8")
    if n % 128 != 0 or (k // g) % 4 != 0 or (g // 2) % 8 != 0:
        raise UnsupportedShape(
            f"N={n} or K={k} misaligned for magic layout (g={g})"
        )

    s = scale3.astype(jnp.float32)
    if zp_domain is P.ZeroPointDomain.FLOAT:
        b = zp3.astype(jnp.float32)
    elif zp3 is None:
        b = -8.0 * s
    else:
        b = -(8.0 + zp3.astype(jnp.float32)) * s
    b2 = b + 8.0 * s  # kernel rows decode to q = u - 8

    return _int4_grouped_magic_impl(
        x.astype(jnp.bfloat16), _ids_to_lanes(ids), word3,
        s.reshape(n_e, k // g, n).astype(jnp.bfloat16),
        b2.reshape(n_e, k // g, n).astype(jnp.bfloat16),
        group_size=g, out_dtype=jnp.bfloat16,
    )


# ---------------------------------------------------------------------------
# W4A8 grouped: int8 token activations x magic8 expert stacks
# ---------------------------------------------------------------------------


def _grouped_w4a8_kernel(ids_ref, xa, xb, w_ref, s_ref, b_ref,
                         out_ref, acc_ref, eacc_ref, *,
                         n_e: int, group_size: int, out_dtype):
    e = pl.program_id(2)

    @pl.when(e == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
    tkw, _ = w.shape
    g = group_size
    nt = 8 * tkw // (2 * g)
    s = s_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    eacc_ref[:] = jnp.zeros_like(eacc_ref)
    # whole-plane extraction up front (per-slice bitcasts wedge the v5e —
    # see int4_matmul._w4a8_kernel)
    a8 = pltpu.bitcast(w & 0x0F0F0F0F, jnp.int8)
    b8 = pltpu.bitcast((w >> 4) & 0x0F0F0F0F, jnp.int8)
    for t in range(nt):
        r0 = t * g
        pa = jnp.dot(xa[:, r0:r0 + g], a8[r0:r0 + g],
                     preferred_element_type=jnp.int32)
        eacc_ref[:] += s[2 * t][None, :] * pa.astype(jnp.float32)
        xsa = jnp.sum(xa[:, r0:r0 + g].astype(jnp.float32), axis=1,
                      keepdims=True)
        eacc_ref[:] += xsa * b[2 * t][None, :]
        pb = jnp.dot(xb[:, r0:r0 + g], b8[r0:r0 + g],
                     preferred_element_type=jnp.int32)
        eacc_ref[:] += s[2 * t + 1][None, :] * pb.astype(jnp.float32)
        xsb = jnp.sum(xb[:, r0:r0 + g].astype(jnp.float32), axis=1,
                      keepdims=True)
        eacc_ref[:] += xsb * b[2 * t + 1][None, :]
    acc_ref[:] += _expert_mask(ids_ref, e) * eacc_ref[:]

    @pl.when(e == n_e - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def _int4_grouped_w4a8_impl(xq, ids128, word3, s3, b3, *, group_size,
                            out_dtype):
    m, k = xq.shape
    n_e, kw, n = word3.shape
    g = group_size
    ngf = k // g
    tn = _pick_tn_grouped(m, k, n, g)

    pair = xq.reshape(m, ngf // 2, 2, g)
    xa = pair[:, :, 0].reshape(m, k // 2)
    xb = pair[:, :, 1].reshape(m, k // 2)

    tm = m if m <= 256 else 256
    pad_m = (-m) % tm
    if pad_m:
        xa = jnp.pad(xa, ((0, pad_m), (0, 0)))
        xb = jnp.pad(xb, ((0, pad_m), (0, 0)))
        ids128 = jnp.pad(ids128, ((0, pad_m), (0, 0)),
                         constant_values=-1.0)
    mp = m + pad_m

    grid = (mp // tm, n // tn, n_e)
    cost = pl.CostEstimate(
        flops=2 * n_e * mp * k * n,
        bytes_accessed=(mp * k + n_e * kw * n * 4
                        + 2 * n_e * ngf * n * 2 + mp * n * 4),
        transcendentals=0,
    )
    out = pl.pallas_call(
        functools.partial(_grouped_w4a8_kernel, n_e=n_e, group_size=g,
                          out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, 128), lambda i, j, e: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k // 2), lambda i, j, e: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k // 2), lambda i, j, e: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, kw, tn), lambda i, j, e: (e, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ngf, tn), lambda i, j, e: (e, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, ngf, tn), lambda i, j, e: (e, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, e: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32),
                        pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(ids128, xa, xb, word3, s3, b3)
    return out[:m] if pad_m else out


def int4_grouped_w4a8_pallas(xq, sx, word3, scale3, zp3, ids, group_size,
                             zp_domain):
    """xq (T, K) int8 (symmetric per-token, scale sx (T,) or (T, 1) f32);
    word3 int32 (E, K/8, N) magic8 layout; ids (T,) int32. Returns f32
    (T, N) already scaled by sx."""
    if xq.ndim != 2 or word3.ndim != 3:
        raise UnsupportedShape("grouped kernel needs (T, K) x (E, K/8, N)")
    m, k = xq.shape
    n_e, kw, n = word3.shape
    g = group_size
    if k != 8 * kw:
        raise UnsupportedShape(f"K mismatch {k} vs packed {kw}*8")
    if n % 128 != 0 or (k // g) % 2 != 0 or g % 8 != 0:
        raise UnsupportedShape(
            f"N={n} or K={k} misaligned for magic8 layout (g={g})"
        )
    s = scale3.astype(jnp.float32)
    if zp_domain is P.ZeroPointDomain.FLOAT:
        b = zp3.astype(jnp.float32)
    elif zp3 is None:
        b = -8.0 * s
    else:
        b = -(8.0 + zp3.astype(jnp.float32)) * s
    y = _int4_grouped_w4a8_impl(
        xq, _ids_to_lanes(ids), word3,
        s.reshape(n_e, k // g, n).astype(jnp.bfloat16),
        b.reshape(n_e, k // g, n).astype(jnp.bfloat16),
        group_size=g, out_dtype=jnp.float32,
    )
    return y * sx.reshape(-1, 1).astype(jnp.float32)
