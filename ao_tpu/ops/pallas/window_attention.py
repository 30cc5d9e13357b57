"""Fused bias attention for square-grid (ViTDet/SAM) encoders — Pallas TPU.

(ref analog: segment-anything-fast's scaled_dot_product_attention with a
materialized rel-pos attn_mask — torchao README.md:47 SAM row. TPU
re-design: the decomposed ViTDet rel-pos term never touches HBM at all.)

One grid step per window (heads looped in-kernel), or per (window, head)
when a side's per-step VMEM would not fit (global layers). Per head the
whole (T, T) score tile lives in VMEM:

    s   = q·k^T · scale + bh @ Eh + bw @ Ew      (bias via MXU expansion)
    out = softmax(s | cols < T_valid) · v

where bh/bw (T, side) are the q-dependent decomposed rel-pos terms
(computed outside by the small einsums — they are ~1% of the bias's
broadcast form) and Eh/Ew are static 0/1 expansion matrices
(Eh[j, k] = [k // side == j], Ew[j, k] = [k % side == j]).

The XLA formulation materializes the (B, nh, T, T) f32 bias and score
tensors in HBM several times per layer — measured 1088us per SAM-B/512
windowed layer (after the expansion-matrix restructure; 4265us before it)
vs 312us for the bias-free attention. This kernel streams only q/k/v,
the (T, side) decomposed terms, and the output. Query rows pad to a
sublane multiple (196 -> 200), NOT to the 128-lane multiple the score
COLUMNS need — the softmax passes are the VPU floor and 256-row padding
would inflate them 1.3x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _head_block(q, kt, v, bh, bw, eh, ew, mask, scale, out_dtype):
    """One head's fused attention: q (Tr, hd), kt (hd, Tc), v (Tc, hd),
    bh/bw (Tr, side), eh/ew (side, Tc), mask (Tr, Tc)."""
    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + jax.lax.dot_general(
        bh, eh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(
        bw, ew, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = jnp.where(mask, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # fold the softmax normalizer into the (Tr, hd) output instead of the
    # (Tr, Tc) probabilities — one fewer full-score-tile VPU pass
    return (o / jnp.maximum(l, 1e-30)).astype(out_dtype)


def _kernel_heads(q_ref, kt_ref, v_ref, bh_ref, bw_ref, eh_ref, ew_ref,
                  o_ref, *, n_heads: int, t_valid: int, scale: float):
    tr, tc = q_ref.shape[2], kt_ref.shape[3]
    mask = jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1) < t_valid
    for hi in range(n_heads):
        o_ref[0, hi] = _head_block(
            q_ref[0, hi], kt_ref[0, hi], v_ref[0, hi], bh_ref[0, hi],
            bw_ref[0, hi], eh_ref[:], ew_ref[:], mask, scale, o_ref.dtype)


def _kernel_single(q_ref, kt_ref, v_ref, bh_ref, bw_ref, eh_ref, ew_ref,
                   o_ref, *, t_valid: int, scale: float):
    tr, tc = q_ref.shape[1], kt_ref.shape[2]
    mask = jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1) < t_valid
    o_ref[0] = _head_block(
        q_ref[0], kt_ref[0], v_ref[0], bh_ref[0], bw_ref[0], eh_ref[:],
        ew_ref[:], mask, scale, o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("t_valid", "scale", "per_head"))
def _impl(q, kt, v, bh, bw, eh, ew, *, t_valid, scale, per_head):
    g, nh, tr, hd = q.shape
    tc = kt.shape[3]
    side = bh.shape[3]
    if per_head:
        def flat(x):
            return x.reshape(g * nh, *x.shape[2:])

        out = pl.pallas_call(
            functools.partial(_kernel_single, t_valid=t_valid, scale=scale),
            grid=(g * nh,),
            in_specs=[
                pl.BlockSpec((1, tr, hd), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd, tc), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tc, hd), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr, side), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr, side), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((side, tc), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((side, tc), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tr, hd), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g * nh, tr, hd), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            cost_estimate=pl.CostEstimate(
                flops=4 * g * nh * tr * tc * hd,
                bytes_accessed=g * nh * tr * (4 * hd * 2 + 2 * side * 2),
                transcendentals=g * nh * tr * tc),
        )(flat(q), flat(kt), flat(v), flat(bh), flat(bw), eh, ew)
        return out.reshape(g, nh, tr, hd)

    return pl.pallas_call(
        functools.partial(_kernel_heads, n_heads=nh, t_valid=t_valid,
                          scale=scale),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, nh, tr, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, hd, tc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, tc, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, tr, side), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, tr, side), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((side, tc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((side, tc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nh, tr, hd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, nh, tr, hd), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * nh * tr * tc * hd,
            bytes_accessed=g * nh * tr * (4 * hd * 2 + 2 * side * 2),
            transcendentals=g * nh * tr * tc),
    )(q, kt, v, bh, bw, eh, ew)


def window_bias_attention(q, k, v, rel_h, rel_w, *, side: int,
                          scale: float):
    """q/k/v (G, T, nh, hd) bf16 with T == side*side; rel_h/rel_w
    (G, nh, T, side) decomposed rel-pos terms. Returns (G, T, nh*hd)
    bf16 == softmax(q·k^T·scale + rel bias)·v."""
    g, t, nh, hd = q.shape
    if t != side * side:
        raise UnsupportedShape(f"T={t} != side^2={side * side}")
    if hd % 8 or side > 128:
        raise UnsupportedShape(f"hd={hd}/side={side} unsupported")
    tr = -(-t // 8) * 8        # query rows: sublane multiple
    tc = -(-t // 128) * 128    # key columns: lane multiple
    pad_r, pad_c = tr - t, tc - t

    def prep(x, pad):
        x = x.transpose(0, 2, 1, 3)  # (G, nh, T, hd)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x.astype(jnp.bfloat16)

    qp, vp = prep(q, pad_r), prep(v, pad_c)
    kp = prep(k, pad_c).transpose(0, 1, 3, 2)  # (G, nh, hd, Tc)
    if pad_r:
        rel_h = jnp.pad(rel_h, ((0, 0), (0, 0), (0, pad_r), (0, 0)))
        rel_w = jnp.pad(rel_w, ((0, 0), (0, 0), (0, pad_r), (0, 0)))
    cols = jnp.arange(tc)
    eh = (cols[None, :] // side == jnp.arange(side)[:, None]
          ) & (cols[None, :] < t)
    ew = (cols[None, :] % side == jnp.arange(side)[:, None]
          ) & (cols[None, :] < t)

    # per-step VMEM with all heads resident; fall back to one head per
    # grid step (more steps, tiny blocks) when a big side would not fit.
    # Count inputs TWICE (Mosaic double-buffers every block) plus three
    # (tr, tc) f32 score/prob temps — the first estimator counted blocks
    # once and s once and compiled into a 17.5M scoped-vmem OOM at
    # side=32 nh=4
    blocks_in = (nh * (tr + 2 * tc) * hd * 2
                 + 2 * nh * tr * side * 2 + 2 * side * tc * 2)
    est = 2 * blocks_in + nh * tr * hd * 2 + 3 * tr * tc * 4
    per_head = est > 12 * 1024 * 1024
    if per_head:
        # The per-head fallback still holds the full (tr, tc) score tile
        # per grid step; without this gate SAM-B/L at image 1024
        # (side=64, T=4096) passes the side<=128 check and Mosaic dies
        # with an uncatchable scoped-vmem compile error (~192MB tile).
        blocks_1h = ((tr + 2 * tc) * hd * 2 + 2 * tr * side * 2
                     + 2 * side * tc * 2)
        est_1h = 2 * blocks_1h + tr * hd * 2 + 3 * tr * tc * 4
        # 15MB, not the 12MB per_head-selection threshold: side=32
        # estimates 14.0MB yet compiles and runs on v5e (the estimate
        # over-counts vs Mosaic's allocator), while the next real SAM
        # side (48, image 768) estimates 63MB+ — clearly over the 16MB
        # hard limit either way.
        if est_1h > 15 * 1024 * 1024:
            raise UnsupportedShape(
                f"single-head VMEM estimate {est_1h} exceeds budget "
                f"(T={t}, side={side})")

    out = _impl(qp, kp, vp, rel_h.astype(jnp.bfloat16),
                rel_w.astype(jnp.bfloat16), eh.astype(jnp.bfloat16),
                ew.astype(jnp.bfloat16), t_valid=t, scale=float(scale),
                per_head=per_head)
    out = out[:, :, :t]  # (G, nh, T, hd)
    return out.transpose(0, 2, 1, 3).reshape(g, t, nh * hd)
