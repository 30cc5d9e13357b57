"""Decode attention over a (possibly quantized) KV cache — Pallas TPU.

(ref analog: the fp8-KV-cache attention the reference gets from FA3/vLLM
(prototype/attention/, quantized_sdpa.cpp). TPU re-design: flash-decoding
structure — grid (batch, kv_heads, kv_blocks); each step dequantizes one
int8/fp8 KV block IN the kernel (per-vector scales ride along, so HBM reads
stay 8-bit) and folds it into an online-softmax accumulator for the G = H/Hkv
query heads of the group. The cache is indexed in its NATIVE (B, T, Hkv, D)
layout — the head axis folds into lanes, so no O(cache) transpose happens on
the hot path. Single-query (S=1) decode; prefill uses flash_attention.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
            m_ref, l_ref, acc_ref, *, block_t: int, n_tb: int,
            sm_scale: float, mode: str, hkv: int):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ti = pl.program_id(2)

    @pl.when(ti == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # (G, D) bf16

    if mode == "int4":
        # nibble-packed token axis: k_ref is (Tb/8, D) int32 words; plane j
        # of the magic bitcast yields tokens ≡ j (mod 4) as bf16 (u-8)
        # values (3 int ops per TWO tokens, no int→float converts). The
        # planes stack along SUBLANES into a (Tb, D) K block whose token
        # order is PLANE-MAJOR: row i' = j*(Tb/4)+m holds token 4m+j — one
        # full-lane dot, no narrow slices anywhere. The wrapper permutes
        # the scale rows to match; the length mask recovers logical
        # positions from i' arithmetically.
        from ao_tpu.ops.pallas import int4_words_to_bf16

        qcap = block_t // 4
        k = int4_words_to_bf16(k_ref[0])  # (Tb, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = s * ks_ref[0]  # permuted per-vector k scales
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        pos = 4 * (col % qcap) + col // qcap + ti * block_t
    else:
        k = k_ref[0]  # (Tb, D) — head slice via index_map
        if mode == "vec8":
            # int8 → bf16 for the dot; the per-VECTOR scales commute out of
            # the d-contraction, so they land on the score columns (k) and
            # fold into p (v) — no O(Tb·D) dequant multiplies at all
            k = k.astype(jnp.bfloat16)  # mosaic lowers i8→bf16 directly

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # (G, Tb)
        if mode == "vec8":
            s = s * ks_ref[0]  # (1, Tb) per-vector k scales
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ti * block_t

    s = jnp.where(pos < len_ref[bi, 0], s, _NEG)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)

    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    pv = (p * vs_ref[0] if mode != "fp" else p).astype(jnp.bfloat16)
    if mode == "int4":
        # same plane-major sublane stack as K: pv's columns already follow
        # that token order, so one full (G,Tb)x(Tb,D) dot finishes the block
        from ao_tpu.ops.pallas import int4_words_to_bf16

        v = int4_words_to_bf16(v_ref[0])  # (Tb, D)
    else:
        v = v_ref[0]
        if mode == "vec8":
            v = v.astype(jnp.bfloat16)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ti == n_tb - 1)
    def _():
        o_ref[0, 0] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "mode", "block_t"))
def _impl(q, kflat, ks, vflat, vs, lengths, *, sm_scale, mode, block_t):
    b, hkv, g, d = q.shape
    rows_per_blk = block_t // 8 if mode == "int4" else block_t
    t = kflat.shape[1] * (8 if mode == "int4" else 1)
    n_tb = t // block_t

    grid = (b, hkv, n_tb)
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_t=block_t, n_tb=n_tb, sm_scale=sm_scale,
            mode=mode, hkv=hkv,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
            pl.BlockSpec((1, 1, g, d), lambda bi, hi, ti: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            # cache in native layout: (B, T, Hkv*D); the head axis folds
            # into lanes and index_map picks the head's D-slice — no
            # transpose of the cache ever materializes (int4: T/8 int32
            # word rows per block)
            pl.BlockSpec((1, rows_per_blk, d), lambda bi, hi, ti: (bi, ti, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t),
                         lambda bi, hi, ti, hkv=hkv: (bi * hkv + hi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_blk, d), lambda bi, hi, ti: (bi, ti, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t),
                         lambda bi, hi, ti, hkv=hkv: (bi * hkv + hi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda bi, hi, ti: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * g * t * d,
            bytes_accessed=(
                2 * b * t * hkv * ((d // 2 if mode == "int4" else d) + 4)
                + b * hkv * g * d * 8),
            transcendentals=b * hkv * g * t,
        ),
    )(lengths, q, kflat, ks, vflat, vs)
    return out


def decode_attention(q, k_cache, v_cache, lengths, *, k_scale=None,
                     v_scale=None, sm_scale=None, block_t: int = 512):
    """Single-step decode attention over a cache.

    q (B, H, D); k_cache/v_cache (B, T, Hkv, D) bf16 OR int8/fp8, OR the
    int4 word-packed form (B, T/8, Hkv, D) int32 (QuantKVCache "int4") —
    quantized caches come with k_scale/v_scale (B, T, Hkv, 1); lengths (B,)
    int32 valid positions. Returns (B, H, D) f32.
    """
    b, h, d = q.shape
    int4 = k_cache.dtype == jnp.int32
    t, hkv = k_cache.shape[1] * (8 if int4 else 1), k_cache.shape[2]
    g = h // hkv
    if int4:
        mode = "int4"
        if k_scale is None:
            raise UnsupportedShape("int4 cache needs scales")
        # words-per-block must satisfy the %8 sublane rule → block_t % 64
        block_t = min(block_t - block_t % 64 or 64, t)
        if t % block_t or block_t % 64:
            raise UnsupportedShape(f"int4 cache T={t} vs block_t={block_t}")
    else:
        mode = "vec8" if k_scale is not None else "fp"
        block_t = min(block_t, t)
    if d % 128 or t % block_t:
        raise UnsupportedShape(f"D={d} or T={t} misaligned")
    if g * hkv != h or g < 1:
        raise UnsupportedShape(f"H={h} not a multiple of Hkv={hkv}")
    sm_scale = sm_scale if sm_scale is not None else d ** -0.5

    gp = max(8, g)  # f32 sublane minimum
    qg = q.astype(jnp.bfloat16).reshape(b, hkv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))

    kflat = k_cache.reshape(b, k_cache.shape[1], hkv * d)  # native layout
    vflat = v_cache.reshape(b, v_cache.shape[1], hkv * d)
    if mode != "fp":
        # (B, T, Hkv) → (B·Hkv, 1, T): tiny transpose, gives the kernel a
        # directly-broadcastable (1, Tb) score-scale row per head
        ks = k_scale.reshape(b, t, hkv).transpose(0, 2, 1).reshape(
            b * hkv, 1, t).astype(jnp.float32)
        vs = v_scale.reshape(b, t, hkv).transpose(0, 2, 1).reshape(
            b * hkv, 1, t).astype(jnp.float32)
        if int4:
            # the kernel's plane extraction assembles each Tb block's score
            # columns PLANE-MAJOR (column j*(Tb/4)+m ↦ token 4m+j); permute
            # the scale rows once per call to match — O(B·Hkv·T) gather,
            # negligible next to the cache read itself
            from ao_tpu.ops.pallas import plane_major_perm

            perm = plane_major_perm(block_t)
            ks = ks.reshape(b * hkv, 1, t // block_t, block_t)[
                ..., perm].reshape(b * hkv, 1, t)
            vs = vs.reshape(b * hkv, 1, t // block_t, block_t)[
                ..., perm].reshape(b * hkv, 1, t)
    else:
        ks = jnp.ones((b * hkv, 1, t), jnp.float32)
        vs = jnp.ones((b * hkv, 1, t), jnp.float32)
    lengths = lengths.reshape(b, 1).astype(jnp.int32)

    out = _impl(qg, kflat, ks, vflat, vs, lengths, sm_scale=float(sm_scale),
                mode=mode, block_t=block_t)
    return out[:, :, :g].reshape(b, h, d)
