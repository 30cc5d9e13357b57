"""Decode attention over a (possibly quantized) KV cache — Pallas TPU.

(ref analog: the fp8-KV-cache attention the reference gets from FA3/vLLM
(prototype/attention/, quantized_sdpa.cpp). TPU re-design: flash-decoding
over grid (batch, kv_blocks); every grid step DMAs ONE contiguous
(block_t, Hkv*D) slab covering ALL kv heads — per-head D-slices of the
native (B, T, Hkv, D) layout would stream 128-byte strided chunks, which
measured ~3x off DMA roofline on v5e — and folds each head's slice into an
online-softmax accumulator for its G = H/Hkv query heads.

Layouts (chosen so every dot is MXU-native, i.e. contraction rides the
lhs LANES x rhs SUBLANES and Mosaic never inserts an in-kernel transpose):

* ``k_layout="kt"`` (int8/fp8 K caches, `serving/kvcache.py` default): K is
  stored TRANSPOSED, (B, Hkv, D, T).  s = q·K then contracts q's lanes (D)
  against K's sublanes (D) directly.  For int8 caches q is quantized to
  int8 per (batch, kv-head group) on the way in, so scores are true
  i8 x i8 -> i32 MXU dots and the kernel never converts K at all; the
  q/K/V scales all commute out of the contractions and fold into score
  rows / prob columns.  Measured 3.0x over the tokens-layout kernel at
  T=4096 (457us -> 152us, 18.5% -> 55.6% of the KV-stream roofline; 62%
  at T=2048 — `benchmarks/results/r4/attn_sol.json`).
* ``k_layout="tokens"`` (bf16 caches, plain arrays): K/V stay (B,T,Hkv,D).
  The p·V dot is native; the q·K^T dot Mosaic handles by a small internal
  score transpose (measured cheaper than any explicit restructuring: the
  s^T = K·q^T form with its (Tb, G) narrow output + sublane softmax
  measured ~1.5x SLOWER end-to-end).
* int4 K/V word-pack 8 tokens per int32 along T (see kvcache.py); plane
  decode happens in-kernel via the magic i32->bf16 bitcast, scores come
  out plane-major and the wrapper permutes the scale rows to match.
  Whole-slab DMAs + the -136 bias folded into per-row dot corrections
  measure 148.6us at T=4096 (29.3% SoL) — the fastest cache mode in
  absolute us (int8 152.3, bf16 409.2) at a QUARTER of the bytes; the
  remaining gap to roofline is the ~9 irreducible i32 lane-ops per
  8-nibble word of VPU field extraction (ablation: per-head strided DMAs
  313.7us -> whole-slab 175.6us -> bias-fold 148.6us).

Single-query (S=1) decode; prefill uses flash_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)

# VMEM budget for the double-buffered K+V block pair (bytes). ~16MB/core
# total; leave room for q/scales/accumulators and the compiler.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_block_t(t: int, row_bytes: int) -> int:
    """Largest power-of-two block (<=4096) dividing t whose double-buffered
    K+V blocks fit the VMEM budget."""
    for bt in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if bt <= t and t % bt == 0 and 2 * bt * row_bytes <= _VMEM_BUDGET:
            return bt
    raise UnsupportedShape(f"no block_t fits T={t}, row_bytes={row_bytes}")


def _normalize_scale(s, b, t, hkv):
    """Accept (B, Hkv, T) head-major (the cache-native form) or legacy
    (B, T, Hkv, 1)/(B, T, Hkv) token-major; return (B, Hkv, T) f32."""
    if s.ndim == 3 and s.shape == (b, hkv, t):
        return s.astype(jnp.float32)
    return s.reshape(b, t, hkv).transpose(0, 2, 1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# kt-layout kernel: K (B, Hkv, D, T) int8/fp8 — zero in-kernel transposes


def _kt_kernel(len_ref, q_ref, qs_ref, kt_ref, ks_ref, v_ref, vs_ref, o_ref,
               m_ref, l_ref, acc_ref, *, block_t: int, n_tb: int,
               sm_scale: float, mode: str, hkv: int, gp: int, d: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vblk = v_ref[0].astype(jnp.bfloat16)  # (Tb, hkv*d)
    pos = jax.lax.broadcasted_iota(jnp.int32, (gp, block_t), 1) + ti * block_t
    mask = pos < len_ref[bi, 0]

    for hi in range(hkv):
        q = q_ref[0, hi]    # (gp, d) int8 (i8 mode) / bf16 (cvt mode)
        kt = kt_ref[0, hi]  # (d, Tb) int8/fp8
        v = vblk[:, hi * d:(hi + 1) * d]
        if mode == "i8":
            s = jax.lax.dot_general(
                q, kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            s = s * ks_ref[0, hi:hi + 1]
            s = s * (qs_ref[bi, hi] * sm_scale)
        else:  # "cvt": fp8 (no fp8 MXU on v5e) — convert K, bf16 dot
            s = jax.lax.dot_general(
                q, kt.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * ks_ref[0, hi:hi + 1] * sm_scale
        s = jnp.where(mask, s, _NEG)

        sl = slice(hi * gp, (hi + 1) * gp)
        m_prev = m_ref[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_ref[sl, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vs_ref[0, hi:hi + 1]).astype(jnp.bfloat16)
        acc_ref[sl] = acc_ref[sl] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[sl] = jnp.broadcast_to(m_new, (gp, 128))
        l_ref[sl] = jnp.broadcast_to(l_new, (gp, 128))

    @pl.when(ti == n_tb - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "mode", "block_t"))
def _kt_impl(q, qs, kt, ks, vflat, vs, lengths, *, sm_scale, mode, block_t):
    b, hkv, gp, d = q.shape
    t = kt.shape[3]
    n_tb = t // block_t
    return pl.pallas_call(
        functools.partial(_kt_kernel, block_t=block_t, n_tb=n_tb,
                          sm_scale=sm_scale, mode=mode, hkv=hkv, gp=gp, d=d),
        grid=(b, n_tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
            pl.BlockSpec((1, hkv, gp, d), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # qs (B, Hkv)
            pl.BlockSpec((1, hkv, d, block_t), lambda bi, ti: (bi, 0, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t, hkv * d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hkv * gp, d), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv * gp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * gp * t * d,
            bytes_accessed=2 * b * t * hkv * (d + 4),
            transcendentals=b * hkv * gp * t),
    )(lengths, q, qs, kt, ks, vflat, vs)


# ---------------------------------------------------------------------------
# tokens-layout kernel: K/V (B, T, Hkv, D) bf16 (or int8/fp8 legacy callers)


def _tok_kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                m_ref, l_ref, acc_ref, *, block_t: int, n_tb: int,
                sm_scale: float, mode: str, hkv: int, gp: int, d: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kblk = k_ref[0]  # (Tb, hkv*d)
    vblk = v_ref[0]
    if mode == "vec8":
        kblk = kblk.astype(jnp.bfloat16)
        vblk = vblk.astype(jnp.bfloat16)

    pos = jax.lax.broadcasted_iota(jnp.int32, (gp, block_t), 1) + ti * block_t
    mask = pos < len_ref[bi, 0]

    for hi in range(hkv):
        q = q_ref[0, hi]  # (gp, d) bf16
        k = kblk[:, hi * d:(hi + 1) * d]
        v = vblk[:, hi * d:(hi + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if mode == "vec8":
            s = s * ks_ref[0, hi:hi + 1]
        s = jnp.where(mask, s, _NEG)

        sl = slice(hi * gp, (hi + 1) * gp)
        m_prev = m_ref[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_ref[sl, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vs_ref[0, hi:hi + 1] if mode == "vec8" else p
              ).astype(jnp.bfloat16)
        acc_ref[sl] = acc_ref[sl] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[sl] = jnp.broadcast_to(m_new, (gp, 128))
        l_ref[sl] = jnp.broadcast_to(l_new, (gp, 128))

    @pl.when(ti == n_tb - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "mode", "block_t"))
def _tok_impl(q, kflat, ks, vflat, vs, lengths, *, sm_scale, mode, block_t):
    b, hkv, gp, d = q.shape
    t = kflat.shape[1]
    n_tb = t // block_t
    return pl.pallas_call(
        functools.partial(_tok_kernel, block_t=block_t, n_tb=n_tb,
                          sm_scale=sm_scale, mode=mode, hkv=hkv, gp=gp, d=d),
        grid=(b, n_tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
            pl.BlockSpec((1, hkv, gp, d), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t, hkv * d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t, hkv * d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hkv * gp, d), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv * gp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * gp * t * d,
            bytes_accessed=(
                2 * b * t * hkv * (d * kflat.dtype.itemsize
                                   + (0 if mode == "fp" else 4))
                + b * hkv * gp * d * 8),
            transcendentals=b * hkv * gp * t),
    )(lengths, q, kflat, ks, vflat, vs)


# ---------------------------------------------------------------------------
# int4 word-packed kernel (tokens-on-words layout, plane-major scores)


def _int4_kernel(len_ref, q_ref, ks_ref, vs_ref, k_ref, v_ref, o_ref,
                 m_ref, l_ref, acc_ref, *, block_t: int, n_tb: int,
                 sm_scale: float, hkv: int, gp: int, d: int):
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # nibble-packed token axis: k_ref is ONE contiguous (Tb/8, Hkv*D)
    # int32 word slab covering ALL kv heads (per-head D-slices of the
    # word array would stream 128-lane strided chunks — measured ~3x off
    # DMA roofline, 13.4% SoL with the old (b, hkv, tb) grid). Per head,
    # plane j of the magic bitcast yields tokens ≡ j (mod 4) as bf16
    # (u-8) values (3 int ops per TWO tokens, no int→float converts);
    # the planes stack along SUBLANES into a (Tb, D) block whose token
    # order is PLANE-MAJOR: row i' = j*(Tb/4)+m holds token 4m+j. The
    # wrapper permutes the scale rows to match; the length mask recovers
    # logical positions from i' arithmetically. Decoded blocks carry the
    # BIASED value 128+u (pure i32 lane ops + free bitcast); the -136
    # recenter folds into each contraction as a per-row correction
    # (dot(x, u-8) = dot(x, 128+u) - 136*rowsum(x)) because a bf16
    # elementwise subtract on the (Tb, d) blocks costs more than the
    # field extraction itself (Mosaic unpacks bf16 arithmetic on v5e).
    from ao_tpu.ops.pallas import int4_words_to_bf16_biased

    qcap = block_t // 4
    kwords = k_ref[0]  # (Tb/8, Hkv*D) i32
    vwords = v_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (gp, block_t), 1)
    pos = 4 * (col % qcap) + col // qcap + ti * block_t
    mask = pos < len_ref[bi, 0]

    for hi in range(hkv):
        q = q_ref[0, hi]  # (gp, d) bf16
        qsum = 136.0 * jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
        k = int4_words_to_bf16_biased(kwords[:, hi * d:(hi + 1) * d])
        s = (jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) - qsum) * sm_scale
        s = s * ks_ref[0, hi:hi + 1]  # permuted per-vector k scales
        s = jnp.where(mask, s, _NEG)

        sl = slice(hi * gp, (hi + 1) * gp)
        m_prev = m_ref[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_ref[sl, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vs_ref[0, hi:hi + 1]).astype(jnp.bfloat16)
        pvsum = 136.0 * jnp.sum(pv.astype(jnp.float32), axis=1, keepdims=True)
        # same plane-major sublane stack as K: pv's columns already follow
        # that token order, so one (gp,Tb)x(Tb,d) dot finishes the head
        v = int4_words_to_bf16_biased(vwords[:, hi * d:(hi + 1) * d])
        acc_ref[sl] = acc_ref[sl] * alpha + (jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) - pvsum)
        m_ref[sl] = jnp.broadcast_to(m_new, (gp, 128))
        l_ref[sl] = jnp.broadcast_to(l_new, (gp, 128))

    @pl.when(ti == n_tb - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_t"))
def _int4_impl(q, kflat, ks, vflat, vs, lengths, *, sm_scale, block_t):
    b, hkv, gp, d = q.shape
    rows_per_blk = block_t // 8
    t = kflat.shape[1] * 8
    n_tb = t // block_t

    return pl.pallas_call(
        functools.partial(
            _int4_kernel, block_t=block_t, n_tb=n_tb, sm_scale=sm_scale,
            hkv=hkv, gp=gp, d=d,
        ),
        grid=(b, n_tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
            pl.BlockSpec((1, hkv, gp, d), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            # caches in native layout: (B, T/8, Hkv*D) int32 word slabs
            pl.BlockSpec((1, rows_per_blk, hkv * d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_blk, hkv * d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hkv * gp, d), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv * gp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * gp * t * d,
            bytes_accessed=2 * b * t * hkv * (d // 2 + 4)
            + b * hkv * gp * d * 8,
            transcendentals=b * hkv * gp * t,
        ),
    )(lengths, q, ks, vs, kflat, vflat)


# ---------------------------------------------------------------------------
# int4 "ck4" kernel: channel-packed transposed K + plane-consistent V
#
# The tokens-words int4 kernel above pays the same Mosaic score-transpose
# penalty as every tokens-layout q·k dot (measured 148.6us / 29.3% SoL at
# T=4096 — barely ahead of int8's 152us on HALF the bytes). This is the
# kt-form redesign, mirroring the fp8 "ktp" layout co-design:
#   * K (B, Hkv, D/8, T) i32: 8 CHANNEL nibbles per word (same
#     _kv_shift bit geometry as the token packing, applied to the channel
#     axis), token LANES plane-permuted per plane_window at write time.
#     The decode emits (D, Tb) rows in channel-plane-major order — undone
#     for free by plane-permuting q's lanes outside — and the q·k dot is
#     MXU-native (((1,),(0,))), no transpose. A cache write touches one
#     token COLUMN: pure scatter, NO read-modify-write (the tokens-words
#     layout's per-step nibble RMW was the e2e cost that made int4-KV
#     LOSE to int8-KV, decode_suite r4: 1389 vs 1696 tok/s).
#   * V (B, T/8, Hkv*D) i32 stays token-word-packed but stored FLAT (the
#     (T/8,H,D)->(T/8,H*D) reshape inside the decode jit is a full-cache
#     tile relayout) with plane-permuted scales stored at write time —
#     zero per-call scale gathers (the old wrapper permuted (B,Hkv,T)
#     scale rows EVERY step).
#   * scores/probs are plane-major; the mask recovers positions
#     arithmetically (same formula as the tokens-words kernel).


def _ck4_kernel(len_ref, q_ref, ks_ref, vs_ref, k_ref, v_ref, o_ref,
                m_ref, l_ref, acc_ref, *, block_t: int, n_tb: int,
                sm_scale: float, hkv: int, gp: int, d: int):
    from ao_tpu.ops.pallas import int4_words_to_bf16_biased

    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vwords = v_ref[0]  # (Tb/8, Hkv*D) i32
    qcap = block_t // 4
    col = jax.lax.broadcasted_iota(jnp.int32, (gp, block_t), 1)
    pos = 4 * (col % qcap) + col // qcap + ti * block_t
    mask = pos < len_ref[bi, 0]

    for hi in range(hkv):
        q = q_ref[0, hi]  # (gp, d) bf16, channel-plane lanes
        qsum = 136.0 * jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
        k = int4_words_to_bf16_biased(k_ref[0, hi])  # (d, Tb) 128+u
        s = (jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())),          # MXU-native form
            preferred_element_type=jnp.float32) - qsum) * sm_scale
        s = s * ks_ref[0, hi:hi + 1]  # plane-stored k scales
        s = jnp.where(mask, s, _NEG)

        sl = slice(hi * gp, (hi + 1) * gp)
        m_prev = m_ref[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_ref[sl, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vs_ref[0, hi:hi + 1]).astype(jnp.bfloat16)
        pvsum = 136.0 * jnp.sum(pv.astype(jnp.float32), axis=1, keepdims=True)
        v = int4_words_to_bf16_biased(vwords[:, hi * d:(hi + 1) * d])
        acc_ref[sl] = acc_ref[sl] * alpha + (jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) - pvsum)
        m_ref[sl] = jnp.broadcast_to(m_new, (gp, 128))
        l_ref[sl] = jnp.broadcast_to(l_new, (gp, 128))

    @pl.when(ti == n_tb - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_t"))
def _ck4_impl(q, kwords, ks, vwords, vs, lengths, *, sm_scale, block_t):
    b, hkv, gp, d = q.shape
    t = kwords.shape[3]
    n_tb = t // block_t
    return pl.pallas_call(
        functools.partial(
            _ck4_kernel, block_t=block_t, n_tb=n_tb, sm_scale=sm_scale,
            hkv=hkv, gp=gp, d=d,
        ),
        grid=(b, n_tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
            pl.BlockSpec((1, hkv, gp, d), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, d // 8, block_t),
                         lambda bi, ti: (bi, 0, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t // 8, hkv * d),
                         lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hkv * gp, d), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv * gp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * gp * t * d,
            bytes_accessed=2 * b * t * hkv * (d // 2 + 4)
            + b * hkv * gp * d * 8,
            transcendentals=b * hkv * gp * t),
    )(lengths, q, ks, vs, kwords, vwords)


# ---------------------------------------------------------------------------
# fp8 (e4m3) "ktp" kernel: transposed-K + in-kernel byte-splice decode
#
# v5e has no fp8 MXU, and XLA's f8e4m3->bf16 convert measured the "cvt"
# path at 7.4% SoL (1136us @ T=4096 — slower than bf16-KV). This kernel
# never calls convert: fp8 blocks bitcast to i32 words of 4 bytes (free —
# the VMEM tile already packs 4 sublanes per 32-bit row) and
# fp8_words_to_bf16 splices the e4m3 bits into the bf16 layout with 8
# integer lane-ops per 4 elements, yielding value*2^-120 exactly. The
# 2^120 folds into the f32 scales outside; q is pre-scaled by 2^60 so
# both contractions stay in f32 range.
#
# Layout co-design (the ablation ladder @ T=4096, B=8, Hkv=8, D=128):
#   * tokens-layout K with the (((1,),(1,))) dot: 410us (Mosaic's
#     internal score transpose — the same penalty that puts bf16-tokens
#     at 409us vs int8-kt's 152us);
#   * kt K + natural-order V via an in-kernel sublane interleave of the
#     splice's pair outputs: 232us (the interleave relayout costs +135us);
#   * kt K + parity-consistent everything (THIS kernel): 97us = 87% of
#     the KV-stream roofline, 1.56x FASTER than the int8-kt kernel.
# The splice's row-doubling bitcast emits rows in parity-major order
# (evens then odds, `parity_major_perm`), so: K (B,Hkv,D,T) stores its
# token COLUMNS parity-permuted per parity_bt window and both scale
# arrays store parity-permuted rows (all applied at cache-WRITE time —
# zero per-call permutes); q's channel lanes are parity-permuted outside
# (contraction-dim permute, cancels in the dot); V stays write-natural
# (B,T,Hkv,D) — its splice emits parity rows that then MATCH the score
# columns. The length mask recovers logical positions arithmetically.
# (ref analog: FA3 fp8 attention, prototype/attention/api.py:68 — a
# measured CUDA win there; this is the TPU-native equivalent.)


def _f8_kernel(len_ref, q_ref, ks_ref, vs_ref, k_ref, v_ref, o_ref,
               m_ref, l_ref, acc_ref, *, block_t: int, n_tb: int,
               sm_scale: float, hkv: int, gp: int, d: int):
    from ao_tpu.ops.pallas import fp8_words_to_bf16

    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vwords = pltpu.bitcast(v_ref[0], jnp.int32)  # (Tb/4, Hkv*D)
    half = block_t // 2
    col = jax.lax.broadcasted_iota(jnp.int32, (gp, block_t), 1)
    pos = 2 * (col % half) + col // half + ti * block_t
    mask = pos < len_ref[bi, 0]

    for hi in range(hkv):
        q = q_ref[0, hi]  # (gp, d) bf16, channel-parity lanes, 2^60-scaled
        kw = pltpu.bitcast(k_ref[0, hi], jnp.int32)      # (d/4, Tb)
        k = fp8_words_to_bf16(kw)                        # (d, Tb) ch-parity
        s = jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())),              # MXU-native form
            preferred_element_type=jnp.float32) * sm_scale
        s = s * ks_ref[0, hi:hi + 1]  # parity-stored k_scale * 2^60
        s = jnp.where(mask, s, _NEG)

        sl = slice(hi * gp, (hi + 1) * gp)
        m_prev = m_ref[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_ref[sl, :1] + jnp.sum(p, axis=-1, keepdims=True)
        # vs carries the 2^120 rescale; pv*v_raw lands back at true scale
        pv = (p * vs_ref[0, hi:hi + 1]).astype(jnp.bfloat16)
        v = fp8_words_to_bf16(vwords[:, hi * d:(hi + 1) * d])  # parity rows
        acc_ref[sl] = acc_ref[sl] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[sl] = jnp.broadcast_to(m_new, (gp, 128))
        l_ref[sl] = jnp.broadcast_to(l_new, (gp, 128))

    @pl.when(ti == n_tb - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_t"))
def _f8_impl(q, kt, ks, vflat, vs, lengths, *, sm_scale, block_t):
    b, hkv, gp, d = q.shape
    t = kt.shape[3]
    n_tb = t // block_t
    return pl.pallas_call(
        functools.partial(
            _f8_kernel, block_t=block_t, n_tb=n_tb, sm_scale=sm_scale,
            hkv=hkv, gp=gp, d=d,
        ),
        grid=(b, n_tb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
            pl.BlockSpec((1, hkv, gp, d), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, block_t), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, d, block_t), lambda bi, ti: (bi, 0, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_t, hkv * d), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hkv * gp, d), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv * gp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, 128), jnp.float32),
            pltpu.VMEM((hkv * gp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hkv * gp * t * d,
            bytes_accessed=2 * b * t * hkv * (d + 4) + b * hkv * gp * d * 8,
            transcendentals=b * hkv * gp * t),
    )(lengths, q, ks, vs, kt, vflat)


def decode_attention(q, k_cache, v_cache, lengths, *, k_scale=None,
                     v_scale=None, sm_scale=None, block_t: int = 0,
                     k_layout: str = "tokens"):
    """Single-step decode attention over a cache.

    q (B, H, D). Cache forms:

    * ``k_layout="kt"``: k_cache (B, Hkv, D, T) int8/fp8 with k_scale
      (B, Hkv, T); v_cache (B, T, Hkv, D) + v_scale (B, Hkv, T) or legacy
      (B, T, Hkv, 1).
    * ``k_layout="tokens"``: k_cache/v_cache (B, T, Hkv, D) bf16 OR
      int8/fp8, OR the int4 word-packed form (B, T/8, Hkv, D) int32
      (QuantKVCache "int4") — quantized caches come with scales.

    lengths (B,) int32 valid positions. Returns (B, H, D) f32.
    """
    b, h, d = q.shape
    int4 = k_cache.dtype == jnp.int32 and k_layout != "ck4"
    if k_layout == "ck4" or (k_layout in ("kt", "ktp") and not int4):
        hkv, t = k_cache.shape[1], k_cache.shape[3]
    else:
        t, hkv = k_cache.shape[1] * (8 if int4 else 1), k_cache.shape[2]
    g = h // hkv
    if g * hkv != h or g < 1:
        raise UnsupportedShape(f"H={h} not a multiple of Hkv={hkv}")
    if d % 128:
        raise UnsupportedShape(f"D={d} misaligned")
    sm_scale = float(sm_scale if sm_scale is not None else d ** -0.5)
    lengths = lengths.reshape(b, 1).astype(jnp.int32)

    if int4:
        if k_scale is None:
            raise UnsupportedShape("int4 cache needs scales")
        if not block_t:
            # K+V word slabs stream hkv*d bytes per token (half a byte per
            # int4 element, both caches); count the decoded bf16 head
            # blocks again so the scoped-vmem allocator has headroom
            block_t = _pick_block_t(t, 2 * hkv * d)
        # words-per-block must satisfy the %8 sublane rule → block_t % 64
        block_t = min(block_t - block_t % 64 or 64, t)
        if t % block_t or block_t % 64:
            raise UnsupportedShape(f"int4 cache T={t} vs block_t={block_t}")
        gp = max(8, g)
        qg = q.astype(jnp.bfloat16).reshape(b, hkv, g, d)
        if gp != g:
            qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
        kflat = k_cache.reshape(b, k_cache.shape[1], hkv * d)
        vflat = v_cache.reshape(b, v_cache.shape[1], hkv * d)
        # (B, Hkv, T) score-scale rows, permuted per block to the kernel's
        # plane-major column order once per call
        from ao_tpu.ops.pallas import plane_major_perm

        ks = _normalize_scale(k_scale, b, t, hkv)
        vs = _normalize_scale(v_scale, b, t, hkv)
        perm = plane_major_perm(block_t)
        ks = ks.reshape(b, hkv, t // block_t, block_t)[
            ..., perm].reshape(b, hkv, t)
        vs = vs.reshape(b, hkv, t // block_t, block_t)[
            ..., perm].reshape(b, hkv, t)
        out = _int4_impl(qg, kflat, ks, vflat, vs, lengths,
                         sm_scale=sm_scale, block_t=block_t)
        return out.reshape(b, hkv, gp, d)[:, :, :g].reshape(b, h, d)

    gp = max(8, g)
    qg = q.reshape(b, hkv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))

    if k_layout == "kt":
        if k_scale is None:
            raise UnsupportedShape("kt layout implies a quantized K cache")
        ks = _normalize_scale(k_scale, b, t, hkv)
        vs = _normalize_scale(v_scale, b, t, hkv)
        vflat = v_cache.reshape(b, t, hkv * d)
        # VMEM accounting: K+V blocks are double-buffered by Mosaic; the
        # in-kernel bf16 copies (V always — i8 scores still convert V for
        # the bf16 PV matmul — plus K in cvt mode) are single temps. Count
        # them exactly: the old double-buffered-only formula compiled
        # int8 at block_t=2048 (measured 152us @ T=4096) while a naive
        # "copies double-buffered too" formula would shrink it to 1024
        # (measured 178us)
        blk_row = hkv * d * (1 + v_cache.dtype.itemsize)
        copy_row = 2 * hkv * d * (1 if k_cache.dtype == jnp.int8 else 2)
        bt = block_t
        if not bt:
            for cand in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
                if (cand <= t and t % cand == 0
                        and 2 * cand * blk_row + cand * copy_row
                        <= 14 * 1024 * 1024):
                    bt = cand
                    break
            if not bt:
                raise UnsupportedShape(f"no block_t fits T={t}")
        if t % bt:
            raise UnsupportedShape(f"T={t} vs block_t={bt}")
        if k_cache.dtype == jnp.int8:
            # quantize q per (batch, kv-head group); i8×i8→i32 MXU scores
            qf = qg.astype(jnp.float32)
            qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=(2, 3)), 1e-8) / 127.0
            qi = jnp.clip(jnp.round(qf / qs[:, :, None, None]), -127, 127
                          ).astype(jnp.int8)
            out = _kt_impl(qi, qs.astype(jnp.float32), k_cache, ks, vflat,
                           vs, lengths, sm_scale=sm_scale, mode="i8",
                           block_t=bt)
            return out.reshape(b, hkv, gp, d)[:, :, :g].reshape(b, h, d)
        qb = qg.astype(jnp.bfloat16)
        qs = jnp.ones((b, hkv), jnp.float32)
        out = _kt_impl(qb, qs, k_cache, ks, vflat, vs, lengths,
                       sm_scale=sm_scale, mode="cvt", block_t=bt)
        return out.reshape(b, hkv, gp, d)[:, :, :g].reshape(b, h, d)

    # "ck4" int4: channel-packed transposed K + plane-consistent V (see
    # _ck4_kernel header) — RMW-free K writes, zero per-call permutes
    if k_layout == "ck4":
        from ao_tpu.ops.pallas import plane_major_perm, plane_window

        if k_scale is None or k_cache.dtype != jnp.int32:
            raise UnsupportedShape("ck4 layout is the int4 K cache form")
        bt = plane_window(t)
        if bt is None or d % 8:
            raise UnsupportedShape(f"T={t}/D={d} has no plane window")
        ks = _normalize_scale(k_scale, b, t, hkv)
        vs = _normalize_scale(v_scale, b, t, hkv)
        chperm = plane_major_perm(d)
        qb = qg[..., chperm].astype(jnp.bfloat16)
        out = _ck4_impl(qb, k_cache, ks, v_cache, vs, lengths,
                        sm_scale=sm_scale, block_t=bt)
        return out.reshape(b, hkv, gp, d)[:, :, :g].reshape(b, h, d)

    # "ktp" fp8 (e4m3): transposed-parity K + byte-splice decode — never
    # calls the slow f8->bf16 convert (see _f8_kernel header). The cache
    # stored K columns and both scale arrays parity-permuted at write
    # time; the only per-call work is q's channel-lane permute (tiny).
    if k_layout == "ktp":
        from ao_tpu.ops.pallas import parity_major_perm, parity_window

        if k_scale is None or k_cache.dtype != jnp.float8_e4m3fn:
            raise UnsupportedShape("ktp layout is the fp8 K cache form")
        bt = parity_window(t)
        if bt is None:
            raise UnsupportedShape(f"T={t} has no parity window")
        # the splice's 2^-120 rescale is PRE-FOLDED into the stored scales
        # (kvcache.update: K scale carries 2^60 — q brings the other 2^60
        # so q.k products stay in f32 range — V scale the full 2^120)
        ks = _normalize_scale(k_scale, b, t, hkv)
        vs = _normalize_scale(v_scale, b, t, hkv)
        chperm = parity_major_perm(d)
        qb = (qg[..., chperm].astype(jnp.float32) * 2.0 ** 60
              ).astype(jnp.bfloat16)
        vflat = v_cache.reshape(b, t, hkv * d)
        out = _f8_impl(qb, k_cache, ks, vflat, vs, lengths,
                       sm_scale=sm_scale, block_t=bt)
        return out.reshape(b, hkv, gp, d)[:, :, :g].reshape(b, h, d)

    # tokens layout
    mode = "vec8" if k_scale is not None else "fp"
    kflat = k_cache.reshape(b, t, hkv * d)
    vflat = v_cache.reshape(b, t, hkv * d)
    if mode == "vec8":
        ks = _normalize_scale(k_scale, b, t, hkv)
        vs = _normalize_scale(v_scale, b, t, hkv)
    else:
        ks = jnp.ones((b, hkv, t), jnp.float32)
        vs = jnp.ones((b, hkv, t), jnp.float32)
    row_bytes = 2 * hkv * d * k_cache.dtype.itemsize  # K + V same dtype
    bt = block_t or _pick_block_t(t, row_bytes)
    if t % bt:
        raise UnsupportedShape(f"T={t} vs block_t={bt}")
    qb = qg.astype(jnp.bfloat16)
    out = _tok_impl(qb, kflat, ks, vflat, vs, lengths,
                    sm_scale=sm_scale, mode=mode, block_t=bt)
    return out.reshape(b, hkv, gp, d)[:, :, :g].reshape(b, h, d)
