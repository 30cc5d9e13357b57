"""Ring attention: causal attention with the sequence axis sharded over the
mesh, K/V rotating around the ring.

(SURVEY §5: the reference has NO context-parallel/ring attention — long
context is delegated to torchtitan. TPU-native design: inside ``shard_map``
over the sequence axis, each device holds its Q/K/V shard; at each of P ring
steps it computes flash-style partial attention of its Q block against the
K/V block currently on hand, merges the online-softmax statistics, and
``ppermute``s the K/V block to the next neighbor — XLA's latency-hiding
scheduler overlaps the ICI transfer with the attention math. Causality is
handled by masking whole blocks (source > target) and the diagonal block
triangularly. Optionally the rotating K/V payload travels int8-quantized
(per-vector scales), halving ring bytes — the quantized-collectives idea
applied to attention.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG = -1e30


def _block_attn(q, k, v, *, sm_scale, mask):
    """q (B, H, Sq, D); k/v (B, H, Sk, D); mask (Sq, Sk) bool or None.
    Returns (out_unnormalized (B,H,Sq,D), m (B,H,Sq,1), l (B,H,Sq,1))."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if mask is not None:
        s = jnp.where(mask[None, None], s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    # fully-masked rows: keep m finite so exp() stays 0 without NaNs
    m = jnp.maximum(m, -1e29)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out, m, l


def _merge(acc, m, l, out2, m2, l2):
    m_new = jnp.maximum(m, m2)
    a1 = jnp.exp(m - m_new)
    a2 = jnp.exp(m2 - m_new)
    return acc * a1 + out2 * a2, m_new, l * a1 + l2 * a2


def _quant_kv(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(
        jnp.int8)
    return q, s


def _dequant_kv(q, s, dtype):
    return (q.astype(jnp.float32) * s).astype(dtype)


def ring_attention(
    q: jax.Array,  # (B, H, S_local, D) — this device's query block
    k: jax.Array,  # (B, H, S_local, D)
    v: jax.Array,
    axis_name: str,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    quantize_comm: bool = False,
) -> jax.Array:
    """Call INSIDE shard_map with the sequence axis sharded on ``axis_name``.
    Block i attends blocks j ≤ i (causal). Returns (B, H, S_local, D)."""
    p = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    d = q.shape[-1]
    sq = q.shape[2]
    sm = float(sm_scale if sm_scale is not None else d ** -0.5)
    perm = [(i, (i + 1) % p) for i in range(p)]

    diag_mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, sq), 1)
        diag_mask = cols <= rows

    # step 0: local (diagonal) block
    acc, m, l = _block_attn(q, k, v, sm_scale=sm,
                            mask=diag_mask if causal else None)

    if quantize_comm:
        kq, ks = _quant_kv(k)
        vq, vs = _quant_kv(v)
        ring = (kq, ks, vq, vs)
    else:
        ring = (k, v)

    def body(step, carry):
        acc, m, l, ring = carry
        ring = jax.tree_util.tree_map(
            lambda t: jax.lax.ppermute(t, axis_name, perm), ring
        )
        src = (idx - step - 1) % p  # block now on hand came from src
        if quantize_comm:
            kq, ks, vq, vs = ring
            kk = _dequant_kv(kq, ks, q.dtype)
            vv = _dequant_kv(vq, vs, q.dtype)
        else:
            kk, vv = ring
        out2, m2, l2 = _block_attn(q, kk, vv, sm_scale=sm, mask=None)
        if causal:
            # whole-block causality: visible iff src < idx
            vis = (src < idx).astype(jnp.float32)
            m2 = jnp.where(vis > 0, m2, -1e29)
            out2 = out2 * vis
            l2 = l2 * vis
        acc, m, l = _merge(acc, m, l, out2, m2, l2)
        return acc, m, l, ring

    acc, m, l, _ = jax.lax.fori_loop(0, p - 1, body, (acc, m, l, ring))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)
