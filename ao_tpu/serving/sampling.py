"""Token sampling: temperature / top-k / top-p (nucleus), jit-friendly.

(Serving-completeness beyond the reference: torchao's gpt-fast loop is
greedy-only; a deployable engine needs stochastic sampling. All ops are
static-shape: top-k via `lax.top_k`, top-p via sorted cumulative mass.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_logits(
    logits: jax.Array,  # (..., V) raw logits
    key: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    min_p: Optional[float] = None,
) -> jax.Array:
    """Returns sampled token ids (...,) int32. temperature==0 → greedy."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lf = logits.astype(jnp.float32) / temperature

    if min_p is not None and min_p > 0.0:
        # drop tokens with prob < min_p * max prob (temp-scaled dist);
        # applied before top-k/top-p, like vLLM's min_p filter
        probs = jax.nn.softmax(lf, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        lf = jnp.where(probs < min_p * pmax, -jnp.inf, lf)

    if top_k is not None:
        kth = jax.lax.top_k(lf, top_k)[0][..., -1:]
        lf = jnp.where(lf < kth, -jnp.inf, lf)

    if top_p is not None:
        sorted_lf = jnp.sort(lf, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_lf, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with mass ≥ top_p (always ≥ 1 token)
        cutoff_idx = jnp.sum((cum - probs) < top_p, axis=-1, keepdims=True) - 1
        cutoff = jnp.take_along_axis(sorted_lf, cutoff_idx, axis=-1)
        lf = jnp.where(lf < cutoff, -jnp.inf, lf)

    return jax.random.categorical(key, lf, axis=-1).astype(jnp.int32)


def sample_logits_batched(
    logits: jax.Array,  # (B, V)
    key: jax.Array,
    temps: jax.Array,   # (B,) 0.0 → greedy for that row
    top_ks: jax.Array,  # (B,) int32, 0 → no top-k for that row
    top_ps: jax.Array,  # (B,) f32, 1.0 → no top-p for that row
    min_ps: Optional[jax.Array] = None,  # (B,) f32, 0.0 → no min-p
) -> jax.Array:
    """Per-row sampling parameters (continuous batching mixes greedy and
    sampled requests in one step). One descending sort serves both filters;
    min-p filters on the temp-scaled distribution first, then top-p mass is
    computed over the top-k-filtered distribution (the sequential-filters
    semantics). When every row is greedy a `lax.cond` skips the sort
    entirely. Returns (B,) int32."""
    lf = logits.astype(jnp.float32)
    v = lf.shape[-1]
    greedy = jnp.argmax(lf, axis=-1).astype(jnp.int32)

    def sample(_):
        lt = lf / jnp.where(temps > 0, temps, 1.0)[:, None]
        if min_ps is not None:
            probs_full = jax.nn.softmax(lt, axis=-1)
            pmax = jnp.max(probs_full, axis=-1, keepdims=True)
            lt = jnp.where(probs_full < min_ps[:, None] * pmax, -jnp.inf, lt)
        srt = jnp.sort(lt, axis=-1)[..., ::-1]
        k = jnp.where(top_ks > 0, top_ks, v).astype(jnp.int32)
        kth = jnp.take_along_axis(srt, (jnp.clip(k, 1, v) - 1)[:, None], -1)
        lt = jnp.where(lt < kth, -jnp.inf, lt)
        srt_k = jnp.where(jnp.arange(v)[None] < k[:, None], srt, -jnp.inf)
        probs = jax.nn.softmax(srt_k, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cut_i = jnp.sum((cum - probs) < top_ps[:, None], -1, keepdims=True) - 1
        cutoff = jnp.take_along_axis(srt_k, jnp.clip(cut_i, 0, v - 1), -1)
        lt = jnp.where(lt < cutoff, -jnp.inf, lt)
        return jax.random.categorical(key, lt, axis=-1).astype(jnp.int32)

    sampled = jax.lax.cond(jnp.any(temps > 0), sample,
                           lambda _: greedy, None)
    return jnp.where(temps > 0, sampled, greedy)


def apply_penalties(
    logits: jax.Array,       # (B, V) raw logits
    rep_pens: jax.Array,     # (B,) f32, 1.0 → no repetition penalty
    freq_pens: jax.Array,    # (B,) f32, 0.0 → no frequency penalty
    pres_pens: jax.Array,    # (B,) f32, 0.0 → no presence penalty
    prompt_pres: jax.Array,  # (B, V) int8: 1 where the token is in the prompt
    out_counts: jax.Array,   # (B, V) int32 per-token output counts
    bias: Optional[jax.Array] = None,  # (B, V) f32 additive logit bias
) -> jax.Array:
    """Context penalties on raw logits, applied before temperature (the
    vLLM/HF processor order; greedy rows see them too).

    - repetition penalty (HF semantics): tokens present in the prompt OR
      the output so far get positive logits divided / negative multiplied
      by ``rep_pen``.
    - frequency/presence penalties (OpenAI semantics): subtract
      ``freq_pen * count`` and ``pres_pen * present`` over OUTPUT tokens
      only.
    - additive per-request ``logit_bias`` (OpenAI semantics; the
      guided-decoding primitive — ±1e9 hard-bans/forces tokens).

    All defaults (1.0 / 0.0 / 0.0) make this an exact identity, so a
    penalties-enabled engine reproduces the plain engine token-for-token
    until a request actually sets one."""
    lf = logits.astype(jnp.float32)
    ctx = (prompt_pres > 0) | (out_counts > 0)
    rp = rep_pens[:, None]
    lf = jnp.where(ctx, jnp.where(lf > 0, lf / rp, lf * rp), lf)
    oc = out_counts.astype(jnp.float32)
    lf = lf - freq_pens[:, None] * oc
    lf = lf - pres_pens[:, None] * (oc > 0)
    if bias is not None:
        lf = lf + bias
    return lf
