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
) -> jax.Array:
    """Returns sampled token ids (...,) int32. temperature==0 → greedy."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lf = logits.astype(jnp.float32) / temperature

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
