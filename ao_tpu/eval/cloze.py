"""Cloze multiple-choice task accuracy — the task-accuracy analog of the
reference's winogrande gate (docs/source/workflows/inference.md:44-51 pairs
every wikitext-ppl row with a winogrande accuracy row; this environment has
no egress, so the task is built from the committed held-out corpus).

Items: non-overlapping windows of held-out text split into (context,
continuation); the model must rank the TRUE continuation above distractor
continuations drawn from other windows, scored by teacher-forced total
log-probability. Quantization degrades accuracy monotonically with bit
width, mirroring the reference's accuracy ladder.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cloze_accuracy"]


def _score_batch(forward_fn: Callable, seqs: jax.Array,
                 context_len: int) -> jax.Array:
    """Total log-prob of positions >= context_len under teacher forcing.

    seqs (B, L) int tokens; returns (B,) f32 scores."""
    logits = forward_fn(seqs)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = seqs[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]  # (B, L-1)
    # positions predicting tokens context_len .. L-1
    return tok_lp[:, context_len - 1:].sum(axis=-1)


def cloze_accuracy(
    forward_fn: Callable,
    tokens,
    *,
    context_len: int = 96,
    cont_len: int = 32,
    n_items: int = 96,
    n_choices: int = 4,
    batch_size: int = 16,
    seed: int = 0,
) -> float:
    """Fraction of items where the true continuation out-scores every
    distractor. ``forward_fn(tokens (B, L)) -> logits (B, L, V)``."""
    toks = np.asarray(tokens)
    item_len = context_len + cont_len
    max_items = len(toks) // item_len
    n_items = min(n_items, max_items)
    if n_items < 2:
        raise ValueError("corpus too small for cloze items")
    ctxs = np.stack([
        toks[i * item_len: i * item_len + context_len]
        for i in range(n_items)
    ])
    conts = np.stack([
        toks[i * item_len + context_len: (i + 1) * item_len]
        for i in range(n_items)
    ])

    # distractors: continuations of OTHER items, derangement-shifted so no
    # item ever draws its own continuation
    rng = np.random.RandomState(seed)
    choice_idx = np.zeros((n_items, n_choices), dtype=np.int64)
    choice_idx[:, 0] = np.arange(n_items)
    for c in range(1, n_choices):
        shift = rng.randint(1, n_items)
        choice_idx[:, c] = (np.arange(n_items) + shift) % n_items

    seqs = np.concatenate(
        [np.repeat(ctxs, n_choices, axis=0),
         conts[choice_idx.reshape(-1)]], axis=1,
    )  # (n_items * n_choices, item_len)

    total = seqs.shape[0]
    pad = (-total) % batch_size
    if pad:
        seqs = np.concatenate([seqs, np.tile(seqs[-1:], (pad, 1))], axis=0)
    score = jax.jit(lambda s: _score_batch(forward_fn, s, context_len))
    scores = []
    for off in range(0, seqs.shape[0], batch_size):
        scores.append(np.asarray(score(jnp.asarray(seqs[off:off + batch_size]))))
    s = np.concatenate(scores)[:total].reshape(n_items, n_choices)
    return float((s.argmax(axis=1) == 0).mean())
