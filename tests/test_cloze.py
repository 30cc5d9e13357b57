"""Tests for the cloze task-accuracy eval (ao_tpu/eval/cloze.py — the
reference pairs each wikitext-ppl row with a winogrande accuracy row;
cloze over the committed corpus is the zero-egress analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ao_tpu.eval.cloze import cloze_accuracy


def _oracle_forward(stream, vocab):
    """A 'model' that knows the corpus: bigram-table lookup built from the
    token stream (predicts argmax of observed successors)."""
    table = np.zeros((vocab, vocab), np.float32)
    for a, b in zip(stream[:-1], stream[1:]):
        table[a, b] += 1.0
    logits_table = jnp.asarray(np.log(table + 1e-3))

    def fwd(toks):
        return logits_table[toks]

    return fwd


def test_oracle_beats_chance_and_scrambled_loses():
    rng = np.random.RandomState(0)
    # structured stream: deterministic cycle with small noise; vocab 37 is
    # coprime with the 32-token item length, so distractor windows sit at a
    # different cycle phase than the true continuation
    vocab, n = 37, 8192
    stream = np.zeros(n, np.int64)
    for i in range(1, n):
        stream[i] = (stream[i - 1] + 1) % vocab if rng.rand() < 0.95 \
            else rng.randint(vocab)
    fwd = _oracle_forward(stream, vocab)
    acc = cloze_accuracy(fwd, stream, context_len=16, cont_len=16,
                         n_items=64, n_choices=4, batch_size=32)
    # the bigram oracle discriminates mainly at the context->continuation
    # boundary transition (in-window transitions are equally likely for
    # every phase-shifted distractor), so its ceiling here is ~0.8 —
    # still far above the 0.25 chance level
    assert acc > 0.7

    def random_fwd(toks):
        key = jax.random.PRNGKey(jnp.sum(toks).astype(jnp.uint32))
        return jax.random.normal(key, toks.shape + (vocab,))

    acc_rand = cloze_accuracy(random_fwd, stream, context_len=16,
                              cont_len=16, n_items=64, n_choices=4,
                              batch_size=32)
    assert acc_rand < 0.6  # chance is 0.25; random scorer must not ace it


def test_never_uses_own_continuation_as_distractor():
    # with 2 items and 2 choices the only distractor is the other item's
    # continuation — a scorer preferring LOW token values picks item 0's
    # true continuation and rejects item 1's
    stream = np.concatenate([np.zeros(16, np.int64), np.ones(16, np.int64) * 3,
                             np.zeros(16, np.int64), np.ones(16, np.int64) * 7])

    def low_is_likely(toks):
        v = 8
        return -jnp.broadcast_to(jnp.arange(v, dtype=jnp.float32),
                                 toks.shape + (v,))

    acc = cloze_accuracy(low_is_likely, stream, context_len=16, cont_len=16,
                         n_items=2, n_choices=2, batch_size=4)
    assert acc == 0.5  # item 0 right (3s beat 7s), item 1 wrong


def test_too_small_corpus_raises():
    with pytest.raises(ValueError):
        cloze_accuracy(lambda t: jnp.zeros(t.shape + (8,)),
                       np.zeros(16, np.int64), context_len=16, cont_len=16)
