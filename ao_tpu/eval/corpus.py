"""Byte-level real-text corpus loading for the perplexity ladder.

(ref analog: the reference evaluates quantization on lm-eval wikitext
perplexity, docs/source/workflows/inference.md:44-51. This environment has
no egress, so the committed corpus is real English prose harvested from
permissively-licensed installed packages — see
``benchmarks/data/build_corpus.py``. Byte-level tokenization keeps the
pipeline hermetic: vocab 256, no tokenizer artifact to version.)
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

BYTE_VOCAB = 256

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "benchmarks", "data", "corpus.txt")


def load_byte_corpus(path: str = None) -> np.ndarray:
    """Read a text file as a 1-D uint8→int32 byte-token stream."""
    path = path or _DEFAULT
    with open(path, "rb") as f:
        raw = f.read()
    return np.frombuffer(raw, dtype=np.uint8).astype(np.int32)


def train_eval_split(tokens: np.ndarray, eval_frac: float = 0.1,
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic head/tail split: the eval tail is text the model never
    saw during the ladder's base-model training."""
    n_eval = int(len(tokens) * eval_frac)
    return tokens[:-n_eval], tokens[-n_eval:]
