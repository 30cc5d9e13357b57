"""Embedding-table quantization.

(ref: torchao/prototype/quantization/embedding/api.py:38,117,184
``QuantizedEmbedding``/``QuantizedTiedEmbedding``/``EmbeddingQuantizer``.
TPU re-design: the table quantizes with per-row (PerAxis(0)) scales so the
lookup stays a gather of (qdata row, scale scalar) followed by one multiply;
tied embeddings reuse the same Int8Array for the lm_head matmul — the
transpose is handled by the linear entry point via dequantize.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import register_quantize_handler
from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.quantization.qarrays.intx import IntxArray
from ao_tpu.quantization.quantize import path_to_fqn

EMBEDDING_KEY_NAMES = {"embed", "embedding", "embeddings", "wte",
                       "tok_embeddings", "embed_tokens"}


@dataclasses.dataclass
class EmbeddingQuantizerConfig(AOBaseConfig):
    """int2..8 weight-only quantization of embedding tables, per-row scales.
    (ref: EmbeddingQuantizer embedding/api.py:184)"""

    bits: int = 8
    version: int = 1


@register_quantize_handler(EmbeddingQuantizerConfig)
def _embedding_transform(weight: jax.Array, config: EmbeddingQuantizerConfig):
    if weight.ndim != 2:
        return weight
    if config.bits == 8:
        # one scale per vocab row — the lookup stays gather+multiply
        return Int8Array.from_hp(weight, block_size=(1, weight.shape[1]))
    # sub-8-bit: bitplane-packed with vocab-axis groups (dequant-on-lookup)
    return IntxArray.from_hp(weight, bits=config.bits, packed=True)


def embedding_filter(fqn: str, leaf: Any) -> bool:
    last = fqn.rsplit(".", 1)[-1] if fqn else ""
    return (
        hasattr(leaf, "ndim") and getattr(leaf, "ndim", 0) == 2
        and last in EMBEDDING_KEY_NAMES
    )


def quantize_embeddings(
    params: Any,
    config: Optional[EmbeddingQuantizerConfig] = None,
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
) -> Any:
    """quantize_ specialization for embedding tables (name-matched)."""
    from ao_tpu.quantization.quantize import quantize_

    return quantize_(
        params, config or EmbeddingQuantizerConfig(),
        filter_fn=filter_fn or embedding_filter,
    )
