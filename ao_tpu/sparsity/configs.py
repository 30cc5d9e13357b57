"""Sparsity configs + sparsify_ API.

(ref: torchao/sparsity/sparse_api.py — sparsify_:113,
SemiSparseWeightConfig:73, BlockSparseWeightConfig:50; Wanda
sparsity/wanda.py:20.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import register_quantize_handler
from ao_tpu.algorithms.observe import ObservedArray
from ao_tpu.sparsity.blocksparse import BlockSparseArray
from ao_tpu.sparsity.sparse24 import Sparse24Array, prune_2to4


@dataclasses.dataclass
class SemiSparseWeightConfig(AOBaseConfig):
    """(ref: sparse_api.py:73)"""

    version: int = 1


@register_quantize_handler(SemiSparseWeightConfig)
def _semi_sparse_transform(weight, config: SemiSparseWeightConfig):
    return Sparse24Array.from_hp(weight)


@dataclasses.dataclass
class Sparse24Int4WeightConfig(AOBaseConfig):
    """2:4 prune + int4-quantize the kept values, both compressed — the
    marlin-sparse analog at 3/8 B/elem (ref: Int4WeightOnlyConfig over
    MarlinSparseLayout, sparsity/README.md:28)."""

    group_size: int = 128
    version: int = 1


@register_quantize_handler(Sparse24Int4WeightConfig)
def _sparse24_int4_transform(weight, config: Sparse24Int4WeightConfig):
    from ao_tpu.sparsity.sparse24 import Sparse24Int4Array

    return Sparse24Int4Array.from_hp(weight, config.group_size)


@dataclasses.dataclass
class BlockSparseWeightConfig(AOBaseConfig):
    """(ref: sparse_api.py:50)"""

    blocksize: int = 64
    keep_fraction: Optional[float] = None
    version: int = 1


@register_quantize_handler(BlockSparseWeightConfig)
def _block_sparse_transform(weight, config: BlockSparseWeightConfig):
    return BlockSparseArray.from_hp(
        weight, config.blocksize, config.keep_fraction
    )


@dataclasses.dataclass
class WandaSparseConfig(AOBaseConfig):
    """Wanda pruning: score = |W| * ||x||_2 per input channel; prune to 2:4
    by score. Two-step observe/convert like the PTQ algorithms.
    (ref: torchao/sparsity/wanda.py:20)"""

    step: str = "observe"
    version: int = 1


@register_quantize_handler(WandaSparseConfig)
def _wanda_transform(weight, config: WandaSparseConfig):
    if config.step == "observe":
        if isinstance(weight, ObservedArray):
            return weight
        return ObservedArray.wrap(weight, "wanda")
    if config.step == "convert":
        if not isinstance(weight, ObservedArray):
            return weight
        obs = weight
        norms = obs.stats.act_l2  # (K,)
        w = obs.weight.astype(jnp.float32)
        score = jnp.abs(w) * norms[:, None]
        # 2:4 prune by score, keep original values
        k = w.shape[-2]
        sg = score.reshape(k // 4, 4, -1)
        order = jnp.argsort(sg, axis=-2)
        ranks = jnp.argsort(order, axis=-2)
        mask = (ranks >= 2).reshape(w.shape)
        return Sparse24Array.from_hp(jnp.where(mask, w, 0.0))
    raise ValueError(config.step)


def sparsify_(params, config: AOBaseConfig, filter_fn=None):
    """(ref: sparsify_ sparse_api.py:113) — same pytree walk as quantize_."""
    from ao_tpu.quantization.quantize import quantize_

    return quantize_(params, config, filter_fn)
