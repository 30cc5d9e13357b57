"""Supermask: learned sparsity masks via trainable scores + straight-through
top-k, and the weight-norm "fake 2:4" sparsifier used to prepare dense
checkpoints for sparse fine-tuning.

(ref: torchao/sparsity/supermask.py:52 ``SupermaskLinear`` — scores tensor,
sigmoid + top-k% binarization with STE; and
prototype/sparsity/sparsifier/weight_norm_sparsifier.py — block-local
top-k-by-norm mask without runtime compression. TPU re-design: both are
pure functions over (weight, scores) pytrees; the mask binarization is a
`jax.custom_vjp` so scores learn through the discrete top-k.)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Supermask
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def binarize_topk(scores: jax.Array, sparsity: float) -> jax.Array:
    """0/1 mask keeping the top (1-sparsity) fraction of scores; gradients
    pass straight through (ref: supermask.py GetSubnet.apply)."""
    return _binarize_val(scores, sparsity)


def _binarize_val(scores, sparsity):
    flat = scores.reshape(-1)
    k = max(1, int(round(flat.shape[0] * (1.0 - sparsity))))
    thresh = jnp.sort(flat)[flat.shape[0] - k]
    return (scores >= thresh).astype(scores.dtype)


def _bin_fwd(scores, sparsity):
    return _binarize_val(scores, sparsity), None


def _bin_bwd(sparsity, _res, g):
    return (g,)  # straight-through


binarize_topk.defvjp(_bin_fwd, _bin_bwd)


def init_supermask_scores(key: jax.Array, weight: jax.Array) -> jax.Array:
    """Kaiming-uniform scores, the reference's init (supermask.py:74)."""
    bound = (6.0 / weight.shape[0]) ** 0.5
    return jax.random.uniform(
        key, weight.shape, jnp.float32, -bound, bound
    )


def supermask_linear(
    x: jax.Array,
    weight: jax.Array,
    scores: jax.Array,
    sparsity: float = 0.5,
) -> jax.Array:
    """Forward through W ⊙ mask(scores); train `scores` (and optionally W).

    The mask is recomputed each call — under jit the sort amortizes into the
    step; at convert time call :func:`apply_supermask` once.
    """
    mask = binarize_topk(scores, sparsity)
    return jnp.matmul(x, (weight * mask).astype(x.dtype))


def apply_supermask(
    weight: jax.Array, scores: jax.Array, sparsity: float = 0.5
) -> jax.Array:
    """Bake the learned mask into the weight (convert step)."""
    return weight * _binarize_val(scores, sparsity).astype(weight.dtype)


# ---------------------------------------------------------------------------
# Weight-norm fake-2:4 sparsifier
# ---------------------------------------------------------------------------


def weight_norm_sparsify_2to4(
    w: jax.Array, dim: int = -2
) -> Tuple[jax.Array, jax.Array]:
    """Zero the 2 smallest-|w| of every 4 along ``dim`` WITHOUT compressing
    — the "fake sparsity" the reference trains through before converting to
    a compressed layout (ref: WeightNormSparsifier).

    Returns (w_masked, mask bool)."""
    dim = dim % w.ndim
    w_m = jnp.moveaxis(w, dim, -1)
    shape = w_m.shape
    if shape[-1] % 4:
        raise ValueError(f"dim size {shape[-1]} not a multiple of 4")
    grp = w_m.reshape(*shape[:-1], shape[-1] // 4, 4)
    order = jnp.argsort(jnp.abs(grp), axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    mask = (ranks >= 2).reshape(shape)
    mask = jnp.moveaxis(mask, -1, dim)
    return w * mask.astype(w.dtype), mask
