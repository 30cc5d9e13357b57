"""`quantize_` — rewrite a params pytree, swapping weights for QuantizedArrays.

(ref: torchao/quantization/quant_api.py:275 ``quantize_`` — there it walks
nn.Modules and swaps ``module.weight``; here the model is a pytree of params
and the transform is a pure function pytree → pytree. FqnToConfig routing
precedence follows quant_api.py:1636-1727.)

The default filter targets 2-D (or stacked-expert 3-D) float leaves whose
path ends in a linear-kernel-ish name, mirroring ``_is_linear``
(quant_api.py:168).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import get_quantize_handler
from ao_tpu.quantization.configs import FqnToConfig
from ao_tpu.quantization.qarrays.base import QuantizedArray

_LINEAR_KEY_NAMES = {"kernel", "weight", "w", "wq", "wk", "wv", "wo", "w1", "w2",
                     "w3", "gate", "up", "down", "qkv", "proj", "lm_head",
                     "w_gate", "w_up", "w_down"}


def path_to_fqn(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.FlattenedIndexKey):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return ".".join(parts)


def default_filter(fqn: str, leaf: Any) -> bool:
    if not isinstance(leaf, jax.Array) and not hasattr(leaf, "shape"):
        return False
    if isinstance(leaf, QuantizedArray):
        # already quantized → skip, EXCEPT transitional wrappers whose
        # convert step must reach the handler
        return type(leaf).__name__ in (
            "ObservedArray", "QATWeight", "Float8TrainingWeight"
        )
    if leaf.ndim not in (2, 3):
        return False
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    last = fqn.rsplit(".", 1)[-1] if fqn else ""
    return last in _LINEAR_KEY_NAMES


# Leaves at or above this size run their quantize handler under jit: XLA
# fuses the handler's op chain so eager per-op temporaries (several full
# (K, N) f32/i32 buffers each) never coexist in HBM — quantizing an 8B-dim
# model's large leaves eagerly OOMed a 16G chip with the bf16 model
# resident. Small leaves stay eager (no compile cost in tests).
_JIT_HANDLER_MIN_ELEMS = 1 << 20


def _run_handler(handler, leaf, cfg):
    if (
        isinstance(leaf, jax.Array)
        and leaf.size >= _JIT_HANDLER_MIN_ELEMS
    ):
        try:
            return jax.jit(lambda l: handler(l, cfg))(leaf)
        except jax.errors.TracerBoolConversionError:
            pass  # handler branches on values — run it eagerly
    return handler(leaf, cfg)


def quantize_(
    params: Any,
    config: AOBaseConfig,
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
) -> Any:
    """Return a new params pytree with selected weight leaves quantized.

    Despite the reference-parity trailing underscore, this is pure — JAX
    arrays are immutable; the caller rebinds the result.
    """
    filter_fn = filter_fn or default_filter

    def transform(path, leaf):
        fqn = path_to_fqn(path)
        if isinstance(config, FqnToConfig):
            cfg = config.lookup(fqn)
            if cfg is None:
                return leaf
            if not filter_fn(fqn, leaf) and fqn not in config.fqn_to_config:
                return leaf
            handler = get_quantize_handler(cfg)
            return _run_handler(handler, leaf, cfg)
        if not filter_fn(fqn, leaf):
            return leaf
        handler = get_quantize_handler(config)
        return _run_handler(handler, leaf, config)

    return jax.tree_util.tree_map_with_path(
        transform, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )


quantize_params = quantize_  # explicit functional alias
