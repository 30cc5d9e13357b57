"""Config → transform-handler registry.

(ref: torchao/quantization/transform_module.py:13,19 —
``register_quantize_module_handler`` / ``_QUANTIZE_CONFIG_HANDLER``)

A handler takes ``(weight: jax.Array, config: AOBaseConfig)`` and returns the
replacement leaf (usually a QuantizedArray). Handlers are pure functions over
arrays — there are no modules to mutate in the functional JAX world; the
quantize API walks a params pytree and swaps leaves.
"""

from __future__ import annotations

from typing import Callable, Dict, Type

from ao_tpu.core.config import AOBaseConfig

_QUANTIZE_HANDLERS: Dict[Type[AOBaseConfig], Callable] = {}


def register_quantize_handler(config_cls: Type[AOBaseConfig]):
    """Decorator registering ``fn(weight, config) -> leaf`` for a config type."""

    def deco(fn: Callable):
        _QUANTIZE_HANDLERS[config_cls] = fn
        return fn

    return deco


def get_quantize_handler(config: AOBaseConfig) -> Callable:
    for cls in type(config).__mro__:
        if cls in _QUANTIZE_HANDLERS:
            return _QUANTIZE_HANDLERS[cls]
    raise KeyError(
        f"no quantize handler registered for {type(config).__name__}; "
        f"known: {[c.__name__ for c in _QUANTIZE_HANDLERS]}"
    )
