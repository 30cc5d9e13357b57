"""SmoothQuant — migrate activation outliers into weights before W8A8.

(ref: torchao/prototype/smoothquant/{api,core}.py — observer records
per-channel max |x|; convert computes s = max|x|^α / max|W|^(1-α), folds
s into the weight (W' = diag(s) W) and 1/s into the activation path via
``act_pre_scale``, then applies the int8 dynamic-activation config.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import get_quantize_handler, register_quantize_handler
from ao_tpu.algorithms.observe import ObservedArray


@dataclasses.dataclass
class SmoothQuantConfig(AOBaseConfig):
    """(ref: SmoothQuantConfig prototype/smoothquant/api.py:35)"""

    base_config: Optional[AOBaseConfig] = None
    step: str = "observe"  # "observe" | "convert"
    alpha: float = 0.5
    version: int = 1


def _convert(obs: ObservedArray, config: SmoothQuantConfig):
    w = obs.weight.astype(jnp.float32)  # (K, N) or (E, K, N) experts
    act_max = obs.stats.abs_max
    if act_max is None:
        raise ValueError("SmoothQuant convert before any calibration forward")
    act_max = jnp.maximum(act_max.astype(jnp.float32), 1e-6)  # (K,)
    # per-K-channel weight max over output (and expert) axes
    red = tuple(i for i in range(w.ndim) if i != w.ndim - 2)
    w_max = jnp.maximum(jnp.max(jnp.abs(w), axis=red), 1e-6)  # (K,)

    a = config.alpha
    # s scales the *activations down* and the weights up:
    # x' = x / s, W' = diag(s) W  (ref core.py smoothing factor)
    s = (act_max ** a) / (w_max ** (1.0 - a))
    s = jnp.maximum(s, 1e-4)

    base = config.base_config
    if base is None:
        from ao_tpu.quantization.configs import (
            Int8DynamicActivationInt8WeightConfig,
        )

        base = Int8DynamicActivationInt8WeightConfig()
    handler = get_quantize_handler(base)
    qw = handler(w * s[:, None], base)
    if not hasattr(qw, "act_pre_scale"):
        raise TypeError(f"{type(qw).__name__} does not support act_pre_scale")
    return qw.replace(
        act_pre_scale=(1.0 / s)[None, :].astype(jnp.bfloat16),
        _shape=tuple(obs.weight.shape),
    )


@register_quantize_handler(SmoothQuantConfig)
def _smoothquant_transform(weight, config: SmoothQuantConfig):
    if config.step == "observe":
        if isinstance(weight, ObservedArray):
            return weight
        return ObservedArray.wrap(weight, "smoothquant")
    if config.step == "convert":
        if not isinstance(weight, ObservedArray):
            return weight
        return _convert(weight, config)
    raise ValueError(config.step)
