"""AWQ — activation-aware weight quantization via per-channel pre-scales.

(ref: torchao/prototype/awq/{api,core}.py — observer records per-channel
mean |x|; convert grid-searches an exponent α, scales the weight rows by
s = mean|x|^α (normalized), quantizes W·diag(s), and stores 1/s as
``act_pre_scale`` applied to activations inside the linear impl — the
``SupportsActivationPreScaling`` protocol, quantize_/common/protocol.py.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import get_quantize_handler, register_quantize_handler
from ao_tpu.algorithms.observe import ObservedArray


@dataclasses.dataclass
class AWQConfig(AOBaseConfig):
    """(ref: AWQConfig prototype/awq/api.py:33)"""

    base_config: Optional[AOBaseConfig] = None
    step: str = "observe"  # "observe" | "convert"
    scale_search_space_size: int = 10
    version: int = 1


def _search_scales(obs: ObservedArray, config: AWQConfig):
    """Grid-search α minimizing output error on the stored sample batch."""
    w = obs.weight.astype(jnp.float32)  # (K, N)
    mean_abs = obs.stats.abs_sum / max(obs.stats.n, 1)  # (K,)
    mean_abs = jnp.maximum(mean_abs, 1e-8)
    x = obs.stats.sample
    if x is None:
        raise ValueError("AWQ convert before any calibration forward")
    x = x.astype(jnp.float32)
    y_ref = x @ w

    handler = get_quantize_handler(config.base_config)

    best = (None, jnp.inf)
    n_steps = config.scale_search_space_size
    for i in range(n_steps):
        alpha = i / max(n_steps - 1, 1)
        s = mean_abs ** alpha
        s = s / jnp.exp(jnp.mean(jnp.log(s)))  # normalize geometric mean to 1
        s = jnp.maximum(s, 1e-4)
        qw = handler(w * s[:, None], config.base_config)
        w_dq = qw.dequantize(jnp.float32) / s[:, None]
        err = float(jnp.linalg.norm(y_ref - x @ w_dq))
        if err < best[1]:
            best = (s, err)

    s = best[0]
    qw = handler(w * s[:, None], config.base_config)
    if not hasattr(qw, "act_pre_scale"):
        raise TypeError(
            f"{type(qw).__name__} does not support act_pre_scale (AWQ)"
        )
    return qw.replace(
        act_pre_scale=(1.0 / s)[None, :].astype(jnp.bfloat16),
        _shape=tuple(obs.weight.shape),
    )


@register_quantize_handler(AWQConfig)
def _awq_transform(weight, config: AWQConfig):
    if config.step == "observe":
        if isinstance(weight, ObservedArray):
            return weight
        return ObservedArray.wrap(weight, "awq")
    if config.step == "convert":
        if not isinstance(weight, ObservedArray):
            return weight
        return _search_scales(weight, config)
    raise ValueError(config.step)
