"""Observer-driven static activation quantization (two-step calibration).

(ref: the reference's static flows — Int8StaticActivationInt8WeightConfig
quant_api.py:945 fed by `AffineQuantizedObserverBase` observers
(observer.py:66,141,195,247: MinMax / FixedQParam / MSE). Here the observe
step wraps weights in ObservedArray(kind="static"); calibration forwards
record the activation amax (and a sample batch for the MSE observer);
convert computes the static scale and emits the base static config's
quantized weight with the activation qparams frozen in.)

Usage::

    cfg = StaticQuantConfig(Int8StaticActivationInt8WeightConfig(),
                            observer="mse")
    obs = quantize_(params, dataclasses.replace(cfg, step="observe"))
    for batch in calib:  model(obs, batch)       # eager forwards
    qp = quantize_(obs, dataclasses.replace(cfg, step="convert"))
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import get_quantize_handler, register_quantize_handler
from ao_tpu.algorithms.observe import ObservedArray


def mse_optimal_amax(
    sample: jax.Array, amax: jax.Array, qmax: float, n_grid: int = 40,
    shrink_lo: float = 0.3,
) -> jax.Array:
    """Grid-search the clip value minimizing the q/dq MSE on the sample.

    (ref: MSE observer, observer.py:247 — shrink the minmax range while
    clipping error < rounding error.)
    """
    xf = sample.astype(jnp.float32).reshape(-1)
    ratios = jnp.linspace(shrink_lo, 1.0, n_grid)

    def err(r):
        clip = amax * r
        scale = jnp.maximum(clip, 1e-12) / qmax
        q = jnp.clip(jnp.round(xf / scale), -qmax, qmax)
        return jnp.mean((q * scale - xf) ** 2)

    errs = jax.vmap(err)(ratios)
    return amax * ratios[jnp.argmin(errs)]


@dataclasses.dataclass
class StaticQuantConfig(AOBaseConfig):
    """Two-step wrapper computing static activation scales by observation."""

    base_config: Optional[AOBaseConfig] = None  # a *Static* config
    step: str = "observe"
    observer: str = "minmax"  # "minmax" | "mse"
    version: int = 1


def _qmax_for(base: AOBaseConfig) -> float:
    name = type(base).__name__
    if "Int8" in name:
        return 127.0
    if "Float8" in name:
        return 448.0
    raise NotImplementedError(f"static calibration for {name}")


@register_quantize_handler(StaticQuantConfig)
def _static_transform(weight, config: StaticQuantConfig):
    if config.step == "observe":
        if isinstance(weight, ObservedArray):
            return weight
        return ObservedArray.wrap(weight, "static")
    if config.step == "convert":
        if not isinstance(weight, ObservedArray):
            return weight
        stats = weight.stats
        if stats.amax is None:
            raise ValueError("static convert before any calibration forward")
        qmax = _qmax_for(config.base_config)
        amax = stats.amax
        if config.observer == "mse":
            if stats.sample is None:
                raise ValueError("MSE observer needs a stored sample")
            amax = mse_optimal_amax(stats.sample, amax, qmax)
        base = dataclasses.replace(
            config.base_config, act_scale=float(amax) / qmax
        )
        return get_quantize_handler(base)(weight.weight, base)
    raise ValueError(config.step)
