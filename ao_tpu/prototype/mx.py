"""MX / NVFP4 inference workflow configs.

(ref: torchao/prototype/mx_formats/inference_workflow.py —
MXDynamicActivationMXWeightConfig:81, NVFP4DynamicActivationNVFP4WeightConfig:174,
NVFP4WeightOnlyConfig:357.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import register_quantize_handler
from ao_tpu.quantization.qarrays.mx import MXArray
from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array


@dataclasses.dataclass
class MXWeightOnlyConfig(AOBaseConfig):
    elem_dtype: str = "float8_e4m3fn"  # fp8/fp6/fp4 element dtypes
    scale_mode: str = "floor"
    version: int = 1


@register_quantize_handler(MXWeightOnlyConfig)
def _mx_wo_transform(weight: jax.Array, config: MXWeightOnlyConfig):
    return MXArray.from_hp(
        weight, elem_dtype=config.elem_dtype, scale_mode=config.scale_mode
    )


@dataclasses.dataclass
class MXDynamicActivationMXWeightConfig(AOBaseConfig):
    """(ref: inference_workflow.py:81) MXFP8/MXFP6/MXFP4 act x weight."""

    activation_dtype: str = "float8_e4m3fn"
    weight_dtype: str = "float8_e4m3fn"
    scale_mode: str = "floor"
    version: int = 1


@register_quantize_handler(MXDynamicActivationMXWeightConfig)
def _mx_dyn_transform(weight: jax.Array, config: MXDynamicActivationMXWeightConfig):
    return MXArray.from_hp(
        weight,
        elem_dtype=config.weight_dtype,
        act_elem_dtype=config.activation_dtype,
        scale_mode=config.scale_mode,
    )


@dataclasses.dataclass
class NVFP4WeightOnlyConfig(AOBaseConfig):
    """(ref: inference_workflow.py:357)"""

    use_per_tensor_scale: bool = True
    version: int = 1


@register_quantize_handler(NVFP4WeightOnlyConfig)
def _nvfp4_wo_transform(weight: jax.Array, config: NVFP4WeightOnlyConfig):
    return NVFP4Array.from_hp(weight, per_tensor=config.use_per_tensor_scale)


@dataclasses.dataclass
class NVFP4DynamicActivationNVFP4WeightConfig(AOBaseConfig):
    """(ref: inference_workflow.py:174)"""

    use_per_tensor_scale: bool = True
    version: int = 1


@register_quantize_handler(NVFP4DynamicActivationNVFP4WeightConfig)
def _nvfp4_dyn_transform(
    weight: jax.Array, config: NVFP4DynamicActivationNVFP4WeightConfig
):
    return NVFP4Array.from_hp(
        weight, per_tensor=config.use_per_tensor_scale, act_quant=True
    )
