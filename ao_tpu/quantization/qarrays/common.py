"""Shared specs for quantized arrays.

Layout convention (TPU-native, differs from the reference on purpose):
linear weights are stored **(in_features, out_features) = (K, N)** — the
natural layout for ``y = x @ W`` on the MXU and the flax kernel convention —
instead of torch's (out, in). Checkpoint importers transpose once at load.
Groupwise quantization therefore groups along axis 0 (the contraction dim).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import jax.numpy as jnp


class KernelPreference(enum.Enum):
    """Which backend computes the hot op for a given quantized array.

    (ref: torchao/quantization/quantize_/common/kernel_preference.py:17 —
    AUTO/TORCH/MSLK/EMULATED; here the backends are Pallas vs plain-XLA vs
    emulated dequant+dot.)
    """

    AUTO = "auto"  # pallas on TPU, XLA elsewhere
    PALLAS = "pallas"
    XLA = "xla"  # jnp ops only (lets XLA fuse dequant into the dot)
    EMULATED = "emulated"  # explicit dequantize() then high-precision dot


@dataclasses.dataclass(frozen=True)
class ActQuantSpec:
    """Static description of how to quantize activations on the fly.

    (ref analog: ``QuantizeTensorToInt8Kwargs`` / ``act_quant_kwargs`` on
    Int8Tensor/Float8Tensor, e.g. torchao .../int8_tensor.py:59)
    """

    dtype: str = "int8"  # "int8" | "float8_e4m3fn" | "float8_e5m2"
    symmetric: bool = True
    # granularity over the activation: "per_token" (one scale per row) or
    # "per_tensor"; blockwise "per_group:<g>" for deepseek-style 1x128
    granularity: str = "per_token"
    value_lb: Optional[float] = None
    value_ub: Optional[float] = None

    def group_size(self) -> Optional[int]:
        if self.granularity.startswith("per_group:"):
            return int(self.granularity.split(":", 1)[1])
        return None


def canon_dtype(name: str):
    return {
        "int8": jnp.int8,
        "int4": jnp.int4,
        "float8_e4m3fn": jnp.float8_e4m3fn,
        "float8_e5m2": jnp.float8_e5m2,
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
    }[name]
