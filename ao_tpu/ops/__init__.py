from ao_tpu.ops.linear import linear
from ao_tpu.ops.act_quant import (
    QuantizedActivation, gelu_quant, norm_modulate_quant, quantize_activation,
    silu_mul_quant,
)
from ao_tpu.ops.attention import quantized_sdpa, sdpa_reference
from ao_tpu.ops.conv import conv2d, conv3d
from ao_tpu.ops.embedding import embedding
from ao_tpu.ops import kernels

__all__ = [
    "linear", "quantize_activation", "kernels", "embedding",
    "quantized_sdpa", "sdpa_reference", "conv2d", "conv3d",
]
