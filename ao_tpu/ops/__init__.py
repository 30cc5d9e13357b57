from ao_tpu.ops.linear import linear
from ao_tpu.ops.act_quant import quantize_activation
from ao_tpu.ops import kernels

__all__ = ["linear", "quantize_activation", "kernels"]
