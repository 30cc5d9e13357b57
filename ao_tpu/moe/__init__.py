"""MoE subsystem: grouped quantized matmuls, expert-parallel quantized
collectives, low-precision MoE training, and a reference MoE layer.

(ref analog: torchao/prototype/moe_training/ — `_grouped_mm` overrides on
Float8Tensor/NVFP4Tensor + `TrainingWeightWrapperBaseTensor`, and
`prototype/moe_training/ep/` quantized all-to-all. TPU-native re-design:
`jax.lax.ragged_dot` carries the grouped GEMM on the MXU, quantized payloads
travel as (qdata, scale) pytrees through `lax.all_to_all` under shard_map.)
"""

from ao_tpu.moe.grouped import grouped_matmul
from ao_tpu.moe.layer import MoEConfig, init_moe_params, moe_forward
from ao_tpu.moe.ep import a2a_dispatch_quantized, a2a_combine_quantized
from ao_tpu.moe.training import fp8_grouped_matmul, mxfp8_grouped_matmul

__all__ = [
    "grouped_matmul",
    "MoEConfig",
    "init_moe_params",
    "moe_forward",
    "a2a_dispatch_quantized",
    "a2a_combine_quantized",
    "fp8_grouped_matmul",
    "mxfp8_grouped_matmul",
]
