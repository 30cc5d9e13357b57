"""ao_tpu — TPU-native quantization & model-optimization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of pytorch/ao:
quantized array pytrees, Pallas fused dequant+matmul kernels, a
``quantize_``-style config API, PTQ algorithms (HQQ/GPTQ/AWQ/SmoothQuant),
MX/NVFP4 block formats, sparsity, QAT and low-precision training, low-bit
optimizers, and pjit/shard_map distributed composition.
"""

__version__ = "0.1.0"

from ao_tpu.core.config import (
    AOBaseConfig,
    config_from_dict,
    config_from_json,
    config_to_dict,
    config_to_json,
)
from ao_tpu.quantization.configs import (
    Float8DynamicActivationFloat8WeightConfig,
    Float8DynamicActivationInt4WeightConfig,
    Float8StaticActivationFloat8WeightConfig,
    Float8WeightOnlyConfig,
    FqnToConfig,
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt4WeightConfig,
    Int8DynamicActivationInt8WeightConfig,
    Int8DynamicActivationIntxWeightConfig,
    Int8StaticActivationInt8WeightConfig,
    Int8WeightOnlyConfig,
    IntxWeightOnlyConfig,
    ModuleFqnToConfig,
    NF4WeightOnlyConfig,
)
from ao_tpu.quantization.granularity import (
    PerAxis,
    PerBlock,
    PerGroup,
    PerRow,
    PerTensor,
    PerToken,
)
from ao_tpu.quantization.primitives import MappingType, ZeroPointDomain, compute_error
from ao_tpu.quantization.quantize import quantize_, quantize_params
from ao_tpu.algorithms.gptq import GPTQConfig
from ao_tpu.algorithms.awq import AWQConfig
from ao_tpu.algorithms.smoothquant import SmoothQuantConfig
from ao_tpu.algorithms.sinq import SINQConfig
from ao_tpu.algorithms.static_quant import StaticQuantConfig
from ao_tpu.algorithms.spinquant import apply_spinquant
from ao_tpu.algorithms.codebook import CodebookWeightOnlyConfig
from ao_tpu.integrations.gguf import GGUFWeightOnlyConfig
from ao_tpu.integrations.serialization import (
    flatten_quantized_state_dict,
    load_quantized,
    save_quantized,
    unflatten_quantized_state_dict,
)
from ao_tpu.sparsity.configs import (
    BlockSparseWeightConfig,
    SemiSparseWeightConfig,
    Sparse24Int4WeightConfig,
    WandaSparseConfig,
    sparsify_,
)

__all__ = [
    "AOBaseConfig",
    "config_to_dict",
    "config_from_dict",
    "config_to_json",
    "config_from_json",
    "quantize_",
    "quantize_params",
    "compute_error",
    "MappingType",
    "ZeroPointDomain",
    "PerTensor",
    "PerAxis",
    "PerGroup",
    "PerRow",
    "PerToken",
    "PerBlock",
    "Int4WeightOnlyConfig",
    "Int8WeightOnlyConfig",
    "Int8DynamicActivationInt4WeightConfig",
    "Int8DynamicActivationInt8WeightConfig",
    "Int8StaticActivationInt8WeightConfig",
    "Float8WeightOnlyConfig",
    "Float8DynamicActivationFloat8WeightConfig",
    "Float8StaticActivationFloat8WeightConfig",
    "Float8DynamicActivationInt4WeightConfig",
    "IntxWeightOnlyConfig",
    "Int8DynamicActivationIntxWeightConfig",
    "NF4WeightOnlyConfig",
    "FqnToConfig",
    "ModuleFqnToConfig",
    "GPTQConfig",
    "AWQConfig",
    "SmoothQuantConfig",
    "SINQConfig",
    "StaticQuantConfig",
    "apply_spinquant",
    "CodebookWeightOnlyConfig",
    "GGUFWeightOnlyConfig",
    "flatten_quantized_state_dict",
    "unflatten_quantized_state_dict",
    "save_quantized",
    "load_quantized",
    "sparsify_",
    "SemiSparseWeightConfig",
    "Sparse24Int4WeightConfig",
    "BlockSparseWeightConfig",
    "WandaSparseConfig",
]
