"""Contract sweep over EVERY user-facing config: quantize → roundtrip →
eager/jit parity → serde → checkpoint. A new config cannot ship half-wired.

(ref analog: the parametrized TorchAOBasicTestCase/CompileTestCase/
IntegrationTestCase ladder, torchao/testing/utils.py:210-693.)
"""

import jax.numpy as jnp
import pytest

import ao_tpu
from ao_tpu.quantization.configs import (
    Float8DynamicActivationInt4WeightConfig,
    Int8DynamicActivationIntxWeightConfig,
    IntxWeightOnlyConfig,
    NF4WeightOnlyConfig,
)
from ao_tpu.quantization.granularity import PerBlock, PerGroup, PerRow, PerTensor
from ao_tpu.testing import run_config_contract

ONE_STEP = [
    ("int4_tinygemm", ao_tpu.Int4WeightOnlyConfig(group_size=32), 14),
    ("int4_hqq",
     ao_tpu.Int4WeightOnlyConfig(group_size=32,
                                 int4_choose_qparams_algorithm="hqq"), 14),
    ("int4_minmax",
     ao_tpu.Int4WeightOnlyConfig(group_size=32,
                                 int4_choose_qparams_algorithm="minmax_int"),
     14),
    ("int8_wo", ao_tpu.Int8WeightOnlyConfig(), 28),
    ("int8_wo_pertensor",
     ao_tpu.Int8WeightOnlyConfig(granularity=PerTensor()), 22),
    ("int8_wo_group",
     ao_tpu.Int8WeightOnlyConfig(granularity=PerGroup(32)), 28),
    ("w8a8", ao_tpu.Int8DynamicActivationInt8WeightConfig(), 25),
    ("w4a8", ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=32), 13),
    ("fp8_wo", ao_tpu.Float8WeightOnlyConfig(), 25),
    ("fp8_dyn", ao_tpu.Float8DynamicActivationFloat8WeightConfig(), 22),
    ("f8i4", Float8DynamicActivationInt4WeightConfig(group_size=32), 13),
    ("int2_wo", IntxWeightOnlyConfig(bit_width=2, group_size=16), 4),
    ("int3_wo", IntxWeightOnlyConfig(bit_width=3, group_size=32), 9),
    ("int6_wo", IntxWeightOnlyConfig(bit_width=6, group_size=32), 22),
    ("w8a8_int3", Int8DynamicActivationIntxWeightConfig(bit_width=3, group_size=32), 8),
    ("nf4", NF4WeightOnlyConfig(), 14),
    ("sinq", ao_tpu.SINQConfig(group_size=32), 13),
    ("codebook4", ao_tpu.CodebookWeightOnlyConfig(bits=4, scale_block=32), 13),
    ("gguf_q4k", None, 15),  # built below: needs K % 256
    ("semi_sparse", None, 0),  # sparsity drops information: skip sqnr
]


@pytest.mark.parametrize(
    "name,config,bound",
    [(n, c, b) for n, c, b in ONE_STEP if c is not None],
    ids=[n for n, c, _ in ONE_STEP if c is not None],
)
def test_config_contract(name, config, bound):
    run_config_contract(config, min_sqnr=bound)


def test_gguf_contract():
    run_config_contract(ao_tpu.GGUFWeightOnlyConfig(), k=256, min_sqnr=15)


def test_fp8_blockwise_contract():
    run_config_contract(
        ao_tpu.Float8DynamicActivationFloat8WeightConfig(
            granularity=PerBlock((128, 128))),
        k=256, n=128, min_sqnr=20,
    )


def test_mx_nvfp4_contract():
    from ao_tpu.prototype.mx import (
        MXDynamicActivationMXWeightConfig,
        NVFP4WeightOnlyConfig,
    )

    run_config_contract(MXDynamicActivationMXWeightConfig(), min_sqnr=10)
    run_config_contract(NVFP4WeightOnlyConfig(), min_sqnr=10)


def test_two_step_contracts():
    run_config_contract(
        ao_tpu.GPTQConfig(base_config=ao_tpu.Int4WeightOnlyConfig(group_size=32)),
        min_sqnr=13, two_step=True,
    )
    run_config_contract(
        ao_tpu.AWQConfig(base_config=ao_tpu.Int4WeightOnlyConfig(group_size=32)),
        min_sqnr=12, two_step=True,
    )
    run_config_contract(ao_tpu.SmoothQuantConfig(), min_sqnr=20, two_step=True)
