"""Inference workflow configs — the user API surface.

(ref: torchao/quantization/quant_api.py — Int4WeightOnlyConfig:529,
Int8WeightOnlyConfig:729, Int8DynamicActivationInt8WeightConfig:835,
Int8StaticActivationInt8WeightConfig:945, Float8WeightOnlyConfig:1058,
Float8DynamicActivationFloat8WeightConfig:1139, FqnToConfig:1541.)

Each config has a registered handler ``(weight, config) -> QuantizedArray``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import register_quantize_handler
from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.granularity import (
    Granularity,
    PerAxis,
    PerBlock,
    PerGroup,
    PerRow,
    PerTensor,
    get_block_size,
)
from ao_tpu.quantization.qarrays.common import ActQuantSpec
from ao_tpu.quantization.qarrays.float8 import Float8Array
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.int8 import Int8Array


def _weight_block_size(shape, granularity: Granularity) -> Tuple[int, ...]:
    """Map a granularity onto our (K, N) weight layout.

    "Per-channel/per-row" in reference terms means one scale per *output*
    channel — that's axis -1 (N) here, so the block covers all of K.
    """
    rank = len(shape)
    if isinstance(granularity, PerAxis):
        # explicit axis → faithful mapping (e.g. PerAxis(0) on an embedding
        # table (V, D) = per-row scales, gather-friendly)
        return get_block_size(shape, granularity)
    if isinstance(granularity, PerRow) or granularity is None:
        return (1,) * (rank - 2) + (shape[-2], 1)
    if isinstance(granularity, PerTensor):
        return tuple(shape)
    if isinstance(granularity, PerGroup):
        g = granularity.group_size
        return (1,) * (rank - 2) + (g, 1)
    if isinstance(granularity, PerBlock):
        return get_block_size(shape, granularity)
    raise ValueError(f"unsupported weight granularity {granularity}")


# ---------------------------------------------------------------------------
# int4
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Int4WeightOnlyConfig(AOBaseConfig):
    """(ref: Int4WeightOnlyConfig quant_api.py:529)"""

    group_size: int = 128
    # qparams algorithm: "tinygemm" (float-zp asymmetric) | "hqq" | "minmax_int"
    int4_choose_qparams_algorithm: str = "tinygemm"
    version: int = 1


def _skip_indivisible(weight, group_size, cfg_name):
    """ref parity: quant_api.py:564 skips (with a warning) rather than
    raising when K doesn't divide into groups."""
    if weight.ndim < 2 or weight.shape[-2] % group_size:
        import warnings

        warnings.warn(
            f"{cfg_name}: skipping weight {tuple(weight.shape)} — K not a "
            f"multiple of group_size={group_size}"
        )
        return True
    return False


@register_quantize_handler(Int4WeightOnlyConfig)
def _int4_wo_transform(weight: jax.Array, config: Int4WeightOnlyConfig):
    if _skip_indivisible(weight, config.group_size, "Int4WeightOnlyConfig"):
        return weight
    algo = config.int4_choose_qparams_algorithm
    if algo == "hqq":
        return Int4Array.from_hp(
            weight, group_size=config.group_size, algorithm="hqq",
            zero_point_domain=P.ZeroPointDomain.FLOAT,
        )
    if algo == "tinygemm":
        return Int4Array.from_hp(
            weight, group_size=config.group_size,
            zero_point_domain=P.ZeroPointDomain.FLOAT,
        )
    if algo == "minmax_int":
        return Int4Array.from_hp(
            weight, group_size=config.group_size,
            zero_point_domain=P.ZeroPointDomain.INT,
            mapping_type=P.MappingType.ASYMMETRIC,
        )
    raise ValueError(algo)


@dataclasses.dataclass
class Float8DynamicActivationInt4WeightConfig(AOBaseConfig):
    """fp8 dynamic per-token activations × int4 groupwise weights.
    (ref: Float8DynamicActivationInt4WeightConfig quant_api.py:657 —
    preshuffled f8i4 rowwise gemm; on TPU the activation fp8 cast bounds the
    act dynamic range to the serving-engine contract and the int4 weight
    keeps the HBM win; the dot runs through the int4 kernel path.)"""

    group_size: int = 128
    version: int = 1


@register_quantize_handler(Float8DynamicActivationInt4WeightConfig)
def _fp8_int4_transform(weight, config: Float8DynamicActivationInt4WeightConfig):
    if _skip_indivisible(weight, config.group_size,
                         "Float8DynamicActivationInt4WeightConfig"):
        return weight
    return Int4Array.from_hp(
        weight, group_size=config.group_size,
        zero_point_domain=P.ZeroPointDomain.FLOAT,
        act_quant=ActQuantSpec(dtype="float8_e4m3fn", granularity="per_token"),
    )


@dataclasses.dataclass
class Int8DynamicActivationInt4WeightConfig(AOBaseConfig):
    """int8 dynamic per-token activations × int4 groupwise weights (W4A8).
    (ref: Int8DynamicActivationInt4WeightConfig quant_api.py — the
    CUDA/CPU int8-act int4-weight path; on TPU the fused kernel bitcasts
    the magic int4 bit-planes straight to int8 rows and runs true
    i8×i8→i32 MXU dots, ops/pallas/int4_matmul.py.)"""

    group_size: int = 128
    version: int = 1


@register_quantize_handler(Int8DynamicActivationInt4WeightConfig)
def _int8_int4_transform(weight, config: Int8DynamicActivationInt4WeightConfig):
    if _skip_indivisible(weight, config.group_size,
                         "Int8DynamicActivationInt4WeightConfig"):
        return weight
    return Int4Array.from_hp(
        weight, group_size=config.group_size,
        zero_point_domain=P.ZeroPointDomain.FLOAT,
        act_quant=ActQuantSpec(
            dtype="int8", granularity="per_token", symmetric=True),
    )


# ---------------------------------------------------------------------------
# int8
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Int8WeightOnlyConfig(AOBaseConfig):
    """(ref: Int8WeightOnlyConfig quant_api.py:729)"""

    granularity: Optional[Granularity] = None  # default per-out-channel
    version: int = 1


@register_quantize_handler(Int8WeightOnlyConfig)
def _int8_wo_transform(weight, config: Int8WeightOnlyConfig):
    bs = _weight_block_size(weight.shape, config.granularity)
    return Int8Array.from_hp(weight, bs, P.MappingType.SYMMETRIC)


@dataclasses.dataclass
class Int8DynamicActivationInt8WeightConfig(AOBaseConfig):
    """int8 per-token dynamic activations x int8 per-channel weights.
    (ref: quant_api.py:835)"""

    granularity: Optional[Granularity] = None
    act_symmetric: bool = True
    version: int = 1


@register_quantize_handler(Int8DynamicActivationInt8WeightConfig)
def _int8_dyn_transform(weight, config: Int8DynamicActivationInt8WeightConfig):
    bs = _weight_block_size(weight.shape, config.granularity)
    spec = ActQuantSpec(dtype="int8", symmetric=config.act_symmetric,
                        granularity="per_token")
    return Int8Array.from_hp(weight, bs, P.MappingType.SYMMETRIC, act_quant=spec)


@dataclasses.dataclass
class Int8StaticActivationInt8WeightConfig(AOBaseConfig):
    """Static act scale from calibration. (ref: quant_api.py:945)"""

    act_scale: Optional[float] = None  # per-tensor activation scale
    act_zero_point: Optional[int] = None
    granularity: Optional[Granularity] = None
    version: int = 1


@register_quantize_handler(Int8StaticActivationInt8WeightConfig)
def _int8_static_transform(weight, config: Int8StaticActivationInt8WeightConfig):
    if config.act_scale is None:
        raise ValueError("act_scale required (run calibration first)")
    bs = _weight_block_size(weight.shape, config.granularity)
    return Int8Array.from_hp(
        weight, bs, P.MappingType.SYMMETRIC,
        act_scale=jnp.asarray(config.act_scale, jnp.float32),
        act_zero_point=(
            jnp.asarray(config.act_zero_point, jnp.int32)
            if config.act_zero_point is not None
            else None
        ),
    )


# ---------------------------------------------------------------------------
# float8
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Float8WeightOnlyConfig(AOBaseConfig):
    """(ref: Float8WeightOnlyConfig quant_api.py:1058)"""

    granularity: Optional[Granularity] = None
    float8_dtype: str = "float8_e4m3fn"
    version: int = 1


@register_quantize_handler(Float8WeightOnlyConfig)
def _fp8_wo_transform(weight, config: Float8WeightOnlyConfig):
    bs = _weight_block_size(weight.shape, config.granularity)
    from ao_tpu.quantization.qarrays.common import canon_dtype

    return Float8Array.from_hp(weight, bs, canon_dtype(config.float8_dtype))


@dataclasses.dataclass
class Float8DynamicActivationFloat8WeightConfig(AOBaseConfig):
    """fp8 dynamic act x fp8 weight. granularity:
      * PerRow (default): per-token act scales x per-out-channel weight scales
      * PerTensor: single scales
      * PerBlock((128,128)): deepseek-style 1x128 act + 128x128 weight
    (ref: quant_api.py:1139)"""

    granularity: Optional[Granularity] = None
    float8_dtype: str = "float8_e4m3fn"
    activation_value_lb: Optional[float] = None
    activation_value_ub: Optional[float] = None
    version: int = 1


@register_quantize_handler(Float8DynamicActivationFloat8WeightConfig)
def _fp8_dyn_transform(weight, config: Float8DynamicActivationFloat8WeightConfig):
    from ao_tpu.quantization.qarrays.common import canon_dtype

    g = config.granularity
    if isinstance(g, PerBlock):
        bs = get_block_size(weight.shape, g)
        act_gran = f"per_group:{bs[-2]}"  # 1 x blockK act scales
    elif isinstance(g, PerTensor):
        bs = tuple(weight.shape)
        act_gran = "per_tensor"
    else:  # PerRow / default
        bs = _weight_block_size(weight.shape, PerRow())
        act_gran = "per_token"
    spec = ActQuantSpec(
        dtype=config.float8_dtype,
        granularity=act_gran,
        value_lb=config.activation_value_lb,
        value_ub=config.activation_value_ub,
    )
    return Float8Array.from_hp(
        weight, bs, canon_dtype(config.float8_dtype), act_quant=spec
    )


@dataclasses.dataclass
class Float8StaticActivationFloat8WeightConfig(AOBaseConfig):
    """(ref: prototype/quantization/quant_api.py:223)"""

    act_scale: Optional[float] = None
    granularity: Optional[Granularity] = None
    float8_dtype: str = "float8_e4m3fn"
    version: int = 1


@register_quantize_handler(Float8StaticActivationFloat8WeightConfig)
def _fp8_static_transform(weight, config: Float8StaticActivationFloat8WeightConfig):
    from ao_tpu.quantization.qarrays.common import canon_dtype

    if config.act_scale is None:
        raise ValueError("act_scale required (run calibration first)")
    bs = _weight_block_size(weight.shape, config.granularity)
    return Float8Array.from_hp(
        weight, bs, canon_dtype(config.float8_dtype),
        act_scale=jnp.asarray(config.act_scale, jnp.float32),
    )


# ---------------------------------------------------------------------------
# per-path routing
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FqnToConfig(AOBaseConfig):
    """Route configs per parameter path, with regex support and ``_default``.

    Precedence: exact path > regex match > ``_default``.
    (ref: FqnToConfig quant_api.py:1541, precedence :1636-1727)
    """

    fqn_to_config: Dict[str, Optional[AOBaseConfig]] = dataclasses.field(
        default_factory=dict
    )
    version: int = 1

    def lookup(self, fqn: str) -> Optional[AOBaseConfig]:
        import re

        if fqn in self.fqn_to_config:
            return self.fqn_to_config[fqn]
        for pat, cfg in self.fqn_to_config.items():
            if pat in ("_default",):
                continue
            if pat.startswith("re:") and re.fullmatch(pat[3:], fqn):
                return cfg
        return self.fqn_to_config.get("_default")


ModuleFqnToConfig = FqnToConfig  # BC alias (ref: quant_api.py ModuleFqnToConfig)


# ---------------------------------------------------------------------------
# intx (1..8 bit) and NF4
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class IntxWeightOnlyConfig(AOBaseConfig):
    """int1..8 weight-only, groupwise. (ref: IntxWeightOnlyConfig
    quant_api.py:1391; packed=True uses the TPU bitplane layout in place of
    the reference's CPU/NEON packed formats.)"""

    bit_width: int = 4
    group_size: int = 32
    packed: bool = False
    version: int = 1


@register_quantize_handler(IntxWeightOnlyConfig)
def _intx_wo_transform(weight, config: IntxWeightOnlyConfig):
    from ao_tpu.quantization.qarrays.intx import IntxArray

    return IntxArray.from_hp(
        weight, config.bit_width, config.group_size, packed=config.packed
    )


@dataclasses.dataclass
class Int8DynamicActivationIntxWeightConfig(AOBaseConfig):
    """int8 dynamic act x int1..8 weight. (ref: quant_api.py:351)"""

    bit_width: int = 4
    group_size: int = 32
    packed: bool = False
    version: int = 1


@register_quantize_handler(Int8DynamicActivationIntxWeightConfig)
def _int8_intx_transform(weight, config: Int8DynamicActivationIntxWeightConfig):
    from ao_tpu.quantization.qarrays.intx import IntxArray

    return IntxArray.from_hp(
        weight, config.bit_width, config.group_size, packed=config.packed,
        act_quant=ActQuantSpec(dtype="int8", granularity="per_token"),
    )


@dataclasses.dataclass
class NF4WeightOnlyConfig(AOBaseConfig):
    """4-bit NormalFloat (QLoRA). (ref: nf4_tensor.py ``to_nf4``)"""

    block_size: int = 64
    scaler_block_size: int = 256
    version: int = 1


@register_quantize_handler(NF4WeightOnlyConfig)
def _nf4_transform(weight, config: NF4WeightOnlyConfig):
    from ao_tpu.quantization.qarrays.nf4 import NF4Array

    return NF4Array.from_hp(
        weight, config.block_size, config.scaler_block_size
    )
