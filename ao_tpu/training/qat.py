"""QAT — quantization-aware training with straight-through fake quantization.

(ref: torchao/quantization/qat/ — QATConfig api.py:43 with
step="prepare"/"convert"; fake-quantize specs auto-inferred from the PTQ
base config, _infer_fake_quantize_configs fake_quantize_config.py:345.
TPU re-design: prepare wraps weight leaves in ``QATWeight`` whose linear
impl fake-quantizes weight (and optionally activations) with STE gradients
(jax.custom_vjp round); convert unwraps and runs the base PTQ handler on
the learned weights — numerics of the fake-quant path match the eventual
PTQ numerics by construction because both share the same primitives.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import get_quantize_handler, register_quantize_handler
from ao_tpu.ops.dispatch import implements
from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass


@dataclasses.dataclass(frozen=True)
class FakeQuantizeSpec:
    """What to fake-quantize and how. (ref: FakeQuantizeConfig qat/)"""

    kind: str = "int4_tinygemm"  # int4_tinygemm | int8_per_channel | int8_per_token_act | fp8_rowwise
    group_size: int = 128


def infer_fake_quant_specs(base: AOBaseConfig) -> Tuple[Optional[FakeQuantizeSpec], Optional[FakeQuantizeSpec]]:
    """(weight_spec, act_spec) from a PTQ config.
    (ref: _infer_fake_quantize_configs qat/fake_quantize_config.py:345)"""
    from ao_tpu.quantization.configs import (
        Float8DynamicActivationFloat8WeightConfig,
        Int4WeightOnlyConfig,
        Int8DynamicActivationInt8WeightConfig,
        Int8WeightOnlyConfig,
    )

    if isinstance(base, Int4WeightOnlyConfig):
        return FakeQuantizeSpec("int4_tinygemm", base.group_size), None
    if isinstance(base, Int8WeightOnlyConfig):
        return FakeQuantizeSpec("int8_per_channel"), None
    if isinstance(base, Int8DynamicActivationInt8WeightConfig):
        return FakeQuantizeSpec("int8_per_channel"), FakeQuantizeSpec("int8_per_token_act")
    if isinstance(base, Float8DynamicActivationFloat8WeightConfig):
        return FakeQuantizeSpec("fp8_rowwise"), FakeQuantizeSpec("fp8_rowwise")
    raise NotImplementedError(f"QAT for {type(base).__name__}")


def apply_fake_quant(t: jax.Array, spec: FakeQuantizeSpec, is_weight: bool) -> jax.Array:
    """Fake-quantize with STE. Weight layout (K, N); acts (M, K)."""
    if spec.kind == "int4_tinygemm":
        bs = (1,) * (t.ndim - 2) + (spec.group_size, 1)
        s, zp = P.choose_qparams_affine_tinygemm(t, bs, "int4")
        return P.fake_quantize_affine(
            t, bs, s, zp, -8, 7, zero_point_domain=P.ZeroPointDomain.FLOAT
        )
    if spec.kind == "int8_per_channel":
        bs = (1,) * (t.ndim - 2) + (t.shape[-2], 1)
        s, zp = P.choose_qparams_affine(t, P.MappingType.SYMMETRIC, bs, "int8")
        return P.fake_quantize_affine(t, bs, s, None, -128, 127)
    if spec.kind == "int8_per_token_act":
        bs = (1,) * (t.ndim - 1) + (t.shape[-1],)
        s, zp = P.choose_qparams_affine(t, P.MappingType.SYMMETRIC, bs, "int8")
        return P.fake_quantize_affine(t, bs, s, None, -128, 127)
    if spec.kind == "fp8_rowwise":
        if is_weight:
            bs = (1,) * (t.ndim - 2) + (t.shape[-2], 1)
        else:
            bs = (1,) * (t.ndim - 1) + (t.shape[-1],)
        s = P.choose_scale_float8(t, bs, jnp.float8_e4m3fn)
        q = P.quantize_float8(t, bs, s, jnp.float8_e4m3fn)
        dq = P.dequantize_float8(q, bs, s, t.dtype)
        # STE: qdq treated as identity for gradients
        return t + jax.lax.stop_gradient(dq - t)
    raise ValueError(spec.kind)


@qarray_dataclass
class QATWeight(QuantizedArray):
    weight: jax.Array
    weight_spec: FakeQuantizeSpec = meta(default=None)
    act_spec: Optional[FakeQuantizeSpec] = meta(default=None)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def wrap(cls, w, wspec, aspec):
        return cls(weight=w, weight_spec=wspec, act_spec=aspec,
                   _shape=tuple(w.shape), _dequant_dtype=str(w.dtype))

    def dequantize(self, output_dtype=None):
        return apply_fake_quant(self.weight, self.weight_spec, True).astype(
            output_dtype or self.weight.dtype
        )


@implements("linear", QATWeight)
def _qat_linear(x, w: QATWeight, b):
    x2 = x.reshape(-1, x.shape[-1])
    if w.act_spec is not None:
        x2 = apply_fake_quant(x2, w.act_spec, False)
    wq = apply_fake_quant(w.weight, w.weight_spec, True)
    y = jnp.matmul(x2, wq.astype(x2.dtype))
    y = y.reshape(*x.shape[:-1], y.shape[-1])
    return y if b is None else y + b.astype(y.dtype)


@dataclasses.dataclass
class QATConfig(AOBaseConfig):
    """(ref: QATConfig qat/api.py:43)"""

    base_config: Optional[AOBaseConfig] = None
    step: str = "prepare"  # "prepare" | "convert"
    version: int = 1


@register_quantize_handler(QATConfig)
def _qat_transform(weight, config: QATConfig):
    if config.step == "prepare":
        if isinstance(weight, QuantizedArray):
            return weight
        wspec, aspec = infer_fake_quant_specs(config.base_config)
        return QATWeight.wrap(weight, wspec, aspec)
    if config.step == "convert":
        if not isinstance(weight, QATWeight):
            return weight
        handler = get_quantize_handler(config.base_config)
        return handler(weight.weight, config.base_config)
    raise ValueError(config.step)
