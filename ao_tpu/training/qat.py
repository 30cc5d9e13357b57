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
    """What to fake-quantize and how. (ref: FakeQuantizeConfig qat/)

    kinds: int4_tinygemm | int8_per_channel | int8_per_token_act | intx |
    fp8_rowwise | mx (elem_dtype selects fp8/fp6/fp4) | mx_act | nvfp4.
    ``range_learning`` makes the qparams TRAINABLE leaves on the QATWeight
    with LSQ-style gradients (ref: LearnableFakeQuantize and the
    learned-scale handoff qat/api.py:269-305); supported for
    int4_tinygemm (scale+zp), int8_per_channel / intx / fp8_rowwise
    (scale), and nvfp4 (the fp32 per-tensor scale — block e4m3 scales are
    re-derived from it each step, matching the container's two-level
    scheme)."""

    kind: str = "int4_tinygemm"
    group_size: int = 128
    elem_dtype: str = "float8_e4m3fn"  # for mx kinds
    bits: int = 4  # for intx
    range_learning: bool = False


def infer_fake_quant_specs(base: AOBaseConfig) -> Tuple[Optional[FakeQuantizeSpec], Optional[FakeQuantizeSpec]]:
    """(weight_spec, act_spec) from a PTQ config.
    (ref: _infer_fake_quantize_configs qat/fake_quantize_config.py:345)"""
    from ao_tpu.quantization.configs import (
        Float8DynamicActivationFloat8WeightConfig,
        Float8WeightOnlyConfig,
        Int4WeightOnlyConfig,
        Int8DynamicActivationInt8WeightConfig,
        Int8WeightOnlyConfig,
        IntxWeightOnlyConfig,
    )

    if isinstance(base, Int4WeightOnlyConfig):
        return FakeQuantizeSpec("int4_tinygemm", base.group_size), None
    if isinstance(base, Int8WeightOnlyConfig):
        return FakeQuantizeSpec("int8_per_channel"), None
    if isinstance(base, IntxWeightOnlyConfig):
        return FakeQuantizeSpec("intx", base.group_size,
                                bits=base.bit_width), None
    if isinstance(base, Int8DynamicActivationInt8WeightConfig):
        return FakeQuantizeSpec("int8_per_channel"), FakeQuantizeSpec("int8_per_token_act")
    if isinstance(base, Float8WeightOnlyConfig):
        return FakeQuantizeSpec("fp8_rowwise"), None
    if isinstance(base, Float8DynamicActivationFloat8WeightConfig):
        return FakeQuantizeSpec("fp8_rowwise"), FakeQuantizeSpec("fp8_rowwise")

    from ao_tpu.prototype.mx import (
        MXDynamicActivationMXWeightConfig,
        MXWeightOnlyConfig,
        NVFP4DynamicActivationNVFP4WeightConfig,
        NVFP4WeightOnlyConfig,
    )

    if isinstance(base, MXWeightOnlyConfig):
        return FakeQuantizeSpec("mx", elem_dtype=base.elem_dtype), None
    if isinstance(base, MXDynamicActivationMXWeightConfig):
        return (
            FakeQuantizeSpec("mx", elem_dtype=base.weight_dtype),
            FakeQuantizeSpec("mx_act", elem_dtype=base.activation_dtype),
        )
    if isinstance(base, NVFP4WeightOnlyConfig):
        return FakeQuantizeSpec("nvfp4"), None
    if isinstance(base, NVFP4DynamicActivationNVFP4WeightConfig):
        return FakeQuantizeSpec("nvfp4"), FakeQuantizeSpec("nvfp4")
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
    if spec.kind == "intx":
        bs = (1,) * (t.ndim - 2) + (spec.group_size, 1)
        qmin, qmax = P.dtype_range(f"int{spec.bits}")
        s, _ = P.choose_qparams_affine(
            t, P.MappingType.SYMMETRIC, bs, quant_min=qmin, quant_max=qmax)
        return P.fake_quantize_affine(t, bs, s, None, qmin, qmax)
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
    if spec.kind in ("mx", "mx_act"):
        # MXFP8/6/4 qdq with STE (ref: NVFP4/MX fake-quant,
        # qat/fake_quantize_config.py:345 inferred variants)
        from ao_tpu.quantization.qarrays.fp4 import decode_fp4_e2m1
        from ao_tpu.quantization.qarrays.mx import e8m0_decode, to_mx

        blk_dim = t.ndim - 2 if is_weight else t.ndim - 1
        bs = tuple(32 if i == blk_dim else 1 for i in range(t.ndim))
        q, scale = to_mx(t, bs, spec.elem_dtype, "floor")
        if spec.elem_dtype == "float4_e2m1fn":
            v = decode_fp4_e2m1(q, jnp.float32)
        else:
            v = q.astype(jnp.float32)
        dq = P.apply_blockwise(
            v, bs, lambda vb, s_: vb * s_, e8m0_decode(scale)
        ).astype(t.dtype)
        return t + jax.lax.stop_gradient(dq - t)
    if spec.kind == "nvfp4":
        from ao_tpu.quantization.qarrays.fp4 import decode_fp4_e2m1
        from ao_tpu.quantization.qarrays.nvfp4 import nvfp4_quantize

        blk_dim = t.ndim - 2 if is_weight else t.ndim - 1
        bs = tuple(16 if i == blk_dim else 1 for i in range(t.ndim))
        codes, bscale, pts = nvfp4_quantize(t, bs, per_tensor=True)
        v = decode_fp4_e2m1(codes, jnp.float32)
        total = bscale.astype(jnp.float32) * (pts if pts is not None else 1.0)
        dq = P.apply_blockwise(
            v, bs, lambda vb, s_: vb * s_, total
        ).astype(t.dtype)
        return t + jax.lax.stop_gradient(dq - t)
    raise ValueError(spec.kind)


def init_learned_qparams(w: jax.Array, spec: FakeQuantizeSpec):
    """Initial (scale, zero_point) leaves for range learning."""
    if spec.kind == "int4_tinygemm":
        bs = (1,) * (w.ndim - 2) + (spec.group_size, 1)
        s, zp = P.choose_qparams_affine_tinygemm(w, bs, "int4")
        return s.astype(jnp.float32), zp.astype(jnp.float32)
    if spec.kind == "int8_per_channel":
        bs = (1,) * (w.ndim - 2) + (w.shape[-2], 1)
        s, _ = P.choose_qparams_affine(w, P.MappingType.SYMMETRIC, bs, "int8")
        return s.astype(jnp.float32), None
    if spec.kind == "intx":
        bs = (1,) * (w.ndim - 2) + (spec.group_size, 1)
        qmin, qmax = P.dtype_range(f"int{spec.bits}")
        s, _ = P.choose_qparams_affine(
            w, P.MappingType.SYMMETRIC, bs, quant_min=qmin, quant_max=qmax)
        return s.astype(jnp.float32), None
    if spec.kind == "fp8_rowwise":
        bs = (1,) * (w.ndim - 2) + (w.shape[-2], 1)
        s = P.choose_scale_float8(w, bs, jnp.float8_e4m3fn)
        return s.astype(jnp.float32), None
    if spec.kind == "nvfp4":
        # learned leaf = the fp32 per-tensor scale; e4m3 block scales are
        # re-derived from it every step (two-level, nvfp4_tensor.py:756)
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)))
        pts = jnp.maximum(amax / (448.0 * 6.0), 1e-12)
        return pts.astype(jnp.float32), None
    raise NotImplementedError(f"range learning for {spec.kind}")


def fake_quant_learned(w, scale, zp, spec: FakeQuantizeSpec):
    """Fake-quantize with LEARNED qparams; gradients flow to scale/zp with
    LSQ semantics (stop-gradient on the round only; out-of-range values are
    gated so d(dq)/dscale is the clamped boundary there)."""
    sg = jax.lax.stop_gradient
    if spec.kind == "int4_tinygemm":
        bs = (1,) * (w.ndim - 2) + (spec.group_size, 1)

        def _fq(xb, s, z):
            xb = xb.astype(jnp.float32)
            s = jnp.maximum(s, P.EPS)  # scale stays positive while learned
            v = (xb - z) / s
            r = jnp.round(v)
            inside = (r >= 0.0) & (r <= 15.0)
            u = jnp.where(inside, v + sg(r - v), sg(jnp.clip(r, 0.0, 15.0)))
            return u * s + z

        return P.apply_blockwise(w, bs, _fq, scale, zp).astype(w.dtype)
    if spec.kind == "int8_per_channel":
        bs = (1,) * (w.ndim - 2) + (w.shape[-2], 1)

        def _fq(xb, s):
            xb = xb.astype(jnp.float32)
            s = jnp.maximum(s, P.EPS)
            v = xb / s
            r = jnp.round(v)
            inside = (r >= -128.0) & (r <= 127.0)
            q = jnp.where(inside, v + sg(r - v),
                          sg(jnp.clip(r, -128.0, 127.0)))
            return q * s

        return P.apply_blockwise(w, bs, _fq, scale).astype(w.dtype)
    if spec.kind == "intx":
        bs = (1,) * (w.ndim - 2) + (spec.group_size, 1)
        qmin, qmax = P.dtype_range(f"int{spec.bits}")
        lo, hi = float(qmin), float(qmax)

        def _fq(xb, s):
            xb = xb.astype(jnp.float32)
            s = jnp.maximum(s, P.EPS)
            v = xb / s
            r = jnp.round(v)
            inside = (r >= lo) & (r <= hi)
            q = jnp.where(inside, v + sg(r - v), sg(jnp.clip(r, lo, hi)))
            return q * s

        return P.apply_blockwise(w, bs, _fq, scale).astype(w.dtype)
    if spec.kind == "fp8_rowwise":
        bs = (1,) * (w.ndim - 2) + (w.shape[-2], 1)
        fmax = 448.0  # e4m3 max

        def _fq(xb, s):
            xb = xb.astype(jnp.float32)
            s = jnp.maximum(s, P.EPS)
            v = xb / s
            c = jnp.clip(v, -fmax, fmax)
            r = c.astype(jnp.float8_e4m3fn).astype(jnp.float32)  # grid round
            inside = jnp.abs(v) <= fmax
            q = jnp.where(inside, v + sg(r - v), sg(r))
            return q * s

        return P.apply_blockwise(w, bs, _fq, scale).astype(w.dtype)
    if spec.kind == "nvfp4":
        from ao_tpu.quantization.qarrays.fp4 import (
            decode_fp4_e2m1,
            encode_fp4_e2m1,
        )

        blk = (1,) * (w.ndim - 2) + (16, 1)
        wf = w.astype(jnp.float32)
        pts = jnp.maximum(scale.astype(jnp.float32), 1e-12)
        amax = P.block_reduce(wf, blk, "absmax")
        bs_soft = jnp.clip(amax / 6.0 / pts, 1e-12, 448.0)
        # e4m3 rounding of the block scale with a straight-through delta so
        # d(block_scale)/d(pts) keeps the continuous amax/6/pts path
        bs_r = bs_soft.astype(jnp.float8_e4m3fn).astype(jnp.float32)
        bscale = bs_soft + sg(bs_r - bs_soft)

        def _fq(xb, b_):
            total = b_ * pts
            v = xb / total
            c = jnp.clip(v, -6.0, 6.0)
            r = decode_fp4_e2m1(encode_fp4_e2m1(c), jnp.float32)
            inside = jnp.abs(v) <= 6.0
            q = jnp.where(inside, v + sg(r - v), sg(r))
            return q * total

        return P.apply_blockwise(wf, blk, _fq, bscale).astype(w.dtype)
    raise NotImplementedError(f"range learning for {spec.kind}")


@qarray_dataclass
class QATWeight(QuantizedArray):
    weight: jax.Array
    # learnable qparam LEAVES (range learning): present in the pytree, so
    # optimizers update them alongside the weight
    scale: Optional[jax.Array]
    zero_point: Optional[jax.Array]
    weight_spec: FakeQuantizeSpec = meta(default=None)
    act_spec: Optional[FakeQuantizeSpec] = meta(default=None)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def wrap(cls, w, wspec, aspec):
        s = zp = None
        if wspec is not None and wspec.range_learning:
            s, zp = init_learned_qparams(w, wspec)
        return cls(weight=w, scale=s, zero_point=zp, weight_spec=wspec,
                   act_spec=aspec, _shape=tuple(w.shape),
                   _dequant_dtype=str(w.dtype))

    def fake_quant_weight(self) -> jax.Array:
        if self.scale is not None:
            return fake_quant_learned(
                self.weight, self.scale, self.zero_point, self.weight_spec
            )
        return apply_fake_quant(self.weight, self.weight_spec, True)

    def dequantize(self, output_dtype=None):
        return self.fake_quant_weight().astype(
            output_dtype or self.weight.dtype
        )


@implements("linear", QATWeight)
def _qat_linear(x, w: QATWeight, b):
    x2 = x.reshape(-1, x.shape[-1])
    if w.act_spec is not None:
        x2 = apply_fake_quant(x2, w.act_spec, False)
    wq = w.fake_quant_weight()
    y = jnp.matmul(x2, wq.astype(x2.dtype))
    y = y.reshape(*x.shape[:-1], y.shape[-1])
    return y if b is None else y + b.astype(y.dtype)


@dataclasses.dataclass
class QATConfig(AOBaseConfig):
    """(ref: QATConfig qat/api.py:43; range_learning per
    qat/api.py:269-305 — learned scale/zero-point leaves are handed off
    into the PTQ container at convert instead of re-deriving qparams.)"""

    base_config: Optional[AOBaseConfig] = None
    step: str = "prepare"  # "prepare" | "convert"
    range_learning: bool = False
    version: int = 1


def _convert_learned(w: QATWeight, base) -> QuantizedArray:
    """Build the PTQ container from the LEARNED qparams."""
    from ao_tpu.quantization.configs import (
        Int4WeightOnlyConfig,
        Int8WeightOnlyConfig,
    )

    wt = w.weight.astype(jnp.float32)
    s, zp = w.scale, w.zero_point
    if isinstance(base, Int4WeightOnlyConfig):
        from ao_tpu.quantization.qarrays.int4 import Int4Array, pack_int4, pack_int4_magic

        g = base.group_size
        bs = (1,) * (wt.ndim - 2) + (g, 1)

        def _q(xb, s_, z_):
            return jnp.clip(jnp.round((xb - z_) / s_), 0.0, 15.0)

        u = P.apply_blockwise(wt, bs, _q, s, zp).astype(jnp.uint8)
        k = wt.shape[-2]
        if wt.ndim == 2 and (k // g) % 4 == 0:
            qdata = pack_int4_magic(u, g)
        else:
            qdata = pack_int4(u, g, axis=-2)
        return Int4Array(
            qdata=qdata,
            scale=s.astype(jnp.bfloat16),
            zero_point=zp.astype(jnp.bfloat16),
            act_pre_scale=None,
            block_size=bs,
            zero_point_domain=P.ZeroPointDomain.FLOAT,
            act_quant=None,
            _shape=tuple(wt.shape),
            _dequant_dtype="bfloat16",
        )
    if isinstance(base, Int8WeightOnlyConfig):
        from ao_tpu.quantization.qarrays.int8 import Int8Array

        k = wt.shape[-2]
        bs = (1,) * (wt.ndim - 2) + (k, 1)

        def _q(xb, s_):
            return jnp.clip(jnp.round(xb / s_), -128.0, 127.0)

        q = P.apply_blockwise(wt, bs, _q, s).astype(jnp.int8)
        return Int8Array(
            qdata=q,
            scale=s.astype(jnp.float32),
            zero_point=None,
            act_scale=None,
            act_zero_point=None,
            act_pre_scale=None,
            block_size=bs,
            act_quant=None,
            _shape=tuple(wt.shape),
            _dequant_dtype="bfloat16",
        )

    from ao_tpu.quantization.configs import (
        Float8DynamicActivationFloat8WeightConfig,
        Float8WeightOnlyConfig,
        IntxWeightOnlyConfig,
    )

    if isinstance(base, IntxWeightOnlyConfig):
        from ao_tpu.quantization.qarrays.intx import IntxArray, pack_bitplanes

        g, bits = base.group_size, base.bit_width
        bs = (1,) * (wt.ndim - 2) + (g, 1)
        qmin, qmax = P.dtype_range(f"int{bits}")

        def _q(xb, s_):
            return jnp.clip(jnp.round(xb / s_), float(qmin), float(qmax))

        q = P.apply_blockwise(wt, bs, _q, s).astype(jnp.int8)
        if base.packed:
            u = (q.astype(jnp.int32) - qmin).astype(jnp.uint8)
            qdata = pack_bitplanes(u, bits, axis=-2)
        else:
            qdata = q
        return IntxArray(
            qdata=qdata,
            scale=s.astype(jnp.float32),
            zero_point=None,
            block_size=bs,
            bits=bits,
            packed=base.packed,
            act_quant=None,
            _shape=tuple(wt.shape),
            _dequant_dtype="bfloat16",
        )
    if isinstance(base, (Float8WeightOnlyConfig,
                         Float8DynamicActivationFloat8WeightConfig)):
        # learned spec is rowwise — the container is emitted rowwise even
        # if the base config names another granularity (documented: range
        # learning fixes the qparam layout at prepare time)
        from ao_tpu.quantization.qarrays.common import ActQuantSpec, canon_dtype
        from ao_tpu.quantization.qarrays.float8 import Float8Array

        dt = canon_dtype(base.float8_dtype)
        bs = (1,) * (wt.ndim - 2) + (wt.shape[-2], 1)
        sc = jnp.maximum(s.astype(jnp.float32), P.EPS)
        q = P.quantize_float8(wt, bs, sc, dt)
        act_quant = None
        if isinstance(base, Float8DynamicActivationFloat8WeightConfig):
            act_quant = ActQuantSpec(
                dtype=base.float8_dtype,
                granularity="per_token",
                value_lb=base.activation_value_lb,
                value_ub=base.activation_value_ub,
            )
        return Float8Array(
            qdata=q,
            scale=sc,
            act_scale=None,
            act_pre_scale=None,
            block_size=bs,
            act_quant=act_quant,
            _shape=tuple(wt.shape),
            _dequant_dtype="bfloat16",
        )

    from ao_tpu.prototype.mx import (
        NVFP4DynamicActivationNVFP4WeightConfig,
        NVFP4WeightOnlyConfig,
    )

    if isinstance(base, (NVFP4WeightOnlyConfig,
                         NVFP4DynamicActivationNVFP4WeightConfig)):
        from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array

        return NVFP4Array.from_hp(
            w.weight,
            per_tensor=True,
            act_quant=isinstance(base, NVFP4DynamicActivationNVFP4WeightConfig),
            fixed_per_tensor_scale=jnp.maximum(
                s.astype(jnp.float32), 1e-12),
        )
    raise NotImplementedError(
        f"learned-qparam convert for {type(base).__name__}"
    )


@register_quantize_handler(QATConfig)
def _qat_transform(weight, config: QATConfig):
    if config.step == "prepare":
        if isinstance(weight, QuantizedArray):
            return weight
        wspec, aspec = infer_fake_quant_specs(config.base_config)
        if config.range_learning:
            wspec = dataclasses.replace(wspec, range_learning=True)
        return QATWeight.wrap(weight, wspec, aspec)
    if config.step == "convert":
        if not isinstance(weight, QATWeight):
            return weight
        if weight.scale is not None:
            return _convert_learned(weight, config.base_config)
        handler = get_quantize_handler(config.base_config)
        return handler(weight.weight, config.base_config)
    raise ValueError(config.step)
