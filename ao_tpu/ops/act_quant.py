"""Dynamic activation quantization (on-the-fly, inside the jitted fwd).

(ref: torchao per-token dynamic quant, quantization/utils.py:545 and
``_choose_quant_func_and_quantize_tensor`` float8_tensor.py:338.)
XLA fuses these reductions+casts into neighbors; a fused Pallas variant
exists in ao_tpu.ops.pallas.act_quant for the cases XLA schedules poorly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.common import ActQuantSpec, canon_dtype


from ao_tpu.quantization.qarrays.base import meta, qarray_dataclass


@qarray_dataclass
class QuantizedActivation:
    """A pre-quantized activation (producer-epilogue quantization): qdata
    int8 + per-token scale. `ao_tpu.ops.linear` consumes it directly on
    the int8-dynamic-activation weight paths, skipping the standalone
    quantize chain (see ops/pallas/fused_act.py — the chain's extra HBM
    round-trip was measured to cancel the int8 MXU win on DiT/SAM)."""

    qdata: jax.Array          # (..., K) int8
    scale: jax.Array          # (..., 1) f32 per-token
    dtype_name: str = meta(default="int8")

    @property
    def shape(self):
        return self.qdata.shape

    @property
    def ndim(self):
        return self.qdata.ndim

    @property
    def dtype(self):
        """Logical (dequantized) activation dtype."""
        return jnp.dtype(jnp.bfloat16)


def producer_quant_ok(w) -> bool:
    """True when a weight leaf can consume a producer-quantized activation:
    int8 per-token symmetric dynamic-activation spec and NO act_pre_scale
    (AWQ/SmoothQuant pre-scales must multiply the hp activation BEFORE
    quantization — the producer kernels don't apply them)."""
    aq = getattr(w, "act_quant", None)
    return (aq is not None and aq.dtype == "int8" and aq.symmetric
            and aq.granularity == "per_token"
            and getattr(w, "act_pre_scale", None) is None)


def _xla_row_quant(y):
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    sc = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(y / sc), -127, 127).astype(jnp.int8)
    return q, sc


def norm_modulate_quant(h, shift, smod, eps) -> QuantizedActivation:
    """LN (no affine) + AdaLN modulate + per-token int8 quantize in one
    HBM pass (Pallas on TPU; fused-as-far-as-XLA-goes elsewhere)."""
    from ao_tpu.ops import kernels as _k

    if _k._use_pallas():
        from ao_tpu.ops.pallas import UnsupportedShape
        from ao_tpu.ops.pallas.fused_act import norm_modulate_quant_pallas

        try:
            q, s = norm_modulate_quant_pallas(h, shift, smod, eps)
            return QuantizedActivation(qdata=q, scale=s)
        except UnsupportedShape:
            pass
    xf = h.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + smod[:, None, :].astype(jnp.float32)) + shift[
        :, None, :].astype(jnp.float32)
    q, s = _xla_row_quant(y)
    return QuantizedActivation(qdata=q, scale=s)


def gelu_quant(y) -> QuantizedActivation:
    """tanh-GELU + per-token int8 quantize, one HBM pass."""
    from ao_tpu.ops import kernels as _k

    if _k._use_pallas():
        from ao_tpu.ops.pallas import UnsupportedShape
        from ao_tpu.ops.pallas.fused_act import gelu_quant_pallas

        try:
            q, s = gelu_quant_pallas(y)
            return QuantizedActivation(qdata=q, scale=s)
        except UnsupportedShape:
            pass
    q, s = _xla_row_quant(
        jax.nn.gelu(y.astype(jnp.float32), approximate=True))
    return QuantizedActivation(qdata=q, scale=s)


def silu_mul_quant(a, b, act: str = "silu") -> QuantizedActivation:
    """Gated-MLP product (silu(a)*b SwiGLU, or gelu(a)*b GeGLU with
    ``act="gelu"``) + per-token int8 quantize, one HBM pass."""
    from ao_tpu.ops import kernels as _k

    if _k._use_pallas():
        from ao_tpu.ops.pallas import UnsupportedShape
        from ao_tpu.ops.pallas.fused_act import silu_mul_quant_pallas

        try:
            q, s = silu_mul_quant_pallas(a, b, act=act)
            return QuantizedActivation(qdata=q, scale=s)
        except UnsupportedShape:
            pass
    af = a.astype(jnp.float32)
    gate = (jax.nn.silu(af) if act == "silu"
            else jax.nn.gelu(af, approximate=True))
    q, s = _xla_row_quant(gate * b.astype(jnp.float32))
    return QuantizedActivation(qdata=q, scale=s)


def act_block_size(shape, spec: ActQuantSpec):
    rank = len(shape)
    if spec.granularity == "per_token":
        return (1,) * (rank - 1) + (shape[-1],)
    if spec.granularity == "per_tensor":
        return tuple(shape)
    g = spec.group_size()
    if g is not None:
        return (1,) * (rank - 1) + (g,)
    raise ValueError(spec.granularity)


def quantize_activation(
    x: jax.Array, spec: ActQuantSpec
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Returns (q, scale, zero_point). Scale has rank-preserved reduced shape."""
    bs = act_block_size(x.shape, spec)
    if spec.dtype.startswith("float8"):
        dt = canon_dtype(spec.dtype)
        scale = P.choose_scale_float8(
            x, bs, dt, value_lb=spec.value_lb, value_ub=spec.value_ub
        )
        q = P.quantize_float8(x, bs, scale, dt)
        return q, scale, None
    if spec.dtype == "int8":
        mt = P.MappingType.SYMMETRIC if spec.symmetric else P.MappingType.ASYMMETRIC
        scale, zp = P.choose_qparams_affine(x, mt, bs, target_dtype="int8")
        q = P.quantize_affine(x, bs, scale, zp, -128, 127, jnp.int8)
        if spec.symmetric:
            zp = None
        return q, scale, zp
    raise ValueError(f"unsupported activation dtype {spec.dtype}")
