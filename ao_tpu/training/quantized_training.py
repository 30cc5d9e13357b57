"""Quantized training prototypes: int8 stochastic-rounding weights, int8
mixed-precision matmuls, and BitNet b1.58 ternary training.

(ref: torchao/prototype/quantized_training/ —
``Int8QuantizedTrainingLinearWeight`` (stochastic-rounding row-wise int8
master weights), ``Int8MixedPrecisionTrainingConfig`` (int8 dynamic matmuls
with hp master weights), ``BitNetTrainingLinearWeight`` (1.58-bit). TPU
re-design: the int8 master weight is a (qdata, scale) pytree updated by a
pure ``apply_updates_int8_sr`` step — stochastic rounding via
`jax.random`/Pallas `pltpu.stochastic_round` instead of aten overrides —
and the fake-quant paths are `jax.custom_vjp` straight-through linears.)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass


# ---------------------------------------------------------------------------
# int8 stochastic-rounding master weights
# ---------------------------------------------------------------------------


def int8_sr_quantize(
    w: jax.Array, key: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-out-channel symmetric int8 with stochastic rounding.

    E[dequant(q)] == w exactly (SR is unbiased), which is what lets the tiny
    per-step optimizer deltas accumulate instead of being swallowed by
    round-to-nearest (ref: quantized_training/int8.py SR rationale).
    """
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-12) / 127.0
    v = wf / scale
    floor = jnp.floor(v)
    frac = v - floor
    u = jax.random.uniform(key, v.shape)
    q = jnp.clip(floor + (u < frac), -128, 127).astype(jnp.int8)
    return q, scale


@qarray_dataclass
class Int8TrainingWeight(QuantizedArray):
    """int8 master weight for memory-frugal training (ref:
    Int8QuantizedTrainingLinearWeight). Forward dequantizes; the optimizer
    step updates through :func:`apply_updates_int8_sr`."""

    qdata: jax.Array  # int8 (K, N)
    scale: jax.Array  # f32 (1, N)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(cls, hp: jax.Array, key: Optional[jax.Array] = None):
        key = key if key is not None else jax.random.PRNGKey(0)
        q, s = int8_sr_quantize(hp, key)
        return cls(qdata=q, scale=s, _shape=tuple(hp.shape),
                   _dequant_dtype="bfloat16")

    def dequantize(self, output_dtype=None) -> jax.Array:
        out = output_dtype or self.dtype
        return (self.qdata.astype(jnp.float32) * self.scale).astype(out)


def apply_updates_int8_sr(
    w: Int8TrainingWeight, update: jax.Array, key: jax.Array
) -> Int8TrainingWeight:
    """w ← SR-quantize(dequant(w) + update). Pure analog of the reference's
    in-place aten `add_`/`copy_` overrides on the subclass."""
    new = w.dequantize(jnp.float32) + update.astype(jnp.float32)
    q, s = int8_sr_quantize(new, key)
    return w.replace(qdata=q, scale=s)


from ao_tpu.ops.dispatch import implements  # noqa: E402


@implements("linear", Int8TrainingWeight)
def _int8_training_linear(x: jax.Array, w: Int8TrainingWeight, b):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = jnp.matmul(x2, w.dequantize(x2.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.reshape(*lead, y.shape[-1])


# ---------------------------------------------------------------------------
# int8 mixed-precision matmul (hp master weights, int8 compute)
# ---------------------------------------------------------------------------


def _rowwise_int8(x: jax.Array, axis: int):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -128, 127).astype(jnp.int8)
    return q, scale


def _int8_mm(qx, sx, qw, sw):
    acc = jax.lax.dot_general(
        qx, qw, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * sx * sw


@jax.custom_vjp
def int8_mixed_precision_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """y = x @ w with all three gemms (fwd, dgrad, wgrad) in int8 dynamic
    per-row quantization, int32 accumulation on the MXU; master weights and
    grads stay high-precision (ref: Int8MixedPrecisionTrainingConfig)."""
    qx, sx = _rowwise_int8(x, -1)
    qw, sw = _rowwise_int8(w, 0)
    return _int8_mm(qx, sx, qw, sw).astype(x.dtype)


def _i8mp_fwd(x, w):
    return int8_mixed_precision_matmul(x, w), (x, w)


def _i8mp_bwd(res, g):
    x, w = res
    gf = g.astype(jnp.float32)
    qg, sg = _rowwise_int8(gf, -1)
    qwt, swt = _rowwise_int8(w.astype(jnp.float32).T, 0)
    dx = _int8_mm(qg, sg, qwt, swt).astype(x.dtype)
    qxt, sxt = _rowwise_int8(x.astype(jnp.float32).T, -1)
    qg2, sg2 = _rowwise_int8(gf, 0)
    dw = _int8_mm(qxt, sxt, qg2, sg2).astype(w.dtype)
    return dx, dw


int8_mixed_precision_matmul.defvjp(_i8mp_fwd, _i8mp_bwd)


# ---------------------------------------------------------------------------
# BitNet b1.58 (ternary weights, int8 activations)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def bitnet_linear(x: jax.Array, w: jax.Array) -> jax.Array:
    """BitNet b1.58 fake-quant linear with straight-through gradients.

    weight: ternary {-1, 0, 1} · γ with γ = mean|W| (per tensor);
    activation: int8 per-token absmax. (ref:
    prototype/quantized_training BitNetTrainingLinearWeight; arXiv
    2402.17764.)
    """
    return _bitnet_fwd_val(x, w)


def _bitnet_fwd_val(x, w):
    wf = w.astype(jnp.float32)
    gamma = jnp.maximum(jnp.mean(jnp.abs(wf)), 1e-12)
    wq = jnp.clip(jnp.round(wf / gamma), -1, 1)
    xf = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
    xq = jnp.clip(jnp.round(xf * (127.0 / amax)), -128, 127)
    acc = jax.lax.dot_general(
        xq.astype(jnp.int8), wq.astype(jnp.int8),
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (amax / 127.0) * gamma
    return y.astype(x.dtype)


def _bitnet_fwd(x, w):
    return _bitnet_fwd_val(x, w), (x, w)


def _bitnet_bwd(res, g):
    x, w = res
    # straight-through: gradients as if y = x @ w
    gf = g.astype(jnp.float32)
    dx = (gf @ w.astype(jnp.float32).T).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    g2 = gf.reshape(-1, gf.shape[-1])
    dw = (x2.T @ g2).astype(w.dtype)
    return dx, dw


bitnet_linear.defvjp(_bitnet_fwd, _bitnet_bwd)
