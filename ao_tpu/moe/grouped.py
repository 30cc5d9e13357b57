"""Grouped (ragged) matmul over stacked expert weights, quantized-aware.

y[t] = x[t] @ W[e(t)]  where e(t) is the expert owning token t; tokens are
pre-sorted by expert and ``group_sizes[e]`` counts tokens per expert.

(ref analog: `torch._grouped_mm` overrides — torchao float8_tensor.py:1085
``_float8_grouped_mm_impl`` and moe_training/tensor.py:52-130. TPU-native:
`jax.lax.ragged_dot` IS the grouped GEMM — XLA tiles it onto the MXU with
int8→int32 / fp8→fp32 native accumulation, so the quantized paths below are
epilogue-scaled ragged dots rather than hand-rolled kernel loops.)

Scale-epilogue trick: for per-expert "rowwise" weight scales (block_size
(1, K, 1) → scale (E, 1, N)) the dot runs on raw qdata and the scale is
applied per-token afterwards by gathering each token's expert scale row:

    y[t, n] = (x @ Wq)[t, n] * scale[e(t), 0, n]

which keeps the weight in its quantized dtype in HBM (the memory win) and
lets XLA fuse the gather+multiply into the ragged-dot epilogue.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ao_tpu.ops.act_quant import quantize_activation
from ao_tpu.ops.dispatch import implements, lookup
from ao_tpu.ops.linear import zero_cotangents
from ao_tpu.quantization.qarrays.base import QuantizedArray
from ao_tpu.quantization.qarrays.float8 import Float8Array
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.quantization.qarrays.mx import MXArray
from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array


def token_expert_ids(group_sizes: jax.Array, total: int) -> jax.Array:
    """(E,) group sizes → (T,) expert id per (sorted) token row."""
    e = group_sizes.shape[0]
    return jnp.repeat(
        jnp.arange(e, dtype=jnp.int32), group_sizes, total_repeat_length=total
    )


def grouped_matmul(
    x: jax.Array, w, group_sizes: jax.Array, out_dtype=None
) -> jax.Array:
    """x (T, K) sorted-by-expert; w (E, K, N) plain or QuantizedArray;
    group_sizes (E,) int32. Returns (T, N)."""
    if isinstance(w, QuantizedArray):
        impl = lookup("grouped_matmul", type(w))
        return impl(x, w, group_sizes, out_dtype)
    y = jax.lax.ragged_dot(
        x, w.astype(x.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype or x.dtype)


def frozen_grouped_ste(impl):
    """Explicit backward for the quantized grouped matmuls: the containers
    are frozen (see ops.linear.frozen_weight_ste — same contract), and the
    fused Pallas grouped kernels / activation rounding would otherwise
    break or zero ``jax.grad`` w.r.t. the token activations. The backward
    is the straight-through ragged linear

        dx[t] = (dy[t] @ deq(W[e(t)])^T) * act_pre_scale
    """

    @functools.wraps(impl)
    def wrapped(x, w, group_sizes, out_dtype=None):
        @jax.custom_vjp
        def f(x, w, gs):
            return impl(x, w, gs, out_dtype)

        def fwd(x, w, gs):
            return f(x, w, gs), (jnp.zeros((0,), x.dtype), w, gs)

        def bwd(res, g):
            xdt, w, gs = res
            wd = w.dequantize(jnp.bfloat16)
            dx = jax.lax.ragged_dot(
                g.astype(jnp.bfloat16), wd.transpose(0, 2, 1), gs,
                preferred_element_type=jnp.float32,
            )
            aps = getattr(w, "act_pre_scale", None)
            if aps is not None:
                dx = dx * aps.astype(dx.dtype)
            return (dx.astype(xdt.dtype), zero_cotangents(w),
                    np.zeros(gs.shape, jax.dtypes.float0))

        f.defvjp(fwd, bwd)
        return f(x, w, group_sizes)

    return wrapped


def _is_per_expert_rowwise(scale_shape, w_shape) -> bool:
    e, _, n = w_shape
    return tuple(scale_shape) == (e, 1, n)


def _epilogue_scale(y, scale, group_sizes):
    """y (T, N) f32; scale (E, 1, N); returns y * scale[e(t)]."""
    ids = token_expert_ids(group_sizes, y.shape[0])
    return y * scale[:, 0, :].astype(y.dtype)[ids]


@implements("grouped_matmul", Int8Array)
@frozen_grouped_ste
def _int8_grouped(x, w: Int8Array, group_sizes, out_dtype):
    out_dtype = out_dtype or x.dtype
    if w.ndim != 3:
        raise ValueError(f"grouped_matmul needs (E, K, N) weights, got {w.shape}")
    if w.act_pre_scale is not None:
        x = x * w.act_pre_scale.astype(x.dtype)
    rowwise = _is_per_expert_rowwise(w.scale.shape, w.shape)
    if rowwise and w.zero_point is None and w.act_quant is None:
        # weight-only: bf16 act x int8 qdata, per-expert scale epilogue
        y = jax.lax.ragged_dot(
            x, w.qdata.astype(x.dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
        return _epilogue_scale(y, w.scale, group_sizes).astype(out_dtype)
    if rowwise and w.zero_point is None and w.act_quant is not None:
        # dynamic int8 act: int8 x int8 → int32 on the MXU
        qx, sx, zx = quantize_activation(x, w.act_quant)
        acc = jax.lax.ragged_dot(
            qx, w.qdata, group_sizes, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        if zx is not None:
            # per-token asymmetric act: correction term -zx * colsum(Wq[e])
            ids = token_expert_ids(group_sizes, acc.shape[0])
            colsum = jnp.sum(
                w.qdata.astype(jnp.int32), axis=1
            ).astype(jnp.float32)  # (E, N)
            acc = acc - zx.reshape(-1, 1).astype(jnp.float32) * colsum[ids]
        y = acc * sx.reshape(-1, 1).astype(jnp.float32)
        return _epilogue_scale(y, w.scale, group_sizes).astype(out_dtype)
    # general fallback: dequantize experts then ragged dot
    y = jax.lax.ragged_dot(
        x, w.dequantize(x.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)


@implements("grouped_matmul", Float8Array)
@frozen_grouped_ste
def _fp8_grouped(x, w: Float8Array, group_sizes, out_dtype):
    out_dtype = out_dtype or x.dtype
    if w.ndim != 3:
        raise ValueError(f"grouped_matmul needs (E, K, N) weights, got {w.shape}")
    if w.act_pre_scale is not None:
        x = x * w.act_pre_scale.astype(x.dtype)
    rowwise = _is_per_expert_rowwise(w.scale.shape, w.shape)
    if rowwise and w.act_quant is None:
        y = jax.lax.ragged_dot(
            x, w.qdata.astype(x.dtype), group_sizes,
            preferred_element_type=jnp.float32,
        )
        return _epilogue_scale(y, w.scale, group_sizes).astype(out_dtype)
    if rowwise and w.act_quant is not None:
        # fp8 act x fp8 weight ragged dot, fp32 accumulation
        qx, sx, _ = quantize_activation(x, w.act_quant)
        acc = jax.lax.ragged_dot(
            qx, w.qdata, group_sizes, preferred_element_type=jnp.float32
        )
        y = acc * sx.reshape(-1, 1).astype(jnp.float32)
        return _epilogue_scale(y, w.scale, group_sizes).astype(out_dtype)
    y = jax.lax.ragged_dot(
        x, w.dequantize(x.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)


@implements("grouped_matmul", Int4Array)
@frozen_grouped_ste
def _int4_grouped(x, w: Int4Array, group_sizes, out_dtype):
    """int4 grouped: magic/magic8 expert stacks take the FUSED grouped
    kernels (ops/pallas/grouped_matmul.py — masked dense-per-expert, the
    packed nibbles stream straight from HBM) at decode token counts; the
    fallback dequantizes before the ragged dot (compute-bound at prefill
    T, where the bf16 MXU path is fine)."""
    out_dtype = out_dtype or x.dtype
    if w.ndim != 3:
        raise ValueError(f"grouped_matmul needs (E, K, N) weights, got {w.shape}")
    if w.act_pre_scale is not None:
        x = x * w.act_pre_scale.astype(x.dtype)

    from ao_tpu.ops import kernels

    t = x.shape[0]
    if kernels._use_pallas() and t <= 256 and w.layout in ("magic", "magic8"):
        from ao_tpu.ops.pallas import UnsupportedShape
        from ao_tpu.ops.pallas import grouped_matmul as gk

        ids = token_expert_ids(group_sizes, t)
        try:
            if (w.layout == "magic8" and w.act_quant is not None
                    and w.act_quant.dtype == "int8"
                    and w.act_quant.symmetric):
                qx, sx, zx = quantize_activation(x, w.act_quant)
                if zx is None:
                    y = gk.int4_grouped_w4a8_pallas(
                        qx, sx, w.qdata, w.scale, w.zero_point, ids,
                        w.group_size, w.zero_point_domain,
                    )
                    return y.astype(out_dtype)
            if w.layout == "magic":
                y = gk.int4_grouped_magic_pallas(
                    x, w.qdata, w.scale, w.zero_point, ids,
                    w.group_size, w.zero_point_domain,
                )
                return y.astype(out_dtype)
        except UnsupportedShape:
            pass

    y = jax.lax.ragged_dot(
        x, w.dequantize(x.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)


@implements("grouped_matmul", MXArray)
@frozen_grouped_ste
def _mx_grouped(x, w: MXArray, group_sizes, out_dtype):
    out_dtype = out_dtype or x.dtype
    y = jax.lax.ragged_dot(
        x, w.dequantize(x.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)


@implements("grouped_matmul", NVFP4Array)
@frozen_grouped_ste
def _nvfp4_grouped(x, w: NVFP4Array, group_sizes, out_dtype):
    out_dtype = out_dtype or x.dtype
    y = jax.lax.ragged_dot(
        x, w.dequantize(x.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype)
