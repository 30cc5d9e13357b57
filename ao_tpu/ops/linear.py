"""`ao_tpu.ops.linear` — the single compute entry point for quantized linears.

(ref analog: the per-subclass ``F.linear`` overrides, e.g.
torchao .../int4_tensor.py linear impl, float8_tensor.py:338
``_float8_addmm_impl``, int8_tensor.py:319.)

y = x @ W (+ b), with W either a plain jax array (K, N) or a QuantizedArray.
Kernel selection: each impl consults :mod:`ao_tpu.ops.kernels`, which picks
Pallas on TPU / XLA-native integer dots / emulated dequant+dot.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ao_tpu.ops import kernels
from ao_tpu.ops.act_quant import quantize_activation
from ao_tpu.ops.dispatch import implements, lookup
from ao_tpu.quantization.qarrays.base import QuantizedArray
from ao_tpu.quantization.qarrays.float8 import Float8Array
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.quantization.qarrays.mx import MXArray, to_mx
from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array, nvfp4_quantize


def linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """y[..., n] = sum_k x[..., k] * W[k, n] + b[n]."""
    if isinstance(w, QuantizedArray):
        impl = lookup("linear", type(w))
        return impl(x, w, b)
    from ao_tpu.ops.act_quant import QuantizedActivation

    if isinstance(x, QuantizedActivation):
        # producer-quantized activation meeting an unquantized weight
        # (mixed FqnToConfig): dequantize the int8 act — still one fused
        # multiply on load
        x = (x.qdata.astype(jnp.float32) * x.scale).astype(w.dtype)
    y = jnp.matmul(x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _flatten_batch(x: jax.Array):
    lead = x.shape[:-1]
    return x.reshape(-1, x.shape[-1]), lead


def _unflatten_batch(y: jax.Array, lead):
    return y.reshape(*lead, y.shape[-1])


def _maybe_bias(y, b):
    return y if b is None else y + b.astype(y.dtype)


def zero_cotangents(tree):
    """Zero cotangent pytree for a container: float0 for integer payloads
    (qdata, metadata), plain zeros for the float leaves (scales)."""
    def z(t):
        if hasattr(t, "dtype") and jnp.issubdtype(t.dtype, jnp.inexact):
            return jnp.zeros_like(t)
        if hasattr(t, "shape"):
            return np.zeros(t.shape, jax.dtypes.float0)
        return None
    return jax.tree_util.tree_map(z, tree)


def frozen_weight_ste(impl):
    """Give an inference-container linear impl an explicit backward.

    Inference containers are frozen during training (QLoRA bases, PTQ
    deployments): the forward may route through fused Pallas kernels that
    define no VJP, or through activation rounding whose natural gradient is
    zero. Both would break ``jax.grad`` w.r.t. the ACTIVATIONS — the one
    gradient that must keep flowing so deeper layers/adapters train. The
    backward is the straight-through linear

        dx = (dy @ deq(W)^T) * act_pre_scale,   db = sum(dy)

    (ref analog: nf4_tensor.py:1063 ``LinearNF4.backward`` — grad only to
    the input; torchao's inference subclasses are likewise frozen.) The
    container's own leaves get zero cotangents — training flows that DO
    learn qparams use the training containers (training/{qat,float8,
    quantized_training}.py), which carry their own custom VJPs.
    """

    @jax.custom_vjp
    def f(x, w, b):
        return impl(x, w, b)

    def fwd(x, w, b):
        # dtype carriers as 0-sized arrays: cotangent dtypes must match the
        # primals exactly, and residual leaves must be jax types
        xdt = jnp.zeros((0,), x.dtype)
        bdt = None if b is None else jnp.zeros((0,), b.dtype)
        return impl(x, w, b), (xdt, w, bdt)

    def bwd(res, g):
        xdt, w, bdt = res
        g2 = g.reshape(-1, g.shape[-1])
        wd = w.dequantize(jnp.bfloat16)
        dx2 = jnp.matmul(g2.astype(jnp.bfloat16), wd.T,
                         preferred_element_type=jnp.float32)
        aps = getattr(w, "act_pre_scale", None)
        if aps is not None:
            dx2 = dx2 * aps.astype(dx2.dtype)
        dx = dx2.reshape(*g.shape[:-1], wd.shape[0]).astype(xdt.dtype)
        db = None if bdt is None else g2.sum(0).astype(bdt.dtype)
        return dx, zero_cotangents(w), db

    f.defvjp(fwd, bwd)

    @functools.wraps(impl)
    def wrapped(x, w, b):
        return f(x, w, b)

    return wrapped


# ---------------------------------------------------------------------------
# Int8
# ---------------------------------------------------------------------------


@implements("linear", Int8Array)
@frozen_weight_ste
def _int8_linear(x: jax.Array, w: Int8Array, b):
    from ao_tpu.ops.act_quant import QuantizedActivation

    if isinstance(x, QuantizedActivation):
        # producer-epilogue-quantized activation: skip the standalone
        # quantize chain entirely (ops/pallas/fused_act.py)
        if w.act_pre_scale is not None:
            raise ValueError(
                "producer-quantized activation cannot apply this weight's "
                "act_pre_scale (AWQ/SmoothQuant) — quantize after scaling")
        k = x.qdata.shape[-1]
        qx = x.qdata.reshape(-1, k)
        sx = x.scale.reshape(-1, 1)
        lead = x.qdata.shape[:-1]
        y = kernels.int8_dynamic_matmul(
            qx, sx, None, w.qdata, w.scale, w.zero_point, w.block_size,
            out_dtype=jnp.bfloat16,
        )
        return _unflatten_batch(_maybe_bias(y, b), lead)
    x2, lead = _flatten_batch(x)
    if w.act_pre_scale is not None:
        x2 = x2 * w.act_pre_scale.astype(x2.dtype)
    if w.act_quant is None and w.act_scale is None:
        y = kernels.int8_wo_matmul(x2, w.qdata, w.scale, w.zero_point, w.block_size)
    else:
        if w.act_scale is not None:
            # static (calibrated) per-tensor activation scale
            from ao_tpu.quantization import primitives as P

            bs = tuple(x2.shape)  # per-tensor
            sx = w.act_scale.reshape((1, 1))
            zx = (
                w.act_zero_point.reshape((1, 1))
                if w.act_zero_point is not None
                else None
            )
            qx = P.quantize_affine(x2, bs, sx, zx, -128, 127, jnp.int8)
        else:
            qx, sx, zx = quantize_activation(x2, w.act_quant)
        y = kernels.int8_dynamic_matmul(
            qx, sx, zx, w.qdata, w.scale, w.zero_point, w.block_size,
            out_dtype=x.dtype,
        )
    return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)


# ---------------------------------------------------------------------------
# Int4 (weight-only, groupwise)
# ---------------------------------------------------------------------------


@implements("linear", Int4Array)
@frozen_weight_ste
def _int4_linear(x: jax.Array, w: Int4Array, b):
    from ao_tpu.ops.act_quant import QuantizedActivation

    pre_q = isinstance(x, QuantizedActivation)
    if pre_q:
        if w.act_pre_scale is not None:
            raise ValueError(
                "producer-quantized activation cannot apply this weight's "
                "act_pre_scale (AWQ/SmoothQuant) — quantize after scaling")
        k_in = x.qdata.shape[-1]
        x2, lead = x.qdata.reshape(-1, k_in), x.qdata.shape[:-1]
    else:
        x2, lead = _flatten_batch(x)
    if w.act_pre_scale is not None and not pre_q:
        x2 = x2 * w.act_pre_scale.astype(x2.dtype)
    if w.act_quant is not None:
        if pre_q:
            qx = x2
            sx = x.scale.reshape(-1, 1)
            zx = None
        else:
            qx, sx, zx = quantize_activation(x2, w.act_quant)
        if w.act_quant.dtype == "int8" and x2.shape[0] > 512:
            # Prefill W4A8: ONE native int8 MXU dot (2x bf16 peak) beats
            # both the group-split magic8 kernel (per-group epilogue FMAs,
            # measured 0.89x bf16 at M=2048 4096²) and bf16 dequant (1.0x).
            # The per-GROUP int4 scales can't feed a single int8 dot, so
            # requantize to per-channel int8 on the fly. The per-channel
            # scale comes ANALYTICALLY from the group qparams (|w| over a
            # group's 16 grid points is maxed at an endpoint: max(|b|,
            # |15s+b|)) — no reduction over the dequantized weight, so the
            # whole unpack→dequant→requant chain is one fused pass — the
            # Pallas requant kernel (magic8 layout) measures 1.31x bf16 at
            # M=2048 4096² (274.8us; the XLA fallback chain whose f32
            # dequant materializes measured 1.03x). The extra 8-bit grid
            # error rides ~48dB below the int4 error (20.0dB end-to-end,
            # same as the kernel path).
            from ao_tpu.quantization import primitives as P

            sg = w.scale.astype(jnp.float32)
            if w.zero_point_domain is P.ZeroPointDomain.FLOAT:
                bg = w.zero_point.astype(jnp.float32)
            elif w.zero_point is None:
                bg = -8.0 * sg
            else:
                bg = -(8.0 + w.zero_point.astype(jnp.float32)) * sg
            bound = jnp.maximum(jnp.abs(bg), jnp.abs(15.0 * sg + bg))
            s8 = jnp.max(bound, axis=0, keepdims=True) / 127.0  # (1, N)
            s8 = jnp.maximum(s8, 1e-12)
            kk = x2.shape[1]
            qw8 = None
            if w.layout == "magic8" and kernels._use_pallas():
                from ao_tpu.ops.pallas import UnsupportedShape

                try:
                    from ao_tpu.ops.pallas.int4_matmul import (
                        int4_magic8_requant_int8_pallas,
                    )

                    qw8 = int4_magic8_requant_int8_pallas(
                        w.qdata, sg, bg, s8, w.group_size)
                except (ImportError, UnsupportedShape):
                    qw8 = None
            if qw8 is None:
                w_dq = w.dequantize(jnp.float32)
                qw8 = jnp.clip(jnp.round(w_dq / s8), -127,
                               127).astype(jnp.int8)
            y = kernels.int8_dynamic_matmul(
                qx, sx, zx, qw8, s8, None, (kk, 1), out_dtype=x.dtype,
            )
            return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)
        if (w.act_quant.dtype == "int8" and zx is None
                and w.layout == "magic8" and kernels._use_pallas()):
            # TRUE W4A8: i8 activations x magic8 int4 planes on the int8
            # MXU (exact integer core; per-token scale in the epilogue)
            from ao_tpu.ops.pallas import UnsupportedShape

            try:
                from ao_tpu.ops.pallas.int4_matmul import (
                    int4_w4a8_matmul_pallas,
                )

                y = int4_w4a8_matmul_pallas(
                    qx, sx, w.qdata, w.scale, w.zero_point, w.group_size,
                    w.zero_point_domain,
                )
                return _unflatten_batch(
                    _maybe_bias(y.astype(x.dtype), b), lead)
            except (ImportError, UnsupportedShape):
                pass
        # fp8/int8 dynamic activation fallback (ref: f8i4 rowwise gemm,
        # quant_api.py:657): q/dq bounds the activation to the quantized
        # contract; the dot runs the fused bf16 int4 path
        x2 = qx.astype(jnp.float32) * sx
        if zx is not None:
            x2 = x2 - (zx * sx)
        x2 = x2.astype(x.dtype)
    y = kernels.int4_wo_matmul(
        x2, w.qdata, w.scale, w.zero_point, w.group_size, w.zero_point_domain,
        layout=w.layout,
    )
    return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)


# ---------------------------------------------------------------------------
# Float8
# ---------------------------------------------------------------------------


@implements("linear", Float8Array)
@frozen_weight_ste
def _float8_linear(x: jax.Array, w: Float8Array, b):
    x2, lead = _flatten_batch(x)
    if w.act_pre_scale is not None:
        x2 = x2 * w.act_pre_scale.astype(x2.dtype)
    if w.act_scale is not None:
        # static (calibrated) per-tensor activation scale
        sx = w.act_scale.reshape(1, 1).astype(jnp.float32)
        qx = jnp.clip(
            x2.astype(jnp.float32) / sx, -448.0, 448.0
        ).astype(w.qdata.dtype)
        y = kernels.fp8_dynamic_matmul(
            qx, sx, w.qdata, w.scale, w.block_size, out_dtype=x.dtype
        )
    elif w.act_quant is None:
        y = kernels.fp8_wo_matmul(x2, w.qdata, w.scale, w.block_size)
    else:
        qx, sx, _ = quantize_activation(x2, w.act_quant)
        y = kernels.fp8_dynamic_matmul(
            qx, sx, w.qdata, w.scale, w.block_size, out_dtype=x.dtype
        )
    return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)


# ---------------------------------------------------------------------------
# MX (MXFP8/MXFP6/MXFP4)
# ---------------------------------------------------------------------------


@implements("linear", MXArray)
@frozen_weight_ste
def _mx_linear(x: jax.Array, w: MXArray, b):
    """(ref analog: MXTensor mm impls mx_tensor.py; EMULATED-equivalent path:
    both sides dequantize blockwise and the dot runs in bf16 — on TPU the MXU
    is bf16-native, so unlike SM100 there is no native e8m0-scaled mma to
    target; the fused Pallas path folds dequant into the matmul instead.)"""
    x2, lead = _flatten_batch(x)
    if w.act_elem_dtype is not None:
        # dynamic MX quantization of the activation along K (block 32)
        from ao_tpu.quantization.qarrays.fp4 import decode_fp4_e2m1, encode_fp4_e2m1
        from ao_tpu.quantization import primitives as P

        from ao_tpu.quantization.qarrays.mx import e8m0_decode

        bs = (1, 32)
        qx, sx = to_mx(x2, bs, w.act_elem_dtype, w.scale_mode)
        if w.act_elem_dtype == "float4_e2m1fn":
            vx = decode_fp4_e2m1(qx, jnp.float32)
        else:
            vx = qx.astype(jnp.float32)
        x2 = P.apply_blockwise(
            vx, bs, lambda v, s: v * s, e8m0_decode(sx)
        ).astype(x.dtype)
    if (w.elem_dtype == "float4_e2m1fn" and w.layout == "magic"
            and kernels._use_pallas() and x2.shape[0] <= 1024):
        # M gate: see kernels.int4_wo_matmul
        from ao_tpu.ops.pallas import UnsupportedShape

        try:
            from ao_tpu.ops.pallas.fp4_matmul import mxfp4_wo_matmul_pallas

            y = mxfp4_wo_matmul_pallas(x2, w.qdata, w.scale)
            return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)
        except (ImportError, UnsupportedShape):
            pass
    w_dq = w.dequantize(x2.dtype)
    y = jnp.matmul(x2, w_dq)
    return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)


# ---------------------------------------------------------------------------
# NVFP4
# ---------------------------------------------------------------------------


@implements("linear", NVFP4Array)
@frozen_weight_ste
def _nvfp4_linear(x: jax.Array, w: NVFP4Array, b):
    x2, lead = _flatten_batch(x)
    if w.act_quant:
        from ao_tpu.quantization.qarrays.fp4 import decode_fp4_e2m1
        from ao_tpu.quantization import primitives as P

        bs = (1, 16)
        codes, bscale, pts = nvfp4_quantize(
            x2, bs, per_tensor=True,
            fixed_per_tensor_scale=w.act_per_tensor_scale,
        )
        vx = decode_fp4_e2m1(codes, jnp.float32)
        total = bscale.astype(jnp.float32) * (pts if pts is not None else 1.0)
        x2 = P.apply_blockwise(vx, bs, lambda v, s: v * s, total).astype(x.dtype)
    if w.layout == "magic" and kernels._use_pallas() and x2.shape[0] <= 1024:
        # M gate: see kernels.int4_wo_matmul
        from ao_tpu.ops.pallas import UnsupportedShape

        try:
            from ao_tpu.ops.pallas.fp4_matmul import nvfp4_wo_matmul_pallas

            y = nvfp4_wo_matmul_pallas(
                x2, w.qdata, w.scale, w.per_tensor_scale
            )
            return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)
        except (ImportError, UnsupportedShape):
            pass
    w_dq = w.dequantize(x2.dtype)
    y = jnp.matmul(x2, w_dq)
    return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)


# ---------------------------------------------------------------------------
# Intx (1..8 bit) and NF4 — dequant + hp matmul (optionally int8 dyn act)
# ---------------------------------------------------------------------------

from ao_tpu.quantization.qarrays.intx import IntxArray  # noqa: E402
from ao_tpu.quantization.qarrays.nf4 import NF4Array  # noqa: E402


@implements("linear", IntxArray)
@frozen_weight_ste
def _intx_linear(x: jax.Array, w: IntxArray, b):
    x2, lead = _flatten_batch(x)
    if w.act_quant is not None:
        # int8 dyn act x intx weight: integer dot in int32 on the MXU
        qx, sx, zx = quantize_activation(x2, w.act_quant)
        qw = w._unpacked_q()
        if w.scale.shape == (1, qw.shape[-1]):
            y = kernels.int8_dynamic_matmul(
                qx, sx, zx, qw, w.scale, w.zero_point, w.block_size,
                out_dtype=x.dtype,
            )
        else:  # per-group weight scales → dequant path
            x_dq = qx.astype(jnp.float32) * sx
            y = jnp.matmul(x_dq, w.dequantize(jnp.float32)).astype(x.dtype)
    else:
        y = jnp.matmul(x2, w.dequantize(x2.dtype))
    return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)


def try_lut4_linear(x2, word, scalers, codebook, group_size):
    """Shared fused-LUT dispatch for the magic-layout 16-entry-codebook
    containers (NF4, shared/groupwise codebooks). Returns the (M, N) bf16
    product, or None if the pallas backend is off or the shape is
    unsupported (callers fall back to dequant+matmul)."""
    if not kernels._use_pallas() or x2.shape[0] > 1024:
        # M gate: see kernels.int4_wo_matmul
        return None
    from ao_tpu.ops.pallas import UnsupportedShape

    try:
        from ao_tpu.ops.pallas.lut4_matmul import lut4_wo_magic_pallas

        cb = jnp.asarray(codebook)
        if cb.shape[-1] < 16:  # 2/3-bit LUTs: codes never reach the pad
            cb = jnp.pad(cb, [(0, 0)] * (cb.ndim - 1)
                         + [(0, 16 - cb.shape[-1])])
        return lut4_wo_magic_pallas(x2, word, scalers, cb, group_size)
    except (ImportError, UnsupportedShape):
        return None


@implements("linear", NF4Array)
@frozen_weight_ste
def _nf4_linear(x: jax.Array, w: NF4Array, b):
    """(ref: LinearNF4 nf4_tensor.py:1063 dequant + hp matmul; on TPU the
    magic-layout codes instead feed the fused 16-entry-LUT kernel so the
    4-bit checkpoint keeps its HBM-bandwidth win.)"""
    x2, lead = _flatten_batch(x)
    if w.layout == "magic":
        from ao_tpu.quantization.qarrays.nf4 import NF4_CODEBOOK

        y = try_lut4_linear(x2, w.qdata, w._scalers(), NF4_CODEBOOK,
                            w.block_size[0])
        if y is not None:
            return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)
    y = jnp.matmul(x2, w.dequantize(x2.dtype))
    return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)


# ---------------------------------------------------------------------------
# Sparse
# ---------------------------------------------------------------------------

from ao_tpu.sparsity.blocksparse import BlockSparseArray  # noqa: E402
from ao_tpu.sparsity.sparse24 import Sparse24Array, Sparse24Int4Array  # noqa: E402


@implements("linear", Sparse24Int4Array)
@frozen_weight_ste
def _sparse24_int4_linear(x, w, b):
    """Dequant(+decompress) then MXU matmul; the fused metadata-gather
    Pallas kernel is deliberately absent on v5e (2:4 expansion is VPU-bound
    there — PARITY known gaps)."""
    y = x @ w.dequantize(x.dtype)
    return y if b is None else y + b


@implements("linear", Sparse24Array)
@frozen_weight_ste
def _sparse24_linear(x, w: Sparse24Array, b):
    x2, lead = _flatten_batch(x)
    y = jnp.matmul(x2, w.dequantize(x2.dtype))
    return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)


@implements("linear", BlockSparseArray)
@frozen_weight_ste
def _blocksparse_linear(x, w: BlockSparseArray, b):
    x2, lead = _flatten_batch(x)
    backend = kernels.get_backend()
    if backend == "pallas" and kernels.on_tpu():
        # explicit opt-in: the per-block grid loses to the ragged path on
        # current gens (kept for fp8-native/bigger-VMEM gens to retune)
        from ao_tpu.ops.pallas import UnsupportedShape

        try:
            from ao_tpu.ops.pallas.bsr_matmul import bsr_matmul_pallas

            y = bsr_matmul_pallas(x2, w)
            return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)
        except (ImportError, UnsupportedShape):
            pass
    if backend in ("auto", "xla", "pallas"):
        y = w.matmul(x2)
        return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)
    y = jnp.matmul(x2, w.dequantize(x2.dtype))
    return _unflatten_batch(_maybe_bias(y.astype(x.dtype), b), lead)
