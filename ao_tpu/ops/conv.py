"""Quantized convolutions.

(ref: the reference's fp8 conv2d/3d (float8_tensor.py:528-730, channels-
last-3d mslk kernels) and 4-D conv-weight support in IntxWeightOnlyConfig
(quant_api.py:1391). TPU re-design: convs are compute-bound on the MXU, so
the weight dequantizes once per call and XLA's conv does the work — the
quantization win is checkpoint/HBM residency, exactly like the reference's
weight-only conv configs.)

Layout: NHWC activations, HWIO weights (the XLA-native convention).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ao_tpu.quantization.qarrays.base import QuantizedArray


def conv2d(
    x: jax.Array,
    w,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """x (N, H, W, C_in); w (KH, KW, C_in, C_out) plain or QuantizedArray."""
    if isinstance(w, QuantizedArray):
        w = w.dequantize(x.dtype)
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv3d(
    x: jax.Array,
    w,
    stride: Union[int, Tuple[int, int, int]] = 1,
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """x (N, D, H, W, C_in); w (KD, KH, KW, C_in, C_out)."""
    if isinstance(w, QuantizedArray):
        w = w.dequantize(x.dtype)
    if isinstance(stride, int):
        stride = (stride,) * 3
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose2d(
    x: jax.Array,
    w,
    stride: Union[int, Tuple[int, int]] = 2,
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Transposed conv (upsampling); x (N, H, W, C_in), w (KH, KW, C_in, C_out).

    (ref analog: the ConvTranspose2d upscaling stack in the reference's SAM
    mask-decoder benchmark path, quantized with the same weight-only conv
    configs.)
    """
    if isinstance(w, QuantizedArray):
        w = w.dequantize(x.dtype)
    if isinstance(stride, int):
        stride = (stride, stride)
    y = jax.lax.conv_transpose(
        x, w.astype(x.dtype), strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def quantize_conv_weight(w: jax.Array, config) -> QuantizedArray:
    """Quantize an HWIO/DHWIO conv weight with per-out-channel scales.

    (ref: the conv branches of Float8WeightOnlyConfig / IntxWeightOnlyConfig
    transforms.) Supported configs: Float8WeightOnlyConfig,
    Int8WeightOnlyConfig, IntxWeightOnlyConfig (unpacked).
    """
    import ao_tpu
    from ao_tpu.quantization.configs import IntxWeightOnlyConfig
    from ao_tpu.quantization.qarrays.common import canon_dtype
    from ao_tpu.quantization.qarrays.float8 import Float8Array
    from ao_tpu.quantization.qarrays.int8 import Int8Array
    from ao_tpu.quantization import primitives as P

    block = tuple(w.shape[:-1]) + (1,)  # one scale per output channel
    if isinstance(config, ao_tpu.Float8WeightOnlyConfig):
        return Float8Array.from_hp(w, block, canon_dtype(config.float8_dtype))
    if isinstance(config, ao_tpu.Int8WeightOnlyConfig):
        return Int8Array.from_hp(w, block)
    if isinstance(config, IntxWeightOnlyConfig):
        from ao_tpu.quantization.qarrays.intx import IntxArray

        bits = config.bit_width
        qmin, qmax = P.dtype_range(f"int{bits}")
        scale, zp = P.choose_qparams_affine(
            w, P.MappingType.SYMMETRIC, block, quant_min=qmin, quant_max=qmax
        )
        q = P.quantize_affine(w, block, scale, zp, qmin, qmax, jnp.int8)
        return IntxArray(
            qdata=q, scale=scale, zero_point=None, act_quant=None,
            bits=bits, packed=False, block_size=block, _shape=tuple(w.shape),
            _dequant_dtype="bfloat16",
        )
    if isinstance(config, ao_tpu.Int4WeightOnlyConfig):
        # conv weights quantize per-out-channel at 4 bits through the intx
        # container (the groupwise tinygemm layout is a matmul-K concept;
        # per-channel matches the reference's conv branches)
        from ao_tpu.quantization.qarrays.intx import IntxArray

        qmin, qmax = P.dtype_range("int4")
        scale, zp = P.choose_qparams_affine(
            w, P.MappingType.SYMMETRIC, block, quant_min=qmin, quant_max=qmax
        )
        q = P.quantize_affine(w, block, scale, zp, qmin, qmax, jnp.int8)
        return IntxArray(
            qdata=q, scale=scale, zero_point=None, act_quant=None,
            bits=4, packed=False, block_size=block, _shape=tuple(w.shape),
            _dequant_dtype="bfloat16",
        )
    raise NotImplementedError(f"conv quantization for {type(config).__name__}")
