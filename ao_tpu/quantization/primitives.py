"""Affine quantization primitives — functional, jit-friendly, blockwise.

TPU-native re-design of the reference's quant math
(ref: torchao/quantization/quant_primitives.py — choose_qparams_affine:1230,
quantize_affine:342, dequantize_affine:725, tinygemm variants:498/1278,
float8 scale:2243/2341, fake-quant STE:1070).

Design notes (differs from the reference on purpose):
  * Everything is a pure function on jax arrays; no in-place mutation.
  * ``block_size`` always has the same rank as the input; scales/zero-points
    keep the reduced shape ``s // b per dim`` (rank preserved) so that
    broadcasting across blocks is a reshape, which XLA fuses for free.
  * No "preserve_zero"/per-op bools scattered around: the three mapping
    types + three zero-point domains span the same scheme lattice.
"""

from __future__ import annotations

import enum
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class MappingType(enum.Enum):
    SYMMETRIC = "symmetric"
    SYMMETRIC_NO_CLIPPING_ERR = "symmetric_no_clipping_err"
    ASYMMETRIC = "asymmetric"


class ZeroPointDomain(enum.Enum):
    INT = "int"  # dq = (q - zp) * scale
    FLOAT = "float"  # tinygemm: dq = (q - mid_point) * scale + zp
    NONE = "none"  # dq = q * scale


# Integer ranges for sub-byte / int dtypes used as *logical* targets.
_DTYPE_RANGES = {
    "int1": (-1, 0),
    "int2": (-2, 1),
    "int3": (-4, 3),
    "int4": (-8, 7),
    "int5": (-16, 15),
    "int6": (-32, 31),
    "int7": (-64, 63),
    "int8": (-128, 127),
    "uint1": (0, 1),
    "uint2": (0, 3),
    "uint3": (0, 7),
    "uint4": (0, 15),
    "uint5": (0, 31),
    "uint6": (0, 63),
    "uint7": (0, 127),
    "uint8": (0, 255),
    "int16": (-(2**15), 2**15 - 1),
    "int32": (-(2**31), 2**31 - 1),
}

_FLOAT8_MAX = {
    "float8_e4m3fn": 448.0,
    "float8_e5m2": 57344.0,
}

EPS = 1.1920928955078125e-07  # float32 machine eps, matches torch.finfo(fp32).eps


def dtype_range(dtype) -> Tuple[int, int]:
    """Return (quant_min, quant_max) for a logical integer dtype name or jnp dtype."""
    name = dtype if isinstance(dtype, str) else jnp.dtype(dtype).name
    if name in _DTYPE_RANGES:
        return _DTYPE_RANGES[name]
    raise ValueError(f"no integer range for dtype {name}")


def float_dtype_max(dtype) -> float:
    name = jnp.dtype(dtype).name
    if name in _FLOAT8_MAX:
        return _FLOAT8_MAX[name]
    return float(jnp.finfo(dtype).max)


# ---------------------------------------------------------------------------
# Blockwise reshaping helpers
# ---------------------------------------------------------------------------


def _check_block(shape: Sequence[int], block_size: Sequence[int]) -> None:
    if len(shape) != len(block_size):
        raise ValueError(f"block_size {block_size} rank != input rank {shape}")
    for s, b in zip(shape, block_size):
        if s % b != 0:
            raise ValueError(f"shape {tuple(shape)} not divisible by block {tuple(block_size)}")


def blocked_shape(shape: Sequence[int], block_size: Sequence[int]) -> Tuple[int, ...]:
    """Interleaved 2N-dim shape: (s0//b0, b0, s1//b1, b1, ...)."""
    out = []
    for s, b in zip(shape, block_size):
        out.extend((s // b, b))
    return tuple(out)


def scale_shape(shape: Sequence[int], block_size: Sequence[int]) -> Tuple[int, ...]:
    return tuple(s // b for s, b in zip(shape, block_size))


def to_blocks(x: jax.Array, block_size: Sequence[int]) -> jax.Array:
    """Reshape to 2N dims so block axes are the odd dims (1, 3, 5, ...)."""
    _check_block(x.shape, block_size)
    return x.reshape(blocked_shape(x.shape, block_size))


def _expand(qparam: jax.Array, rank: int) -> jax.Array:
    """Insert singleton block axes so a scale of shape (s0//b0, ...) broadcasts
    against the 2N-dim blocked view."""
    shape = []
    for d in qparam.shape:
        shape.extend((d, 1))
    return qparam.reshape(shape)


def block_reduce(x: jax.Array, block_size: Sequence[int], op: str) -> jax.Array:
    """Reduce each block to a scalar → result has ``scale_shape``."""
    xb = to_blocks(x, block_size)
    axes = tuple(range(1, xb.ndim, 2))
    if op == "min":
        return jnp.min(xb, axis=axes)
    if op == "max":
        return jnp.max(xb, axis=axes)
    if op == "absmax":
        return jnp.max(jnp.abs(xb), axis=axes)
    if op == "sum":
        return jnp.sum(xb, axis=axes)
    if op == "mean":
        return jnp.mean(xb, axis=axes)
    raise ValueError(op)


def apply_blockwise(x: jax.Array, block_size, fn, *qparams) -> jax.Array:
    """Apply ``fn(x_blocked, *expanded_qparams)`` elementwise over blocks and
    reshape back. Pure reshapes — XLA fuses this into neighbors."""
    xb = to_blocks(x, block_size)
    expanded = [_expand(q, x.ndim) for q in qparams]
    out = fn(xb, *expanded)
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# choose_qparams / quantize / dequantize (integer affine)
# ---------------------------------------------------------------------------


def choose_qparams_affine(
    x: jax.Array,
    mapping_type: MappingType,
    block_size: Sequence[int],
    target_dtype: str = "int8",
    quant_min: Optional[int] = None,
    quant_max: Optional[int] = None,
    eps: float = EPS,
    scale_dtype=jnp.float32,
    zero_point_dtype=jnp.int32,
) -> Tuple[jax.Array, jax.Array]:
    """Blockwise affine qparams. Returns (scale, zero_point) with
    ``scale_shape`` rank-preserved shape.

    (ref: quant_primitives.py:1230 ``choose_qparams_affine``)
    """
    if quant_min is None or quant_max is None:
        qmin, qmax = dtype_range(target_dtype)
        quant_min = qmin if quant_min is None else quant_min
        quant_max = qmax if quant_max is None else quant_max

    x = x.astype(jnp.float32)
    min_val = block_reduce(x, block_size, "min")
    max_val = block_reduce(x, block_size, "max")
    # include zero in the range (preserve_zero), as the reference does for
    # all INT-zero-point schemes
    min_val_neg = jnp.minimum(min_val, 0.0)
    max_val_pos = jnp.maximum(max_val, 0.0)

    if mapping_type in (MappingType.SYMMETRIC, MappingType.SYMMETRIC_NO_CLIPPING_ERR):
        if mapping_type is MappingType.SYMMETRIC:
            amax = jnp.maximum(-min_val_neg, max_val_pos)
            scale = amax / ((quant_max - quant_min) / 2.0)
        else:
            # scale chosen so that neither end clips
            # (ref: MappingType.SYMMETRIC_NO_CLIPPING_ERR, quant_primitives.py:55)
            smin = jnp.where(quant_min != 0, min_val_neg / quant_min, 0.0)
            smax = jnp.where(quant_max != 0, max_val_pos / quant_max, 0.0)
            scale = jnp.maximum(smin, smax)
        scale = jnp.maximum(scale, eps)
        mid = (quant_max + quant_min + 1) // 2
        zero_point = jnp.full(scale.shape, mid, dtype=zero_point_dtype)
    elif mapping_type is MappingType.ASYMMETRIC:
        scale = (max_val_pos - min_val_neg) / float(quant_max - quant_min)
        scale = jnp.maximum(scale, eps)
        zero_point = quant_min - jnp.round(min_val_neg / scale)
        zero_point = jnp.clip(zero_point, quant_min, quant_max).astype(zero_point_dtype)
    else:
        raise ValueError(mapping_type)
    return scale.astype(scale_dtype), zero_point


def quantize_affine(
    x: jax.Array,
    block_size: Sequence[int],
    scale: jax.Array,
    zero_point: Optional[jax.Array] = None,
    quant_min: int = -128,
    quant_max: int = 127,
    output_dtype=jnp.int8,
) -> jax.Array:
    """q = clamp(round(x / scale) + zp).  (ref: quant_primitives.py:342)"""
    x = x.astype(jnp.float32)

    def _q(xb, s, *zp):
        inv = 1.0 / s
        v = jnp.round(xb * inv)
        if zp:
            v = v + zp[0].astype(jnp.float32)
        return jnp.clip(v, quant_min, quant_max)

    qparams = (scale,) if zero_point is None else (scale, zero_point)
    out = apply_blockwise(x, block_size, _q, *qparams)
    return out.astype(output_dtype)


def dequantize_affine(
    q: jax.Array,
    block_size: Sequence[int],
    scale: jax.Array,
    zero_point: Optional[jax.Array] = None,
    output_dtype=jnp.float32,
) -> jax.Array:
    """dq = (q - zp) * scale.  (ref: quant_primitives.py:725)"""

    def _dq(qb, s, *zp):
        v = qb.astype(jnp.float32)
        if zp:
            v = v - zp[0].astype(jnp.float32)
        return v * s.astype(jnp.float32)

    qparams = (scale,) if zero_point is None else (scale, zero_point)
    out = apply_blockwise(q, block_size, _dq, *qparams)
    return out.astype(output_dtype)


# ---------------------------------------------------------------------------
# tinygemm variant: float zero-point domain (int4 weight-only classic layout)
# ---------------------------------------------------------------------------


def choose_qparams_affine_tinygemm(
    x: jax.Array,
    block_size: Sequence[int],
    target_dtype: str = "int4",
    quant_min: Optional[int] = None,
    quant_max: Optional[int] = None,
    eps: float = EPS,
    scale_dtype=jnp.bfloat16,
    zero_point_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Asymmetric qparams with FLOAT zero-point domain:
    dq = (q - mid_point) * scale + zero_point
    (ref: _choose_qparams_affine_tinygemm quant_primitives.py:1278)
    """
    if quant_min is None or quant_max is None:
        qmin, qmax = dtype_range(target_dtype)
        quant_min = qmin if quant_min is None else quant_min
        quant_max = qmax if quant_max is None else quant_max
    x = x.astype(jnp.float32)
    min_val = block_reduce(x, block_size, "min")
    max_val = block_reduce(x, block_size, "max")
    scale = jnp.maximum((max_val - min_val) / float(quant_max - quant_min), eps)
    mid_point = (quant_max + quant_min + 1) / 2.0
    zero_point = min_val + scale * mid_point
    return scale.astype(scale_dtype), zero_point.astype(zero_point_dtype)


def quantize_affine_tinygemm(
    x, block_size, scale, zero_point, quant_min=-8, quant_max=7, output_dtype=jnp.int8
):
    """q = clamp(round((x - (zp - scale*mid)) / scale)).
    (ref: _quantize_affine_tinygemm quant_primitives.py:498)"""
    mid_point = (quant_max + quant_min + 1) / 2.0

    def _q(xb, s, zp):
        s32 = s.astype(jnp.float32)
        min_val = zp.astype(jnp.float32) - s32 * mid_point
        v = jnp.round((xb.astype(jnp.float32) - min_val) / s32) + float(quant_min)
        return jnp.clip(v, quant_min, quant_max)

    out = apply_blockwise(x, block_size, _q, scale, zero_point)
    return out.astype(output_dtype)


def dequantize_affine_tinygemm(
    q, block_size, scale, zero_point, quant_min=-8, quant_max=7, output_dtype=jnp.float32
):
    """dq = (q - mid_point) * scale + zp  with q shifted back to unsigned mid."""
    mid_point = (quant_max + quant_min + 1) / 2.0

    def _dq(qb, s, zp):
        v = qb.astype(jnp.float32) - float(quant_min) - mid_point
        return v * s.astype(jnp.float32) + zp.astype(jnp.float32)

    out = apply_blockwise(q, block_size, _dq, scale, zero_point)
    return out.astype(output_dtype)


# ---------------------------------------------------------------------------
# float8
# ---------------------------------------------------------------------------


def choose_scale_float8(
    x: jax.Array,
    block_size: Sequence[int],
    float8_dtype=jnp.float8_e4m3fn,
    value_lb: Optional[float] = None,
    value_ub: Optional[float] = None,
) -> jax.Array:
    """scale = amax / max_pos with optional lower/upper amax clamps.
    (ref: _choose_scale_float8 quant_primitives.py:2243)"""
    amax = block_reduce(x.astype(jnp.float32), block_size, "absmax")
    if value_lb is not None:
        amax = jnp.maximum(amax, value_lb)
    if value_ub is not None:
        amax = jnp.minimum(amax, value_ub)
    max_pos = float_dtype_max(float8_dtype)
    return jnp.maximum(amax, EPS) / max_pos


def quantize_float8(
    x: jax.Array, block_size: Sequence[int], scale: jax.Array, float8_dtype=jnp.float8_e4m3fn
) -> jax.Array:
    """(ref: _quantize_affine_float8 quant_primitives.py:2341)"""
    max_pos = float_dtype_max(float8_dtype)

    def _q(xb, s):
        v = xb.astype(jnp.float32) / s.astype(jnp.float32)
        return jnp.clip(v, -max_pos, max_pos)

    out = apply_blockwise(x, block_size, _q, scale)
    return out.astype(float8_dtype)


def dequantize_float8(
    q: jax.Array, block_size: Sequence[int], scale: jax.Array, output_dtype=jnp.float32
) -> jax.Array:
    def _dq(qb, s):
        return qb.astype(jnp.float32) * s.astype(jnp.float32)

    out = apply_blockwise(q, block_size, _dq, scale)
    return out.astype(output_dtype)


# ---------------------------------------------------------------------------
# fake quantization with straight-through estimator (QAT)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


_ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def fake_quantize_affine(
    x: jax.Array,
    block_size: Sequence[int],
    scale: jax.Array,
    zero_point: Optional[jax.Array] = None,
    quant_min: int = -128,
    quant_max: int = 127,
    zero_point_domain: ZeroPointDomain = ZeroPointDomain.INT,
) -> jax.Array:
    """Quantize→dequantize with straight-through gradients.
    (ref: fake_quantize_affine quant_primitives.py:1070, STE at :1118)"""

    if zero_point_domain is ZeroPointDomain.FLOAT:
        mid_point = (quant_max + quant_min + 1) / 2.0

        def _fq(xb, s, zp):
            s32 = s.astype(jnp.float32)
            min_val = zp.astype(jnp.float32) - s32 * mid_point
            q = _ste_round((xb.astype(jnp.float32) - min_val) / s32) + float(quant_min)
            q = jnp.clip(q, quant_min, quant_max)
            return (q - float(quant_min) - mid_point) * s32 + zp.astype(jnp.float32)

        return apply_blockwise(x, block_size, _fq, scale, zero_point).astype(x.dtype)

    def _fq(xb, s, *zp):
        s32 = s.astype(jnp.float32)
        v = xb.astype(jnp.float32) / s32
        q = _ste_round(v)
        if zp:
            q = q + zp[0].astype(jnp.float32)
        q = jnp.clip(q, quant_min, quant_max)
        if zp:
            q = q - zp[0].astype(jnp.float32)
        return q * s32

    qparams = (scale,) if zero_point is None else (scale, zero_point)
    return apply_blockwise(x, block_size, _fq, *qparams).astype(x.dtype)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def compute_error(ref: jax.Array, actual: jax.Array) -> jax.Array:
    """SQNR in dB — the reference's core numerical-testing metric.
    (ref: torchao/quantization/utils.py:59 ``compute_error``)"""
    ref = ref.astype(jnp.float32)
    actual = actual.astype(jnp.float32)
    num = jnp.linalg.norm(ref)
    den = jnp.linalg.norm(ref - actual)
    return 20.0 * jnp.log10(num / jnp.maximum(den, 1e-20))
