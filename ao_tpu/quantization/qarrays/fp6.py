"""fp6 (e2m3 / e3m2) encode/decode with 4-codes-in-3-bytes packing.

(ref analog: the fp6 bitpacking triton kernels in torchao
prototype/mx_formats/kernels.py — pack_uint6 / f6_e2m3 custom casts — and
the floatx containers quant_primitives.py:2182. TPU re-design: codes are
computed arithmetically from the bit layout, packing is three vectorized
shift/or ops along K, so checkpoint bytes are 0.75x fp8 with no LUTs.)

Code layout: sign(1) | exponent | mantissa, 6 bits total:
  e2m3: 1 + 2 + 3, bias 1  — values 0..7.5,  min normal 1.0
  e3m2: 1 + 3 + 2, bias 3  — values 0..28,   min normal 0.25
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FMT = {
    # elem_dtype: (ebits, mbits, bias, max)
    "float6_e2m3": (2, 3, 1, 7.5),
    "float6_e3m2": (3, 2, 3, 28.0),
}


def encode_fp6(x: jax.Array, elem_dtype: str) -> jax.Array:
    """f32 values (already snapped to the fp6 grid) -> uint8 6-bit codes."""
    ebits, mbits, bias, fmax = _FMT[elem_dtype]
    xf = x.astype(jnp.float32)
    s = (xf < 0) | ((xf == 0) & jnp.signbit(xf))
    a = jnp.minimum(jnp.abs(xf), fmax)
    min_normal = 2.0 ** (1 - bias)
    # subnormal floor: values below min_normal get exponent field 0
    e = jnp.clip(
        jnp.floor(jnp.log2(jnp.maximum(a, min_normal / 2.0))) + float(bias),
        0.0, float(2 ** ebits - 1),
    )
    # guard: a in [min_normal/2, min_normal) rounds log2 to bias-1 -> clamp
    e = jnp.where(a < min_normal, 0.0, e)
    pow2 = jnp.exp2(jnp.maximum(e, 1.0) - bias)
    m = jnp.where(
        e > 0,
        (a / pow2 - 1.0) * (2.0 ** mbits),
        a / min_normal * (2.0 ** mbits),
    )
    m = jnp.clip(jnp.round(m), 0.0, 2.0 ** mbits - 1)
    code = (
        s.astype(jnp.uint8) << (ebits + mbits)
        | (e.astype(jnp.uint8) << mbits)
        | m.astype(jnp.uint8)
    )
    return code


def decode_fp6(code: jax.Array, elem_dtype: str, dtype=jnp.float32) -> jax.Array:
    ebits, mbits, bias, _ = _FMT[elem_dtype]
    c = code.astype(jnp.int32)
    s = (c >> (ebits + mbits)) & 1
    e = (c >> mbits) & (2 ** ebits - 1)
    m = (c & (2 ** mbits - 1)).astype(jnp.float32)
    min_normal = 2.0 ** (1 - bias)
    mag = jnp.where(
        e > 0,
        jnp.exp2((e - bias).astype(jnp.float32)) * (1.0 + m / (2.0 ** mbits)),
        min_normal * m / (2.0 ** mbits),
    )
    v = jnp.where(s == 1, -mag, mag)
    return v.astype(dtype)


def pack_fp6(codes: jax.Array, axis: int = -2) -> jax.Array:
    """uint8 6-bit codes -> packed bytes: 4 codes / 3 bytes along ``axis``
    (axis length must be a multiple of 4)."""
    axis = axis % codes.ndim
    k = codes.shape[axis]
    if k % 4 != 0:
        raise ValueError(f"axis length {k} must be a multiple of 4")
    shape = codes.shape
    c = codes.astype(jnp.int32).reshape(
        shape[:axis] + (k // 4, 4) + shape[axis + 1:]
    )
    c0, c1, c2, c3 = (jnp.take(c, i, axis=axis + 1) for i in range(4))
    b0 = (c0 | (c1 << 6)) & 0xFF
    b1 = ((c1 >> 2) | (c2 << 4)) & 0xFF
    b2 = ((c2 >> 4) | (c3 << 2)) & 0xFF
    packed = jnp.stack([b0, b1, b2], axis=axis + 1).astype(jnp.uint8)
    return packed.reshape(shape[:axis] + (3 * k // 4,) + shape[axis + 1:])


def unpack_fp6(packed: jax.Array, axis: int = -2) -> jax.Array:
    """Inverse of :func:`pack_fp6`."""
    axis = axis % packed.ndim
    kb = packed.shape[axis]
    shape = packed.shape
    b = packed.astype(jnp.int32).reshape(
        shape[:axis] + (kb // 3, 3) + shape[axis + 1:]
    )
    b0, b1, b2 = (jnp.take(b, i, axis=axis + 1) for i in range(3))
    c0 = b0 & 0x3F
    c1 = ((b0 >> 6) | (b1 << 2)) & 0x3F
    c2 = ((b1 >> 4) | (b2 << 4)) & 0x3F
    c3 = (b2 >> 2) & 0x3F
    codes = jnp.stack([c0, c1, c2, c3], axis=axis + 1).astype(jnp.uint8)
    return codes.reshape(shape[:axis] + (4 * kb // 3,) + shape[axis + 1:])
