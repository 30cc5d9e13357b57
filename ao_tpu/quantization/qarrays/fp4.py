"""fp4 (e2m1) encode/decode with nibble packing.

(ref analog: the fp4 pack/unpack triton kernels in torchao
prototype/mx_formats/kernels.py and the f4_unpacked/packed conversions in
mx_formats/custom_cast.py. TPU re-design: e2m1 codes are computed
arithmetically from the bit layout — sign(1) exponent(2) mantissa(1) —
so both encode and decode are a handful of VPU ops, no LUT gathers.)

e2m1 value set (positive): 0, 0.5, 1, 1.5, 2, 3, 4, 6.
Packing reuses the group-local split-half scheme from int4 (two codes per
byte, group-aligned for sharding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ao_tpu.quantization.qarrays.int4 import pack_int4, unpack_int4

F4_E2M1_MAX = 6.0


def encode_fp4_e2m1(x: jax.Array) -> jax.Array:
    """f32/bf16 → uint8 4-bit e2m1 codes, values clamped to ±6.

    Round-to-nearest-even is done arithmetically (floor-log2 exponent +
    jnp.round on the mantissa step): XLA:TPU cannot compile the native
    ``float4_e2m1fn`` element type (it aborts the backend), and the
    arithmetic snap is bit-equivalent for every representable input."""
    xf = x.astype(jnp.float32)
    a = jnp.minimum(jnp.abs(xf), F4_E2M1_MAX)
    # e2m1: 1 mantissa bit, exponent bias 1; min normal = 1.0, grid step at
    # exponent e is 2^(e-1); the same formula below 1.0 yields the
    # subnormal step 0.5
    e = jnp.floor(jnp.log2(jnp.maximum(a, 1.0)))
    step = jnp.exp2(e - 1.0)
    snapped = jnp.round(a / step) * step  # jnp.round is RNE
    v = jnp.where(xf < 0, -snapped, snapped)
    v = jnp.where(
        (xf == 0) & jnp.signbit(xf), -0.0, v
    )
    s = (v < 0) | ((v == 0) & (jnp.signbit(v)))
    a = jnp.abs(v)
    # exponent field: a in [0, .5] → subnormal e=0; else e = floor(log2 a)+1
    e = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(a, 0.25))) + 1.0, 0.0, 3.0)
    # mantissa bit: normals a/2^(e-1) in {1, 1.5} → bit = 2(a/2^(e-1) - 1);
    # subnormals (e=0) a in {0, .5} → bit = 2a
    pow2 = jnp.exp2(jnp.maximum(e - 1.0, 0.0))
    mbit = jnp.where(e > 0, (a / pow2 - 1.0) * 2.0, a * 2.0)
    mbit = jnp.clip(jnp.round(mbit), 0.0, 1.0)
    code = (
        s.astype(jnp.uint8) << 3
        | (e.astype(jnp.uint8) << 1)
        | mbit.astype(jnp.uint8)
    )
    return code


def decode_fp4_e2m1(code: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 4-bit e2m1 codes → float. Pure arithmetic (VPU-friendly)."""
    c = code.astype(jnp.int32)
    s = (c >> 3) & 1
    e = (c >> 1) & 3
    m = (c & 1).astype(jnp.float32)
    mag = jnp.where(
        e > 0,
        jnp.exp2((e - 1).astype(jnp.float32)) * (1.0 + 0.5 * m),
        0.5 * m,
    )
    v = jnp.where(s == 1, -mag, mag)
    return v.astype(dtype)


def pack_fp4(codes: jax.Array, group_size: int, axis: int = -2) -> jax.Array:
    return pack_int4(codes, group_size, axis=axis)


def unpack_fp4(packed: jax.Array, group_size: int, axis: int = -2) -> jax.Array:
    return unpack_int4(packed, group_size, axis=axis)


def _remap_fp4_magic(codes: jax.Array) -> jax.Array:
    """Swap the e2m1 em-field 0 <-> 1 (self-inverse, sign preserved).

    The fused kernel (ops/pallas/fp4_matmul.py) reconstructs bf16 values as
    (1 + m/2) * 2^(e-1), which is exact for every nonzero e2m1 value once
    0.5 (em=1) is stored as em=0; the zero codes move to em=1 where one
    bit-test masks them."""
    em = codes & 0x7
    out = jnp.where(em == 0, codes | 1,
                    jnp.where(em == 1, codes & 0xE, codes))
    return out.astype(jnp.uint8)


def pack_fp4_magic(codes: jax.Array) -> jax.Array:
    """e2m1 codes (K, N) uint8 -> int32 (K/8, N) "fp4 magic" words.

    Plane j = logical rows [j*K/4, (j+1)*K/4); word-row r holds the
    remapped codes of plane rows (2r, 2r+1) at bits [4j:4j+4) and
    [16+4j:16+4j+4) (the pltpu.bitcast sublane-doubling order)."""
    k, n = codes.shape
    if k % 8 != 0:
        raise ValueError(f"K={k} must be a multiple of 8")
    rc = _remap_fp4_magic(codes.astype(jnp.int32))
    planes = rc.reshape(4, k // 4, n)
    word = jnp.zeros((k // 8, n), jnp.int32)
    for j in range(4):
        pj = planes[j].reshape(k // 8, 2, n)
        for h in range(2):
            word = word | (pj[:, h].astype(jnp.int32) << (4 * j + 16 * h))
    return word


def unpack_fp4_magic(word: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_fp4_magic`; returns e2m1 codes (K, N) uint8."""
    kw, n = word.shape
    planes = []
    for j in range(4):
        pj = jnp.stack(
            [(word >> (4 * j + 16 * h)) & 0xF for h in range(2)], axis=1
        )  # (K/8, 2, n)
        planes.append(pj.reshape(kw * 2, n))
    rc = jnp.concatenate(planes, axis=0)
    return _remap_fp4_magic(rc)


def pack_nvfp4_scale_pairs(scale_e4m3: jax.Array) -> jax.Array:
    """e4m3 block scales (K/16, N) -> int32 pair-words (K/32, N).

    Word row r holds the BYTES of scale rows (2r, 2r+1) at bits [0:8) and
    [16:24) — the layout the fused NVFP4 kernel consumes directly with one
    masked shift + bitcast (fp4_matmul._nv_kernel). Packed once at
    quantize time so no per-call prep rides the decode path."""
    kb, n = scale_e4m3.shape
    if kb % 2 != 0:
        raise ValueError(f"scale rows {kb} must be even")
    sb = jax.lax.bitcast_convert_type(scale_e4m3, jnp.uint8).astype(jnp.int32)
    return sb[0::2] | (sb[1::2] << 16)


def unpack_nvfp4_scale_pairs(sw: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_nvfp4_scale_pairs` -> e4m3 (K/16, N)."""
    kw, n = sw.shape
    b = jnp.stack([sw & 0xFF, (sw >> 16) & 0xFF], axis=1)  # (K/32, 2, N)
    return jax.lax.bitcast_convert_type(
        b.reshape(2 * kw, n).astype(jnp.uint8), jnp.float8_e4m3fn
    )
