"""MXArray — OCP Microscaling formats (MXFP8 / MXFP6 / MXFP4, e8m0 scales).

(ref: torchao/prototype/mx_formats/mx_tensor.py:510 ``MXTensor``; ``to_mx``
:214 with FLOOR/RCEIL scale modes, ``to_dtype`` :431. TPU re-design: e8m0
scales are stored as their biased-exponent **uint8 byte** with
rank-preserved reduced shape — bit-identical to the OCP e8m0 encoding, but
XLA:TPU cannot compile the ``float8_e8m0fnu`` element type, and the uint8
view is what collectives/serialization want anyway (the reference also
views e8m0 as uint8 for comms, mx_tensor.py:1004). Decode is
``exp2(byte - 127)`` (:func:`e8m0_decode`). No "swizzled"/to_blocked
layout, which is a CUDA-tensor-core artifact; Pallas tiles read the scale
rows directly.)

Element dtypes:
  * float8_e4m3fn / float8_e5m2 — native fp8 arrays
  * float4_e2m1fn — packed 2-codes-per-byte (group-local layout, g=32)
  * float6_e2m3 / float6_e3m2 — values snapped to the fp6 grid and stored
    PACKED: 6-bit codes, 4 values per 3 bytes along the block dim
    (qarrays/fp6.py) — 0.75x fp8 checkpoint bytes, OCP-spec numerics
Block size: 32 along the contraction dim (per OCP MX spec).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.qarrays.fp4 import (
    F4_E2M1_MAX,
    decode_fp4_e2m1,
    encode_fp4_e2m1,
    pack_fp4,
    unpack_fp4,
)

MX_BLOCK = 32


def e8m0_decode(scale_u8: jax.Array) -> jax.Array:
    """Biased-exponent uint8 (the e8m0 byte) -> f32 power-of-two scale."""
    return jnp.exp2(scale_u8.astype(jnp.float32) - 127.0)

_ELEM_MAX = {
    "float8_e4m3fn": 448.0,
    "float8_e5m2": 57344.0,
    "float6_e2m3": 7.5,
    "float6_e3m2": 28.0,
    "float4_e2m1fn": F4_E2M1_MAX,
}

# largest power of two <= elem max (ref: F8E4M3_MAX_POW2 etc., mx constants)
_ELEM_MAX_POW2 = {
    "float8_e4m3fn": 8,
    "float8_e5m2": 15,
    "float6_e2m3": 2,
    "float6_e3m2": 4,
    "float4_e2m1fn": 2,
}


def _snap_fp6(x: jax.Array, elem_dtype: str) -> jax.Array:
    """Round to the fp6 grid (e2m3 or e3m2) in f32."""
    # fp6 layout: 1 sign + {2 exp, 3 mant} (e2m3) or {3 exp, 2 mant} (e3m2)
    mant = 3 if elem_dtype == "float6_e2m3" else 2
    ebits = 2 if elem_dtype == "float6_e2m3" else 3
    bias = 2 ** (ebits - 1) - 1
    mx = _ELEM_MAX[elem_dtype]
    a = jnp.abs(x)
    a = jnp.minimum(a, mx)
    # normals: round mantissa at 2^floor(log2 a); below min_normal the same
    # formula yields the correct subnormal step min_normal * 2^-mant
    min_normal = 2.0 ** (1 - bias)  # e2m3: 1.0, e3m2: 0.25
    e = jnp.floor(jnp.log2(jnp.maximum(a, min_normal)))
    step = jnp.exp2(e - mant)
    snapped = jnp.round(a / step) * step
    return jnp.where(x < 0, -snapped, snapped)


def to_mx(
    x: jax.Array,
    block_size: Tuple[int, ...],
    elem_dtype: str = "float8_e4m3fn",
    scale_mode: str = "floor",  # "floor" | "rceil" | "even"
) -> Tuple[jax.Array, jax.Array]:
    """Returns (qdata, e8m0 scale as biased-exponent uint8). (ref: to_mx
    mx_tensor.py:214; rceil matches _to_mx_rceil :109 — round scale up so
    elements never overflow.)"""
    xf = x.astype(jnp.float32)
    amax = P.block_reduce(xf, block_size, "absmax")
    emax = _ELEM_MAX[elem_dtype]

    if scale_mode == "floor":
        shared_exp = jnp.floor(jnp.log2(jnp.maximum(amax, 1e-30)))
        shared_exp = shared_exp - _ELEM_MAX_POW2[elem_dtype]
    elif scale_mode == "even":
        # round-to-even on the exponent (ref ScaleCalculationMode.EVEN)
        shared_exp = jnp.round(jnp.log2(jnp.maximum(amax, 1e-30)))
        shared_exp = shared_exp - _ELEM_MAX_POW2[elem_dtype]
    elif scale_mode == "rceil":
        shared_exp = jnp.ceil(jnp.log2(jnp.maximum(amax / emax, 1e-30)))
    else:
        raise ValueError(scale_mode)
    shared_exp = jnp.clip(shared_exp, -127.0, 127.0)
    scale_e8m0 = (shared_exp + 127.0).astype(jnp.uint8)  # biased e8m0 byte
    scale_f = jnp.exp2(shared_exp)

    def _q(xb, s):
        return jnp.clip(xb / s, -emax, emax)

    v = P.apply_blockwise(xf, block_size, _q, scale_f)

    if elem_dtype in ("float8_e4m3fn", "float8_e5m2"):
        q = v.astype(jnp.dtype(elem_dtype))
    elif elem_dtype == "float4_e2m1fn":
        q = encode_fp4_e2m1(v)  # unpacked codes; caller packs
    else:  # fp6 in e4m3 container
        q = _snap_fp6(v, elem_dtype).astype(jnp.float8_e4m3fn)
    return q, scale_e8m0


@qarray_dataclass
class MXArray(QuantizedArray):
    qdata: jax.Array  # fp8 container or packed fp4 codes (uint8)
    scale: jax.Array  # e8m0 as biased-exponent uint8, rank-preserved shape
    elem_dtype: str = meta(default="float8_e4m3fn")
    block_size: Tuple[int, ...] = meta(default=())
    act_elem_dtype: Optional[str] = meta(default=None)  # dynamic act quant
    scale_mode: str = meta(default="floor")
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(
        cls,
        hp: jax.Array,
        elem_dtype: str = "float8_e4m3fn",
        block_dim: int = -2,
        act_elem_dtype: Optional[str] = None,
        scale_mode: str = "floor",
        dequant_dtype: str = "bfloat16",
    ) -> "MXArray":
        rank = hp.ndim
        block_dim = block_dim % rank
        if hp.shape[block_dim] % MX_BLOCK != 0:
            raise ValueError(
                f"dim {block_dim} of {hp.shape} not divisible by MX block 32"
            )
        block_size = tuple(
            MX_BLOCK if i == block_dim else 1 for i in range(rank)
        )
        q, scale = to_mx(hp, block_size, elem_dtype, scale_mode)
        if elem_dtype in ("float6_e2m3", "float6_e3m2"):
            # packed 6-bit codes: 4 values / 3 bytes along the block dim
            # (0.75x fp8 checkpoint bytes; ref: fp6 packing
            # prototype/mx_formats/kernels.py)
            from ao_tpu.quantization.qarrays.fp6 import encode_fp6, pack_fp6

            q = pack_fp6(
                encode_fp6(q.astype(jnp.float32), elem_dtype), axis=block_dim
            )
        if elem_dtype == "float4_e2m1fn":
            # "magic" int32 word layout feeds the fused Pallas kernel
            # (2-D, K-blocked, K % 128 == 0); otherwise split-half bytes
            if rank == 2 and block_dim == rank - 2 and hp.shape[-2] % 128 == 0:
                from ao_tpu.quantization.qarrays.fp4 import pack_fp4_magic

                q = pack_fp4_magic(q)
            else:
                q = pack_fp4(q, MX_BLOCK, axis=block_dim)
        return cls(
            qdata=q,
            scale=scale,
            elem_dtype=elem_dtype,
            block_size=block_size,
            act_elem_dtype=act_elem_dtype,
            scale_mode=scale_mode,
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    @property
    def layout(self) -> str:
        return "magic" if self.qdata.dtype == jnp.int32 else "halves"

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        if self.elem_dtype == "float4_e2m1fn":
            if self.layout == "magic":
                from ao_tpu.quantization.qarrays.fp4 import unpack_fp4_magic

                codes = unpack_fp4_magic(self.qdata)
            else:
                block_dim = self.block_size.index(MX_BLOCK)
                codes = unpack_fp4(self.qdata, MX_BLOCK, axis=block_dim)
            v = decode_fp4_e2m1(codes, jnp.float32)
        elif self.elem_dtype in ("float6_e2m3", "float6_e3m2"):
            from ao_tpu.quantization.qarrays.fp6 import decode_fp6, unpack_fp6

            block_dim = self.block_size.index(MX_BLOCK)
            if self.qdata.dtype == jnp.uint8:  # packed 6-bit codes
                codes = unpack_fp6(self.qdata, axis=block_dim)
                v = decode_fp6(codes, self.elem_dtype, jnp.float32)
            else:  # legacy e4m3 container
                v = self.qdata.astype(jnp.float32)
        else:
            v = self.qdata.astype(jnp.float32)

        def _dq(vb, s):
            return vb * s

        out = P.apply_blockwise(v, self.block_size, _dq, e8m0_decode(self.scale))
        return out.astype(out_dtype)
