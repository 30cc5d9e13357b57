"""IntxArray — 1..8-bit integer weights, unpacked (int8 container) or
bitplane-packed.

(ref: torchao .../intx/intx_unpacked_to_int8_tensor.py:48
``IntxUnpackedToInt8Tensor`` and prototype/dtypes/uintx
``UintxBitPackedTensor``; the reference's NEON/packed CPU layouts become a
TPU-friendly *bitplane* packing: 8 consecutive values along K are packed
into ``bits`` bytes, one byte per bit position — pack/unpack are shifts,
masks, and weighted sums only, all VPU-parallel.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.qarrays.common import ActQuantSpec


def pack_bitplanes(u: jax.Array, bits: int, axis: int = -2) -> jax.Array:
    """Pack unsigned values (< 2^bits) along ``axis`` (length % 8 == 0):
    groups of 8 values become ``bits`` bytes (one per bit-plane)."""
    axis = axis % u.ndim
    k = u.shape[axis]
    if k % 8 != 0:
        raise ValueError(f"pack axis {k} must be a multiple of 8")
    shape = u.shape
    ub = u.astype(jnp.int32).reshape(
        shape[:axis] + (k // 8, 8) + shape[axis + 1 :]
    )
    weights = (2 ** jnp.arange(8, dtype=jnp.int32)).reshape(
        (1,) * axis + (1, 8) + (1,) * (u.ndim - axis - 1)
    )
    planes = []
    for b in range(bits):
        bitvals = (ub >> b) & 1
        planes.append(jnp.sum(bitvals * weights, axis=axis + 1))
    packed = jnp.stack(planes, axis=axis + 1)  # (.., k//8, bits, ..)
    return packed.reshape(
        shape[:axis] + (k // 8 * bits,) + shape[axis + 1 :]
    ).astype(jnp.uint8)


def unpack_bitplanes(packed: jax.Array, bits: int, axis: int = -2) -> jax.Array:
    axis = axis % packed.ndim
    kp = packed.shape[axis]
    shape = packed.shape
    pb = packed.astype(jnp.int32).reshape(
        shape[:axis] + (kp // bits, bits) + shape[axis + 1 :]
    )
    vals = 0
    for b in range(bits):
        plane = jax.lax.index_in_dim(pb, b, axis=axis + 1, keepdims=False)
        # plane: packed bytes; expand each byte into its 8 bits
        bitsarr = jnp.stack(
            [(plane >> i) & 1 for i in range(8)], axis=axis + 1
        )  # (.., kp//bits, 8, ..)
        vals = vals + (bitsarr << b)
    out_k = (kp // bits) * 8
    return vals.reshape(shape[:axis] + (out_k,) + shape[axis + 1 :]).astype(
        jnp.uint8
    )


@qarray_dataclass
class IntxArray(QuantizedArray):
    qdata: jax.Array  # int8 (unpacked) or uint8 bitplanes (packed)
    scale: jax.Array
    zero_point: Optional[jax.Array]
    block_size: Tuple[int, ...] = meta(default=())
    bits: int = meta(default=4)
    packed: bool = meta(default=False)
    act_quant: Optional[ActQuantSpec] = meta(default=None)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(
        cls,
        hp: jax.Array,
        bits: int,
        group_size: int = 32,
        mapping_type: P.MappingType = P.MappingType.SYMMETRIC,
        packed: bool = False,
        act_quant: Optional[ActQuantSpec] = None,
        dequant_dtype: str = "bfloat16",
    ) -> "IntxArray":
        if not 1 <= bits <= 8:
            raise ValueError(f"bits={bits}")
        k = hp.shape[-2]
        if k % group_size != 0:
            raise ValueError(f"K={k} % group_size={group_size}")
        block_size = (1,) * (hp.ndim - 2) + (group_size, 1)
        qmin, qmax = P.dtype_range(f"int{bits}")
        scale, zp = P.choose_qparams_affine(
            hp, mapping_type, block_size, quant_min=qmin, quant_max=qmax
        )
        if mapping_type is not P.MappingType.ASYMMETRIC:
            zp = None
        q = P.quantize_affine(hp, block_size, scale, zp, qmin, qmax, jnp.int8)
        if packed:
            u = (q.astype(jnp.int32) - qmin).astype(jnp.uint8)
            qdata = pack_bitplanes(u, bits, axis=-2)
        else:
            qdata = q
        return cls(
            qdata=qdata,
            scale=scale,
            zero_point=zp,
            block_size=block_size,
            bits=bits,
            packed=packed,
            act_quant=act_quant,
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    def _unpacked_q(self) -> jax.Array:
        if not self.packed:
            return self.qdata
        qmin, _ = P.dtype_range(f"int{self.bits}")
        u = unpack_bitplanes(self.qdata, self.bits, axis=-2)
        return (u.astype(jnp.int32) + qmin).astype(jnp.int8)

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        return P.dequantize_affine(
            self._unpacked_q(), self.block_size, self.scale, self.zero_point,
            output_dtype=out_dtype,
        )

    def to_int4(self, act_quant=None, scale_dtype=jnp.float32):
        """Collapse a ≤4-bit affine container onto ``Int4Array``'s FLOAT
        zero-point domain exactly: u = q + 8, zp' = -(8 + zp)·scale — so
        2/3/4-bit weights get the packed magic/magic8 layouts and the fused
        decode kernels instead of int8-unpacked storage + dequant linear.
        Matches the affine dequant to one f32 ulp with float32 scales;
        2-D weights only."""
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        if self.bits > 4 or len(self._shape) != 2:
            raise ValueError("to_int4 needs bits <= 4 and 2-D weights")
        q = self._unpacked_q().astype(jnp.int32)
        u = (q + 8).astype(jnp.uint8)
        scale = self.scale.astype(jnp.float32)
        zp_int = (self.zero_point.astype(jnp.float32)
                  if self.zero_point is not None else 0.0)
        zp = (-(8.0 + zp_int) * scale).astype(scale_dtype)
        arr = Int4Array(
            qdata=u,  # placeholder; repacked below via from layout helpers
            scale=scale.astype(scale_dtype),
            zero_point=zp,
            act_pre_scale=None,
            block_size=self.block_size,
            zero_point_domain=P.ZeroPointDomain.FLOAT,
            act_quant=act_quant if act_quant is not None else self.act_quant,
            _shape=self._shape,
            _dequant_dtype=self._dequant_dtype,
            _layout="halves",
        )
        from ao_tpu.quantization.qarrays.int4 import pack_int4

        k = self._shape[0]
        g = self.block_size[-2]
        arr = arr.replace(qdata=pack_int4(u, g, axis=-2))
        aq = arr.act_quant
        if (aq is not None and aq.dtype == "int8" and aq.symmetric
                and k % 8 == 0 and (k // g) % 2 == 0 and g % 8 == 0):
            return arr.to_layout("magic8")
        if (k // g) % 4 == 0:
            return arr.to_layout("magic")
        return arr
