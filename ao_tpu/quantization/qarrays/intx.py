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
