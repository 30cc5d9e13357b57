"""NVFP4Array — fp4 e2m1 with fp8-e4m3 block scales (block 16) and an
optional fp32 per-tensor scale (two-level scaling).

(ref: torchao/prototype/mx_formats/nvfp4_tensor.py:52 ``NVFP4Tensor``;
``nvfp4_quantize`` :772; two-level scale ``per_tensor_scale =
amax / (448 * 6)`` :756.)
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

NVFP4_BLOCK = 16
_E4M3_MAX = 448.0


def nvfp4_quantize(
    x: jax.Array,
    block_size: Tuple[int, ...],
    per_tensor: bool = True,
    fixed_per_tensor_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Returns (codes (unpacked uint8), block_scale fp8-e4m3, per_tensor_scale).

    Two-level: total_scale = block_scale(e4m3) * per_tensor_scale(f32);
    block_scale = amax_block / 6 / per_tensor_scale, rounded by the e4m3
    cast. A calibrated ``fixed_per_tensor_scale`` (static activation path)
    overrides the amax-derived one. (ref: nvfp4_tensor.py:756,772)
    """
    xf = x.astype(jnp.float32)
    amax = P.block_reduce(xf, block_size, "absmax")

    if fixed_per_tensor_scale is not None:
        pts = fixed_per_tensor_scale.astype(jnp.float32)
    elif per_tensor:
        g_amax = jnp.max(jnp.abs(xf))
        pts = jnp.maximum(g_amax / (_E4M3_MAX * F4_E2M1_MAX), 1e-12)
    else:
        pts = None

    bs = amax / F4_E2M1_MAX
    if pts is not None:
        bs = bs / pts
    bs = jnp.clip(bs, 1e-12, _E4M3_MAX)
    bs_e4m3 = bs.astype(jnp.float8_e4m3fn)
    bs_f = bs_e4m3.astype(jnp.float32)
    total = bs_f * (pts if pts is not None else 1.0)

    def _q(xb, s):
        return jnp.clip(xb / jnp.maximum(s, 1e-12), -F4_E2M1_MAX, F4_E2M1_MAX)

    v = P.apply_blockwise(xf, block_size, _q, total)
    codes = encode_fp4_e2m1(v)
    return codes, bs_e4m3, pts


@qarray_dataclass
class NVFP4Array(QuantizedArray):
    qdata: jax.Array  # packed fp4 codes, uint8 (K/2, N)
    scale: jax.Array  # fp8 e4m3 block scales (K/16, N)
    per_tensor_scale: Optional[jax.Array]  # f32 scalar () or None
    act_per_tensor_scale: Optional[jax.Array]  # calibrated act scale or None
    block_size: Tuple[int, ...] = meta(default=())
    act_quant: bool = meta(default=False)  # dynamic nvfp4 act quant
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(
        cls,
        hp: jax.Array,
        block_dim: int = -2,
        per_tensor: bool = True,
        act_quant: bool = False,
        act_per_tensor_scale: Optional[jax.Array] = None,
        fixed_per_tensor_scale: Optional[jax.Array] = None,
        dequant_dtype: str = "bfloat16",
    ) -> "NVFP4Array":
        """``fixed_per_tensor_scale`` overrides the amax-derived per-tensor
        scale — the QAT range-learning handoff (learned scale lands in the
        container instead of being re-derived; ref: qat/api.py:269-305)."""
        rank = hp.ndim
        block_dim = block_dim % rank
        if hp.shape[block_dim] % NVFP4_BLOCK != 0:
            raise ValueError(f"dim {block_dim} not divisible by 16")
        block_size = tuple(
            NVFP4_BLOCK if i == block_dim else 1 for i in range(rank)
        )
        codes, bscale, pts = nvfp4_quantize(
            hp, block_size, per_tensor,
            fixed_per_tensor_scale=fixed_per_tensor_scale)
        # "magic" int32 word layout feeds the fused Pallas kernel; defined
        # for 2-D weights blocked along K with K % 64 == 0. Its block
        # scales are stored PRE-PACKED as int32 pair-words so the kernel
        # path has zero per-call scale prep (pack_nvfp4_scale_pairs).
        if rank == 2 and block_dim == rank - 2 and hp.shape[-2] % 64 == 0:
            from ao_tpu.quantization.qarrays.fp4 import (
                pack_fp4_magic,
                pack_nvfp4_scale_pairs,
            )

            qdata = pack_fp4_magic(codes)
            bscale = pack_nvfp4_scale_pairs(bscale)
        else:
            qdata = pack_fp4(codes, NVFP4_BLOCK, axis=block_dim)
        return cls(
            qdata=qdata,
            scale=bscale,
            per_tensor_scale=pts,
            act_per_tensor_scale=act_per_tensor_scale,
            block_size=block_size,
            act_quant=act_quant,
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    @property
    def layout(self) -> str:
        return "magic" if self.qdata.dtype == jnp.int32 else "halves"

    def unpack(self) -> jax.Array:
        """e2m1 codes 0..15, logical shape."""
        if self.layout == "magic":
            from ao_tpu.quantization.qarrays.fp4 import unpack_fp4_magic

            return unpack_fp4_magic(self.qdata)
        block_dim = self.block_size.index(NVFP4_BLOCK)
        return unpack_fp4(self.qdata, NVFP4_BLOCK, axis=block_dim)

    def block_scale_e4m3(self) -> jax.Array:
        """The (K/16, N) e4m3 block scales, unpacking the magic layout's
        pre-packed int32 pair-words if present."""
        if self.scale.dtype == jnp.int32:
            from ao_tpu.quantization.qarrays.fp4 import (
                unpack_nvfp4_scale_pairs,
            )

            return unpack_nvfp4_scale_pairs(self.scale)
        return self.scale

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        codes = self.unpack()
        v = decode_fp4_e2m1(codes, jnp.float32)
        scale_f = self.block_scale_e4m3().astype(jnp.float32)
        if self.per_tensor_scale is not None:
            scale_f = scale_f * self.per_tensor_scale

        def _dq(vb, s):
            return vb * s

        out = P.apply_blockwise(v, self.block_size, _dq, scale_f)
        return out.astype(out_dtype)
