"""Int8Array — int8 weights (weight-only or dynamic/static int8 activations).

(ref: torchao/quantization/quantize_/workflows/int8/int8_tensor.py:59
``Int8Tensor``; re-designed — no op table, just a pytree + from_hp/dequantize.)

Weight layout: (K, N) (= (in, out)); MoE stacks experts as (E, K, N).
``block_size`` is rank-matched; per-out-channel = (K, 1), groupwise = (g, 1)
along the contraction dim... note: groups along K means block (g, 1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.qarrays.common import ActQuantSpec


@qarray_dataclass
class Int8Array(QuantizedArray):
    qdata: jax.Array  # int8, same shape as hp weight
    scale: jax.Array  # fp32, rank-preserved reduced shape
    zero_point: Optional[jax.Array]  # int32 or None (symmetric)
    # static activation quant params from calibration (or None)
    act_scale: Optional[jax.Array]
    act_zero_point: Optional[jax.Array]
    # AWQ/SmoothQuant per-K-channel activation pre-scale (or None)
    act_pre_scale: Optional[jax.Array]
    block_size: Tuple[int, ...] = meta(default=())
    act_quant: Optional[ActQuantSpec] = meta(default=None)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(
        cls,
        hp: jax.Array,
        block_size: Tuple[int, ...],
        mapping_type: P.MappingType = P.MappingType.SYMMETRIC,
        act_quant: Optional[ActQuantSpec] = None,
        act_scale: Optional[jax.Array] = None,
        act_zero_point: Optional[jax.Array] = None,
        act_pre_scale: Optional[jax.Array] = None,
        dequant_dtype: str = "bfloat16",
    ) -> "Int8Array":
        scale, zp = P.choose_qparams_affine(
            hp, mapping_type, block_size, target_dtype="int8"
        )
        q = P.quantize_affine(
            hp, block_size, scale, zp, quant_min=-128, quant_max=127,
            output_dtype=jnp.int8,
        )
        if mapping_type is not P.MappingType.ASYMMETRIC:
            # symmetric zp is the constant mid-point 0 for int8 — drop it
            q = q  # zp from choose_qparams is (qmax+qmin+1)//2 = 0
            zp = None
        return cls(
            qdata=q,
            scale=scale,
            zero_point=zp,
            act_scale=act_scale,
            act_zero_point=act_zero_point,
            act_pre_scale=act_pre_scale,
            block_size=tuple(block_size),
            act_quant=act_quant,
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        return P.dequantize_affine(
            self.qdata, self.block_size, self.scale, self.zero_point,
            output_dtype=out_dtype,
        )
