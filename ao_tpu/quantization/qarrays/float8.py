"""Float8Array — fp8 (e4m3/e5m2) weights/activations with blockwise scales.

(ref: torchao .../workflows/float8/float8_tensor.py:84 ``Float8Tensor``.)

Scales are rank-preserved reduced shape per ``block_size``:
PerTensor → (1,..,1); per-out-channel ("rowwise" in torchao terms, i.e. one
scale per output column in our (K, N) layout) → (1, N); deepseek-style
blockwise → (K/128, N/128) for weights, (M, K/128) for activations.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.qarrays.common import ActQuantSpec


@qarray_dataclass
class Float8Array(QuantizedArray):
    qdata: jax.Array  # fp8
    scale: jax.Array  # fp32, rank-preserved
    act_scale: Optional[jax.Array]  # static act scale (calibrated) or None
    act_pre_scale: Optional[jax.Array]  # AWQ/SmoothQuant per-K pre-scale
    block_size: Tuple[int, ...] = meta(default=())
    act_quant: Optional[ActQuantSpec] = meta(default=None)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @property
    def float8_dtype(self):
        return self.qdata.dtype

    @classmethod
    def from_hp(
        cls,
        hp: jax.Array,
        block_size: Tuple[int, ...],
        float8_dtype=jnp.float8_e4m3fn,
        act_quant: Optional[ActQuantSpec] = None,
        act_scale: Optional[jax.Array] = None,
        act_pre_scale: Optional[jax.Array] = None,
        value_lb: Optional[float] = None,
        value_ub: Optional[float] = None,
        dequant_dtype: str = "bfloat16",
    ) -> "Float8Array":
        scale = P.choose_scale_float8(
            hp, block_size, float8_dtype, value_lb=value_lb, value_ub=value_ub
        )
        q = P.quantize_float8(hp, block_size, scale, float8_dtype)
        return cls(
            qdata=q,
            scale=scale,
            act_scale=act_scale,
            act_pre_scale=act_pre_scale,
            block_size=tuple(block_size),
            act_quant=act_quant,
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        return P.dequantize_float8(
            self.qdata, self.block_size, self.scale, output_dtype=out_dtype
        )
