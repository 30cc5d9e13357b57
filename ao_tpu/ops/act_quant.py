"""Dynamic activation quantization (on-the-fly, inside the jitted fwd).

(ref: torchao per-token dynamic quant, quantization/utils.py:545 and
``_choose_quant_func_and_quantize_tensor`` float8_tensor.py:338.)
XLA fuses these reductions+casts into neighbors; a fused Pallas variant
exists in ao_tpu.ops.pallas.act_quant for the cases XLA schedules poorly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.common import ActQuantSpec, canon_dtype


def act_block_size(shape, spec: ActQuantSpec):
    rank = len(shape)
    if spec.granularity == "per_token":
        return (1,) * (rank - 1) + (shape[-1],)
    if spec.granularity == "per_tensor":
        return tuple(shape)
    g = spec.group_size()
    if g is not None:
        return (1,) * (rank - 1) + (g,)
    raise ValueError(spec.granularity)


def quantize_activation(
    x: jax.Array, spec: ActQuantSpec
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Returns (q, scale, zero_point). Scale has rank-preserved reduced shape."""
    bs = act_block_size(x.shape, spec)
    if spec.dtype.startswith("float8"):
        dt = canon_dtype(spec.dtype)
        scale = P.choose_scale_float8(
            x, bs, dt, value_lb=spec.value_lb, value_ub=spec.value_ub
        )
        q = P.quantize_float8(x, bs, scale, dt)
        return q, scale, None
    if spec.dtype == "int8":
        mt = P.MappingType.SYMMETRIC if spec.symmetric else P.MappingType.ASYMMETRIC
        scale, zp = P.choose_qparams_affine(x, mt, bs, target_dtype="int8")
        q = P.quantize_affine(x, bs, scale, zp, -128, 127, jnp.int8)
        if spec.symmetric:
            zp = None
        return q, scale, zp
    raise ValueError(f"unsupported activation dtype {spec.dtype}")
