"""float8 training: fp8 matmuls with per-gemm cast configs and custom VJP.

(ref: torchao/float8/ — Float8Linear float8_linear.py:255,
``matmul_with_hp_or_float8_args`` :29, recipes Float8LinearRecipeName
config.py:141 {TENSORWISE, ROWWISE, ROWWISE_WITH_GW_HP}. TPU re-design:
one ``fp8_matmul`` custom_vjp implements the three-gemm pattern —
  out    = cast(x)  @ cast(w)          e4m3 x e4m3
  dx     = cast(g)  @ cast(w)ᵀ         e5m2 x e4m3
  dw     = cast(x)ᵀ @ cast(g)          e4m3 x e5m2  (or hp for _GW_HP)
with dynamic scaling only (delayed scaling was deprecated in the
reference). Scale granularity per recipe: tensorwise = per-tensor;
rowwise = axiswise along the contraction dim of each gemm.)

Wrapper flow: ``convert_to_float8_training(params)`` wraps 2-D linear
weights in ``Float8TrainingWeight``; ``ops.linear`` dispatches to the
custom-vjp matmul, so any model written against ao_tpu.ops trains in fp8
without modification.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.ops.dispatch import implements
from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass

E4M3 = jnp.float8_e4m3fn
E5M2 = jnp.float8_e5m2


@dataclasses.dataclass(frozen=True)
class Float8TrainingRecipe:
    """(ref: Float8LinearRecipeName torchao/float8/config.py:141)"""

    name: str = "rowwise"  # "tensorwise" | "rowwise" | "rowwise_with_gw_hp"

    @property
    def grad_weight_hp(self) -> bool:
        return self.name == "rowwise_with_gw_hp"

    @property
    def axiswise(self) -> bool:
        return self.name.startswith("rowwise")


def _cast_fp8(t: jax.Array, dtype, axis: Optional[int]) -> Tuple[jax.Array, jax.Array]:
    """Cast to fp8 with dynamic scaling. axis=None → tensorwise scale;
    else one scale per slice along ``axis`` (the contraction dim)."""
    if axis is None:
        bs = t.shape
    else:
        axis = axis % t.ndim
        bs = tuple(t.shape[i] if i == axis else 1 for i in range(t.ndim))
    scale = P.choose_scale_float8(t, bs, dtype)
    q = P.quantize_float8(t, bs, scale, dtype)
    return q, scale


def _scaled_dot(qa, sa, qb, sb) -> jax.Array:
    """(M,K)x(K,N) fp8 dot with f32 accumulation and scale epilogue.
    Scales are rank-preserved: sa (M,1) or (1,1); sb (1,N) or (1,1)."""
    acc = jax.lax.dot_general(
        qa, qb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return acc * sa.astype(jnp.float32) * sb.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fp8_matmul(x: jax.Array, w: jax.Array, recipe: Float8TrainingRecipe):
    """y = x @ w with fp8 forward gemm. x (M, K) hp, w (K, N) hp."""
    out, _ = _fp8_matmul_fwd(x, w, recipe)
    return out


def _fp8_matmul_fwd(x, w, recipe):
    ax = -1 if recipe.axiswise else None  # x: scale along K (per row)
    aw = 0 if recipe.axiswise else None  # w: scale along K (per out-col)
    qx, sx = _cast_fp8(x, E4M3, None if ax is None else 1)
    qw, sw = _cast_fp8(w, E4M3, None if aw is None else 0)
    # sx (M,1), sw (1,N)
    y = _scaled_dot(qx, sx, qw, sw)
    return y.astype(x.dtype), (x, w)


def _fp8_matmul_bwd(recipe, res, g):
    x, w = res
    gf = g.astype(jnp.float32)

    # dx = g @ wᵀ : cast g e5m2 axiswise dim -1 (contraction = N),
    #              cast w e4m3 axiswise dim -1 → wᵀ contraction rows
    if recipe.axiswise:
        qg, sg = _cast_fp8(gf, E5M2, 1)  # (M, N), scale (M, 1)
        qwt, swt = _cast_fp8(w.astype(jnp.float32).T, E4M3, 0)  # (N, K), scale (1, K)
        dx = _scaled_dot(qg, sg, qwt, swt)
    else:
        qg, sg = _cast_fp8(gf, E5M2, None)
        qwt, swt = _cast_fp8(w.astype(jnp.float32).T, E4M3, None)
        dx = _scaled_dot(qg, sg, qwt, swt)

    # dw = xᵀ @ g : contraction dim is M, so scales must span M on both sides
    if recipe.grad_weight_hp:
        dw = x.astype(jnp.float32).T @ gf
    elif recipe.axiswise:
        qxt, sxt = _cast_fp8(x.astype(jnp.float32).T, E4M3, 1)  # (K, M), scale (K, 1)
        qg2, sg2 = _cast_fp8(gf, E5M2, 0)  # (M, N), scale (1, N)
        dw = _scaled_dot(qxt, sxt, qg2, sg2)
    else:
        qxt, sxt = _cast_fp8(x.astype(jnp.float32).T, E4M3, None)
        qg2, sg2 = _cast_fp8(gf, E5M2, None)
        dw = _scaled_dot(qxt, sxt, qg2, sg2)

    return dx.astype(x.dtype), dw.astype(w.dtype)


fp8_matmul.defvjp(_fp8_matmul_fwd, _fp8_matmul_bwd)


# ---------------------------------------------------------------------------
# params wrapper + convert API
# ---------------------------------------------------------------------------


@qarray_dataclass
class Float8TrainingWeight(QuantizedArray):
    """HP master weight that routes ops.linear through the fp8 custom-vjp.
    (ref analog: Float8Linear module swap + WeightWithDynamicFloat8CastTensor)"""

    weight: jax.Array
    recipe: Float8TrainingRecipe = meta(default=Float8TrainingRecipe())
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def wrap(cls, w: jax.Array, recipe: Float8TrainingRecipe) -> "Float8TrainingWeight":
        return cls(weight=w, recipe=recipe, _shape=tuple(w.shape),
                   _dequant_dtype=str(w.dtype))

    def dequantize(self, output_dtype=None):
        return self.weight.astype(output_dtype or self.weight.dtype)


@implements("linear", Float8TrainingWeight)
def _fp8_training_linear(x, w: Float8TrainingWeight, b):
    x2 = x.reshape(-1, x.shape[-1])
    y = fp8_matmul(x2, w.weight, w.recipe)
    y = y.reshape(*x.shape[:-1], y.shape[-1])
    return y if b is None else y + b.astype(y.dtype)


def convert_to_float8_training(
    params: Any,
    recipe: Float8TrainingRecipe = Float8TrainingRecipe("rowwise"),
    filter_fn=None,
) -> Any:
    """(ref: convert_to_float8_training float8/float8_linear_utils.py:86)"""
    from ao_tpu.quantization.quantize import default_filter, path_to_fqn

    filter_fn = filter_fn or default_filter

    def transform(path, leaf):
        fqn = path_to_fqn(path)
        if not filter_fn(fqn, leaf) or not hasattr(leaf, "ndim") or leaf.ndim != 2:
            return leaf
        return Float8TrainingWeight.wrap(leaf, recipe)

    return jax.tree_util.tree_map_with_path(
        transform, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )


def unwrap_float8_training(params: Any) -> Any:
    """Inverse of convert: return plain hp weights (e.g. before PTQ)."""

    def un(leaf):
        return leaf.weight if isinstance(leaf, Float8TrainingWeight) else leaf

    return jax.tree_util.tree_map(
        un, params, is_leaf=lambda x: isinstance(x, Float8TrainingWeight)
    )
