"""QLoRA: low-rank adapters over frozen quantized base weights.

(ref analog: the reference ships NF4Tensor explicitly as the QLoRA dtype —
nf4_tensor.py:590, `LinearNF4` autograd fn :1063 — and delegates the adapter
machinery to torchtune. Here the adapter layer is part of the framework:
a ``LoRAWeight`` container wraps ANY base weight (NF4/int4/int8/fp8
QuantizedArray or plain array) so every model built on ``ao_tpu.ops.linear``
gains QLoRA without modification.)

TPU-native design: the base stays quantized in HBM and is never
differentiated (`stop_gradient` — integer qdata has no tangent anyway);
the adapter matmuls are two skinny MXU GEMMs fused by XLA into the same
program as the base linear. Training keeps two pytrees — the frozen base
params and a small float `lora` tree — so `jax.grad` over the adapter tree
is all-float and optax applies directly:

    qbase = ao_tpu.quantize_(params, NF4WeightOnlyConfig())
    lora = init_lora(key, qbase, rank=8)
    def loss(lora):
        p = apply_lora(qbase, lora, alpha=16)
        return ce(model.forward(p, batch), targets)
    grads = jax.grad(loss)(lora)            # floats only
    merged = merge_lora(qbase, lora, alpha=16)   # deploy-time fold-in
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.ops.dispatch import implements
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.quantize import default_filter, path_to_fqn


@qarray_dataclass
class LoRAWeight(QuantizedArray):
    """Frozen base weight + trainable low-rank delta: W_eff = W + a @ b * s."""

    base: Any          # QuantizedArray or jax.Array, (K, N) — FROZEN
    lora_a: jax.Array  # (K, r)
    lora_b: jax.Array  # (r, N)
    scaling: float = meta(default=1.0)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    def dequantize(self, output_dtype=None) -> jax.Array:
        dt = output_dtype or jnp.dtype(self._dequant_dtype)
        if isinstance(self.base, QuantizedArray):
            w = self.base.dequantize(jnp.float32)
        else:
            w = self.base.astype(jnp.float32)
        delta = (self.lora_a.astype(jnp.float32)
                 @ self.lora_b.astype(jnp.float32)) * self.scaling
        return (w + delta).astype(dt)


@implements("linear", LoRAWeight)
def _lora_linear(x: jax.Array, w: LoRAWeight, b: Optional[jax.Array]):
    from ao_tpu.ops.linear import linear

    base = jax.tree_util.tree_map(jax.lax.stop_gradient, w.base)
    y = linear(x, base, b)
    # two skinny GEMMs: (…, K) @ (K, r) @ (r, N), scaled
    z = (x @ w.lora_a.astype(x.dtype)) @ w.lora_b.astype(x.dtype)
    return y + z.astype(y.dtype) * w.scaling


def init_lora(
    key: jax.Array,
    params: Any,
    rank: int = 8,
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jax.Array]]:
    """A flat {fqn: {"a", "b"}} adapter tree for every weight leaf that
    passes ``filter_fn`` (default: the quantize_ linear filter, plus any
    already-quantized 2-D leaf). `a` is Kaiming-ish normal, `b` zeros, so
    the adapted model starts exactly at the base model."""
    flt = filter_fn or (
        lambda fqn, leaf: default_filter(fqn, leaf)
        or (isinstance(leaf, QuantizedArray) and len(leaf.shape) == 2)
    )
    out: Dict[str, Dict[str, jax.Array]] = {}
    idx = [0]

    def visit(path, leaf):
        fqn = path_to_fqn(path)
        if not flt(fqn, leaf) or len(leaf.shape) != 2:
            return leaf
        k, n = leaf.shape
        sub = jax.random.fold_in(key, idx[0])
        idx[0] += 1
        out[fqn] = {
            "a": (jax.random.normal(sub, (k, rank), jnp.float32)
                  * (k ** -0.5)).astype(dtype),
            "b": jnp.zeros((rank, n), dtype),
        }
        return leaf

    jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
    return out


def apply_lora(
    params: Any,
    lora: Dict[str, Dict[str, jax.Array]],
    alpha: float = 16.0,
) -> Any:
    """Wrap every adapted leaf in a LoRAWeight. Pure — call inside the loss
    function so gradients flow only into the (closed-over traced) adapters."""

    def visit(path, leaf):
        fqn = path_to_fqn(path)
        ad = lora.get(fqn)
        if ad is None:
            return leaf
        rank = ad["a"].shape[1]
        dd = (leaf._dequant_dtype if isinstance(leaf, QuantizedArray)
              else str(leaf.dtype))
        return LoRAWeight(
            base=leaf, lora_a=ad["a"], lora_b=ad["b"],
            scaling=float(alpha) / rank,
            _shape=tuple(leaf.shape), _dequant_dtype=dd,
        )

    return jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )


def merge_lora(
    params: Any,
    lora: Dict[str, Dict[str, jax.Array]],
    alpha: float = 16.0,
) -> Any:
    """Deploy-time fold-in: dequantize each adapted base, add the low-rank
    delta, return high-precision weights (re-quantize with quantize_ after)."""

    def visit(path, leaf):
        fqn = path_to_fqn(path)
        ad = lora.get(fqn)
        if ad is None:
            return leaf
        w = (leaf.dequantize(jnp.float32)
             if isinstance(leaf, QuantizedArray)
             else leaf.astype(jnp.float32))
        rank = ad["a"].shape[1]
        delta = (ad["a"].astype(jnp.float32)
                 @ ad["b"].astype(jnp.float32)) * (float(alpha) / rank)
        dd = (leaf._dequant_dtype if isinstance(leaf, QuantizedArray)
              else str(leaf.dtype))
        return (w + delta).astype(jnp.dtype(dd))

    return jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
