"""Multi-LoRA serving: per-request adapters batched into one decode step.

(ref analog: none in the reference — torchao ships NF4/QLoRA dtypes and
delegates serving to vLLM, whose multi-LoRA support (S-LoRA) is the model
here. TPU re-design: all adapters live stacked in HBM as (n_adapters, K, r)
/ (n_adapters, r, N) arrays; each decode step gathers every slot's adapter
by index and runs two batched skinny einsums on top of the shared frozen
base — one device program for the whole mixed-adapter batch, no
per-adapter kernels or recompiles (the slot→adapter map is data).)

Usage:
    adapters = {"fr": lora_fr, "de": lora_de}   # trees from init_lora
    eng = Engine(qparams, cfg, scfg, lora_adapters=adapters)
    eng.submit(prompt, 32, lora="fr")
    eng.submit(prompt2, 32, lora="de")          # batched together
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.ops.dispatch import implements
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass


@qarray_dataclass
class MultiLoRAWeight(QuantizedArray):
    """Frozen base + a STACK of adapters, selected per batch row.

    ``slot_ids`` maps each batch row to an adapter index (0 is reserved for
    the zero adapter = base model). It is a data leaf, so remapping slots
    never recompiles.
    """

    base: Any            # (K, N) QuantizedArray or jax.Array — frozen
    a_stack: jax.Array   # (n_adapters, K, r)
    b_stack: jax.Array   # (n_adapters, r, N)
    slot_ids: jax.Array  # (B,) int32 — batch row → adapter index
    scaling: float = meta(default=1.0)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    def dequantize(self, output_dtype=None):
        # adapter-0 view (the base); per-slot merge has no single dense form
        dt = output_dtype or jnp.dtype(self._dequant_dtype)
        if isinstance(self.base, QuantizedArray):
            return self.base.dequantize(dt)
        return self.base.astype(dt)


@implements("linear", MultiLoRAWeight)
def _multi_lora_linear(x: jax.Array, w: MultiLoRAWeight, bias):
    from ao_tpu.ops.linear import linear

    base = jax.tree_util.tree_map(jax.lax.stop_gradient, w.base)
    y = linear(x, base, bias)
    if x.ndim == 2:
        # (B, K) decode rows: one adapter per row
        a = w.a_stack[w.slot_ids].astype(x.dtype)      # (B, K, r)
        b = w.b_stack[w.slot_ids].astype(x.dtype)      # (B, r, N)
        z = jnp.einsum("bk,bkr->br", x, a)
        d = jnp.einsum("br,brn->bn", z, b)
    else:
        # (B, S, K): same adapter across a row's sequence (prefill/verify)
        a = w.a_stack[w.slot_ids].astype(x.dtype)
        b = w.b_stack[w.slot_ids].astype(x.dtype)
        z = jnp.einsum("bsk,bkr->bsr", x, a)
        d = jnp.einsum("bsr,brn->bsn", z, b)
    return y + d.astype(y.dtype) * w.scaling


def stack_adapters(
    base_params: Any,
    adapters: Dict[str, Dict[str, Dict[str, jax.Array]]],
    max_batch: int,
    alpha: float = 16.0,
) -> Tuple[Any, List[str]]:
    """Wrap every adapted weight leaf in a MultiLoRAWeight holding ALL
    adapters stacked (index 0 = zero adapter / plain base). Returns the
    wrapped params and the adapter-name order (index i+1 = names[i])."""
    from ao_tpu.quantization.quantize import path_to_fqn

    names = sorted(adapters)
    fqns = set()
    for tree in adapters.values():
        fqns.update(tree.keys())

    def visit(path, leaf):
        fqn = path_to_fqn(path)
        if fqn not in fqns:
            return leaf
        k, n = leaf.shape
        # rank from the first adapter that has this fqn
        rank = next(t[fqn]["a"].shape[1] for t in adapters.values()
                    if fqn in t)
        a = [jnp.zeros((k, rank), jnp.float32)]
        b = [jnp.zeros((rank, n), jnp.float32)]
        for name in names:
            t = adapters[name]
            if fqn in t:
                a.append(t[fqn]["a"].astype(jnp.float32))
                b.append(t[fqn]["b"].astype(jnp.float32))
            else:
                a.append(jnp.zeros((k, rank), jnp.float32))
                b.append(jnp.zeros((rank, n), jnp.float32))
        dd = (leaf._dequant_dtype if isinstance(leaf, QuantizedArray)
              else str(leaf.dtype))
        return MultiLoRAWeight(
            base=leaf, a_stack=jnp.stack(a), b_stack=jnp.stack(b),
            slot_ids=jnp.zeros((max_batch,), jnp.int32),
            scaling=float(alpha) / rank,
            _shape=(k, n), _dequant_dtype=dd,
        )

    wrapped = jax.tree_util.tree_map_with_path(
        visit, base_params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
    return wrapped, names


def set_slot_ids(params: Any, slot_ids) -> Any:
    """Rebind every MultiLoRAWeight's slot→adapter map (data leaves only —
    jitted programs retrace nothing)."""
    ids = jnp.asarray(slot_ids, jnp.int32)

    def visit(leaf):
        if isinstance(leaf, MultiLoRAWeight):
            return leaf.replace(slot_ids=ids)
        return leaf

    return jax.tree_util.tree_map(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
