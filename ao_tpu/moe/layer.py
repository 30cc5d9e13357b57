"""Reference MoE layer: top-k router + dropless sort-based dispatch +
grouped (quantized) expert FFNs.

(ref analog: the MoE modules torchao tests against in
torchao/testing/model_architectures.py and prototype/moe_training's
torchtitan integration; re-designed for TPU: static-shape sort-based
dispatch — argsort by expert id + `jnp.bincount(length=E)` group sizes —
feeds `jax.lax.ragged_dot`, so no capacity dropping and no dynamic shapes
under jit.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ao_tpu.moe.grouped import grouped_matmul


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    dim: int = 256
    ffn_dim: int = 512
    n_experts: int = 8
    top_k: int = 2
    # router softmax over all experts then renormalize over the top-k
    norm_topk: bool = True


def init_moe_params(key: jax.Array, cfg: MoEConfig) -> Dict[str, Any]:
    kr, k1, k2, k3 = jax.random.split(key, 4)
    d, f, e = cfg.dim, cfg.ffn_dim, cfg.n_experts
    s = lambda *sh: 1.0 / (sh[-2] ** 0.5)
    return {
        "router": jax.random.normal(kr, (d, e), jnp.float32) * 0.02,
        # gated FFN per expert, weights stored (E, K, N)
        "w_gate": jax.random.normal(k1, (e, d, f), jnp.float32) * s(d, f),
        "w_up": jax.random.normal(k2, (e, d, f), jnp.float32) * s(d, f),
        "w_down": jax.random.normal(k3, (e, f, d), jnp.float32) * s(f, d),
    }


def route(x2: jax.Array, router_w: jax.Array, cfg: MoEConfig):
    """x2 (T, D) → (topk_weights (T, k) f32, topk_idx (T, k) i32)."""
    logits = x2.astype(jnp.float32) @ router_w.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topw, topi = jax.lax.top_k(probs, cfg.top_k)
    if cfg.norm_topk:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    return topw, topi.astype(jnp.int32)


def dispatch(x2: jax.Array, topk_idx: jax.Array, n_experts: int):
    """Replicate each token top_k times and sort by destination expert.

    Returns (xs (T*k, D) sorted, order (T*k,) permutation,
    group_sizes (E,) i32). ``order[i]`` is the flat (token, slot) index that
    landed at sorted position i; token id = order // k.
    """
    t, k = topk_idx.shape
    flat_expert = topk_idx.reshape(-1)  # (T*k,)
    order = jnp.argsort(flat_expert, stable=True)
    group_sizes = jnp.bincount(flat_expert, length=n_experts).astype(jnp.int32)
    xs = jnp.repeat(x2, k, axis=0)[order]
    return xs, order, group_sizes


def combine(ys: jax.Array, order: jax.Array, topk_weights: jax.Array):
    """Weighted scatter-add of expert outputs back to token rows."""
    t, k = topk_weights.shape
    w = topk_weights.reshape(-1)[order].astype(ys.dtype)  # (T*k,)
    ys = ys * w[:, None]
    token_of = order // k
    out = jnp.zeros((t, ys.shape[-1]), ys.dtype)
    return out.at[token_of].add(ys)


def moe_forward(params: Dict[str, Any], x: jax.Array, cfg: MoEConfig):
    """x (..., D) → (..., D). Expert weights may be QuantizedArrays."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, cfg.dim)
    topw, topi = route(x2, params["router"], cfg)
    xs, order, gs = dispatch(x2, topi, cfg.n_experts)
    g = grouped_matmul(xs, params["w_gate"], gs)
    u = grouped_matmul(xs, params["w_up"], gs)
    h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
    ys = grouped_matmul(h, params["w_down"], gs)
    y = combine(ys, order, topw)
    return y.reshape(*lead, cfg.dim).astype(x.dtype)
