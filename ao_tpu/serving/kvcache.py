"""Quantized KV cache (int8 / fp8) with per-token-per-head scales.

(ref analog: the reference's quantized-attention/KV-cache surface —
csrc/cpu/aten_kernels/quantized_sdpa.cpp int8/fp8 attention semantics and
prototype/attention fp8 SDPA; SURVEY §5 "long context" notes. TPU
re-design: the cache is a pytree of (qdata, scale) pairs, so sharding,
donation, and collectives apply leaf-wise. Scales are per (batch, pos,
kv_head) — one scalar per cached vector — which keeps dequantization a
single fused multiply on load and halves (int8/fp8) the HBM bytes the
decode attention reads.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization.qarrays.base import meta, qarray_dataclass
from ao_tpu.quantization.qarrays.common import canon_dtype

_QMAX = {"int8": 127.0, "float8_e4m3fn": 448.0, "float8_e5m2": 57344.0}


@qarray_dataclass
class QuantKVCache:
    """One layer's K or V cache: (B, T, H, D) quantized + (B, T, H, 1) scales."""

    qdata: jax.Array
    scale: jax.Array
    dtype_name: str = meta(default="int8")

    @classmethod
    def create(cls, batch: int, max_seq: int, n_kv_heads: int, head_dim: int,
               dtype_name: str = "int8") -> "QuantKVCache":
        dt = canon_dtype(dtype_name)
        return cls(
            qdata=jnp.zeros((batch, max_seq, n_kv_heads, head_dim), dt),
            scale=jnp.zeros((batch, max_seq, n_kv_heads, 1), jnp.float32),
            dtype_name=dtype_name,
        )

    def quantize_values(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x (B, S, H, D) hp → (q, scale) with per-vector scales."""
        qmax = _QMAX[self.dtype_name]
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / qmax
        v = xf / scale
        if self.dtype_name == "int8":
            q = jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8)
        else:
            q = jnp.clip(v, -qmax, qmax).astype(canon_dtype(self.dtype_name))
        return q, scale

    def update(self, x: jax.Array, index) -> "QuantKVCache":
        """Write new positions at ``index`` (B, S, H, D) → new cache.
        ``index`` may be a scalar (all rows at one offset) or a (B,) vector
        (continuous batching: per-slot positions)."""
        q, s = self.quantize_values(x)
        if hasattr(index, "ndim") and getattr(index, "ndim", 0) == 1:
            # per-slot offsets; x may be an s-token window per slot
            # (speculative verify) — clamp writes at the last row
            rows = jnp.arange(q.shape[0])[:, None]
            cols = jnp.minimum(index[:, None] + jnp.arange(q.shape[1])[None],
                               self.qdata.shape[1] - 1)
            qdata = self.qdata.at[rows, cols].set(q)
            scale = self.scale.at[rows, cols].set(s)
        else:
            qdata = jax.lax.dynamic_update_slice(self.qdata, q, (0, index, 0, 0))
            scale = jax.lax.dynamic_update_slice(self.scale, s, (0, index, 0, 0))
        return dataclasses.replace(self, qdata=qdata, scale=scale)

    def dequantize(self, out_dtype=jnp.bfloat16) -> jax.Array:
        return (self.qdata.astype(jnp.float32) * self.scale).astype(out_dtype)


def init_quant_kv_caches(cfg, batch: int, max_seq: int,
                         dtype_name: str = "int8"):
    """Per-layer [(K-cache, V-cache)] matching llama.forward's interface."""
    return [
        (
            QuantKVCache.create(batch, max_seq, cfg.n_kv_heads, cfg.head_dim, dtype_name),
            QuantKVCache.create(batch, max_seq, cfg.n_kv_heads, cfg.head_dim, dtype_name),
        )
        for _ in range(cfg.n_layers)
    ]
