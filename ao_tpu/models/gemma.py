"""Gemma-architecture model, pure-functional JAX.

(ref analog: the Gemma3 rows of the reference's benchmark tables
(README.md:134 — int4-WO gemma3-12b 1.73x) and its HF integration; the
architecture itself is public Gemma: GeGLU MLP, RMSNorm with (1 + w) scale,
embedding scaled by sqrt(dim), logit softcapping, decoupled head_dim, large
tied vocab. Every matmul routes through ``ao_tpu.ops.linear`` so all
quantization configs apply unchanged.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.ops import linear
from ao_tpu.models import llama as _llama


@dataclasses.dataclass(frozen=True)
class GemmaConfig:
    vocab_size: int = 256128
    dim: int = 2048
    n_layers: int = 18
    n_heads: int = 8
    n_kv_heads: int = 1
    head_dim: int = 256  # decoupled from dim // n_heads
    ffn_dim: int = 16384
    norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    final_logit_softcap: Optional[float] = 30.0
    dtype: Any = jnp.bfloat16


GEMMA_2B = GemmaConfig()
GEMMA_TINY = GemmaConfig(vocab_size=512, dim=128, n_layers=2, n_heads=4,
                         n_kv_heads=1, head_dim=32, ffn_dim=256)


def init_params(key: jax.Array, cfg: GemmaConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.n_layers + 1)

    def dense(k, fan_in, fan_out):
        w = jax.random.normal(k, (fan_in, fan_out), jnp.float32)
        return (w * (fan_in ** -0.5)).astype(cfg.dtype)

    d, hd = cfg.dim, cfg.head_dim
    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 7)
        layers.append({
            "attn": {
                "wq": dense(ks[0], d, cfg.n_heads * hd),
                "wk": dense(ks[1], d, cfg.n_kv_heads * hd),
                "wv": dense(ks[2], d, cfg.n_kv_heads * hd),
                "wo": dense(ks[3], cfg.n_heads * hd, d),
            },
            "mlp": {
                "w1": dense(ks[4], d, cfg.ffn_dim),   # gate (gelu)
                "w3": dense(ks[5], d, cfg.ffn_dim),   # up
                "w2": dense(ks[6], cfg.ffn_dim, d),   # down
            },
            # gemma rmsnorm scales are stored zero-centered: y *= (1 + w)
            "ln1": jnp.zeros((d,), cfg.dtype),
            "ln2": jnp.zeros((d,), cfg.dtype),
        })
    return {
        "embed": jax.random.normal(keys[-1], (cfg.vocab_size, d), jnp.float32)
        .astype(cfg.dtype) * 0.02,
        "layers": layers,
        "norm": jnp.zeros((d,), cfg.dtype),
    }


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def forward(
    params: Dict[str, Any],
    tokens: jax.Array,  # (B, S)
    cfg: GemmaConfig,
    positions: Optional[jax.Array] = None,
    kv_caches: Optional[list] = None,
    cache_index: Optional[jax.Array] = None,
    use_flash: bool = False,
) -> Tuple[jax.Array, Optional[list]]:
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    from ao_tpu.ops.embedding import embedding as embedding_op

    x = embedding_op(params["embed"], tokens, out_dtype=cfg.dtype)
    x = x * jnp.asarray(cfg.dim ** 0.5, cfg.dtype)  # gemma embed scaling

    hd = cfg.head_dim
    freqs = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))

    if kv_caches is None:
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        new_caches = None
    else:
        c0 = kv_caches[0][0]
        from ao_tpu.serving.paged import PagedKVPool

        if isinstance(c0, PagedKVPool):
            mask = None  # paged attention masks by per-sequence length
        else:
            t = (c0.qdata if hasattr(c0, "qdata") else c0).shape[1]
            key_pos = jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
            mask = key_pos <= positions[:, None, :, None]
        new_caches = []

    # reuse the llama attention machinery (RoPE, caches, GQA, kernels) with
    # a synthetic config exposing gemma's decoupled head_dim
    attn_cfg = _llama.LlamaConfig(
        vocab_size=cfg.vocab_size, dim=cfg.n_heads * hd,
        n_layers=cfg.n_layers, n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads, ffn_dim=cfg.ffn_dim,
        norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
    )

    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["ln1"], cfg.norm_eps)
        attn_out, new_c = _llama.attention(
            layer["attn"], h, attn_cfg, positions, freqs, mask,
            kv_cache=None if kv_caches is None else kv_caches[i],
            cache_index=cache_index, use_flash=use_flash,
        )
        x = x + attn_out
        h = rms_norm(x, layer["ln2"], cfg.norm_eps)
        g = jax.nn.gelu(
            linear(h, layer["mlp"]["w1"]).astype(jnp.float32), approximate=True
        ).astype(x.dtype)
        up = linear(h, layer["mlp"]["w3"])
        x = x + linear(g * up, layer["mlp"]["w2"])
        if new_caches is not None:
            new_caches.append(new_c)

    x = rms_norm(x, params["norm"], cfg.norm_eps)
    logits = linear(x, params["embed"].T)  # tied
    logits = logits.astype(jnp.float32)
    if cfg.final_logit_softcap:
        c = cfg.final_logit_softcap
        logits = jnp.tanh(logits / c) * c
    return logits, new_caches


def init_kv_caches(cfg: GemmaConfig, batch: int, max_seq: int,
                   dtype=jnp.bfloat16) -> list:
    return [
        (
            jnp.zeros((batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            jnp.zeros((batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
        )
        for _ in range(cfg.n_layers)
    ]
