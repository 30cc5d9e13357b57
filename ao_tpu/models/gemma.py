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
    # --- Gemma 2/3 generation knobs ---
    # tanh softcap on attention logits (gemma2)
    attn_logit_softcap: Optional[float] = None
    # score scale = query_pre_attn_scalar**-0.5 instead of head_dim**-0.5
    query_pre_attn_scalar: Optional[float] = None
    # sandwich norms: post-attention and post-feedforward RMSNorms
    post_norms: bool = False
    # per-head (1+w)-RMSNorm on q/k before RoPE (gemma3)
    qk_norm: bool = False
    # sliding-window attention on the layers layer_types marks
    # "sliding_attention"; window applied as an exact banded causal mask
    sliding_window: Optional[int] = None
    layer_types: Optional[Tuple[str, ...]] = None
    # gemma3: sliding layers use a separate (local) rope theta
    rope_local_theta: Optional[float] = None
    dtype: Any = jnp.bfloat16

    def is_sliding(self, i: int) -> bool:
        if self.sliding_window is None:
            return False
        if self.layer_types is not None:
            return self.layer_types[i] == "sliding_attention"
        return i % 2 == 0  # gemma2 default: even layers slide


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
        if cfg.post_norms:
            layers[-1]["post_ln1"] = jnp.zeros((d,), cfg.dtype)
            layers[-1]["post_ln2"] = jnp.zeros((d,), cfg.dtype)
        if cfg.qk_norm:
            # stored pre-offset (1 + w) so llama.attention's plain RMSNorm
            # reproduces gemma's (1+w) semantics
            layers[-1]["attn"]["q_norm"] = jnp.ones((hd,), cfg.dtype)
            layers[-1]["attn"]["k_norm"] = jnp.ones((hd,), cfg.dtype)
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

    def make_freqs(theta):
        return 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))

    freqs = make_freqs(cfg.rope_theta)
    freqs_local = (make_freqs(cfg.rope_local_theta)
                   if cfg.rope_local_theta else freqs)

    def make_mask(window):
        """Causal (and optionally banded) mask for this layer."""
        if kv_caches is None:
            qpos = jnp.arange(s)[:, None]
            kpos = jnp.arange(s)[None, :]
            m = kpos <= qpos
            if window is not None:
                m = m & (qpos - kpos < window)
            return m[None, None]
        c0 = kv_caches[0][0]
        from ao_tpu.serving.paged import PagedKVPool

        if isinstance(c0, PagedKVPool):
            return None  # paged attention masks by per-sequence length
        t = (c0.scale if hasattr(c0, "scale") else c0).shape[1]
        key_pos = jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
        qpos = positions[:, None, :, None]
        m = key_pos <= qpos
        if window is not None:
            m = m & (qpos - key_pos < window)
        return m

    mask_full = make_mask(None)
    mask_sliding = (make_mask(cfg.sliding_window)
                    if cfg.sliding_window is not None else mask_full)
    new_caches = None if kv_caches is None else []

    # reuse the llama attention machinery (RoPE, caches, GQA, kernels) with
    # a synthetic config exposing gemma's decoupled head_dim + 2/3 knobs
    attn_cfg = _llama.LlamaConfig(
        vocab_size=cfg.vocab_size, dim=cfg.n_heads * hd,
        n_layers=cfg.n_layers, n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads, ffn_dim=cfg.ffn_dim,
        norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        attn_softcap=cfg.attn_logit_softcap,
        sm_scale=(cfg.query_pre_attn_scalar ** -0.5
                  if cfg.query_pre_attn_scalar is not None else None),
    )
    attn_cfg_sliding = dataclasses.replace(attn_cfg, force_xla_attention=True)

    for i, layer in enumerate(params["layers"]):
        sliding = cfg.is_sliding(i)
        h = rms_norm(x, layer["ln1"], cfg.norm_eps)
        attn_out, new_c = _llama.attention(
            layer["attn"], h,
            attn_cfg_sliding if sliding else attn_cfg, positions,
            freqs_local if sliding else freqs,
            mask_sliding if sliding else mask_full,
            kv_cache=None if kv_caches is None else kv_caches[i],
            cache_index=cache_index, use_flash=use_flash,
        )
        if cfg.post_norms:
            attn_out = rms_norm(attn_out, layer["post_ln1"], cfg.norm_eps)
        x = x + attn_out
        h = rms_norm(x, layer["ln2"], cfg.norm_eps)
        w2 = layer["mlp"]["w2"]
        from ao_tpu.ops.act_quant import producer_quant_ok

        a_gate = linear(h, layer["mlp"]["w1"])
        up = linear(h, layer["mlp"]["w3"])
        if producer_quant_ok(w2) and h.shape[-2] > 1:
            # prefill W8A8/W4A8: GeGLU emits int8 qdata+scales in one HBM
            # pass (producer-epilogue quant — see models/llama.py mlp)
            from ao_tpu.ops.act_quant import silu_mul_quant

            ffw = linear(silu_mul_quant(a_gate, up, act="gelu"), w2)
        else:
            g = jax.nn.gelu(a_gate.astype(jnp.float32),
                            approximate=True).astype(x.dtype)
            ffw = linear(g * up, w2)
        if cfg.post_norms:
            ffw = rms_norm(ffw, layer["post_ln2"], cfg.norm_eps)
        x = x + ffw
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
