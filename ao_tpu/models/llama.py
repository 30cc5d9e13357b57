"""Llama-architecture model, pure-functional JAX.

(ref analog: torchao/testing/model_architectures.py + the gpt-fast model
used for the README benchmarks. This is the framework's flagship model for
quantized inference/serving/training benchmarks.)

Design: params are a plain nested-dict pytree; every matmul goes through
``ao_tpu.ops.linear`` so any leaf may be a QuantizedArray. Weights are
stored (in_features, out_features). The forward supports:
  * full-sequence forward (prefill / eval / training)
  * single-step decode with an external KV cache (see ao_tpu.serving)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.ops import linear


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    ffn_dim: int = 14336
    norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # HF-style rope_scaling as a hashable tuple of (key, value) pairs
    # (cfg is a jit static arg); only the "llama3" rope_type is modeled
    # (Llama-3.1/3.2 long-context frequency rescale). A plain dict also
    # works when the config never crosses a static-arg boundary.
    rope_scaling: Optional[Tuple[Tuple[str, Any], ...]] = None
    tie_embeddings: bool = False
    dtype: Any = jnp.bfloat16
    # attention compute dtype: "bf16" | "int8" | "float8_e4m3fn"
    # (ref: apply_low_precision_attention prototype/attention/api.py:68)
    sdpa: str = "bf16"
    sdpa_rotate: bool = False  # Hadamard-rotate Q/K before quantizing
    # Mixture-of-Experts FFN: n_experts > 0 replaces the dense MLP with a
    # top-k routed expert FFN (ao_tpu.moe) — the Mixtral/Llama4-style family
    n_experts: int = 0
    top_k_experts: int = 2
    # renormalize the top-k router probs (Mixtral always; Qwen3-MoE's
    # ``norm_topk_prob``)
    norm_topk_experts: bool = True
    # Qwen2-style biases on the q/k/v projections
    qkv_bias: bool = False
    # Qwen3-style per-head RMSNorm on q/k (before RoPE) and a head_dim
    # decoupled from dim // n_heads
    qk_norm: bool = False
    qk_head_dim: Optional[int] = None
    # Gemma2-style attention knobs: score scale decoupled from head_dim
    # and a tanh softcap on the attention logits
    sm_scale: Optional[float] = None
    attn_softcap: Optional[float] = None
    # force the masked XLA attention path (sliding-window layers: the
    # flash/decode kernels mask by length only, not by band)
    force_xla_attention: bool = False

    @property
    def head_dim(self) -> int:
        return self.qk_head_dim or self.dim // self.n_heads


# Common shapes for parity with reference benchmarks.
LLAMA3_8B = LlamaConfig(vocab_size=128256, dim=4096, n_layers=32, n_heads=32,
                        n_kv_heads=8, ffn_dim=14336)
LLAMA32_1B = LlamaConfig(vocab_size=128256, dim=2048, n_layers=16, n_heads=32,
                         n_kv_heads=8, ffn_dim=8192, tie_embeddings=True)
LLAMA_TINY = LlamaConfig(vocab_size=512, dim=256, n_layers=2, n_heads=4,
                         n_kv_heads=2, ffn_dim=512, tie_embeddings=True)


def init_params(key: jax.Array, cfg: LlamaConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.n_layers + 2)

    def dense(k, fan_in, fan_out):
        w = jax.random.normal(k, (fan_in, fan_out), jnp.float32)
        return (w * (fan_in ** -0.5)).astype(cfg.dtype)

    d, hd = cfg.dim, cfg.head_dim
    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 7)
        if cfg.n_experts > 0:
            from ao_tpu.moe.layer import MoEConfig, init_moe_params

            mlp_params = init_moe_params(
                ks[4],
                MoEConfig(dim=d, ffn_dim=cfg.ffn_dim,
                          n_experts=cfg.n_experts, top_k=cfg.top_k_experts,
                          norm_topk=cfg.norm_topk_experts),
            )
            mlp_params = jax.tree.map(
                lambda x: x.astype(cfg.dtype), mlp_params
            )
        else:
            mlp_params = {
                "w1": dense(ks[4], d, cfg.ffn_dim),   # gate
                "w3": dense(ks[5], d, cfg.ffn_dim),   # up
                "w2": dense(ks[6], cfg.ffn_dim, d),   # down
            }
        attn = {
            "wq": dense(ks[0], d, cfg.n_heads * hd),
            "wk": dense(ks[1], d, cfg.n_kv_heads * hd),
            "wv": dense(ks[2], d, cfg.n_kv_heads * hd),
            "wo": dense(ks[3], cfg.n_heads * hd, d),
        }
        if cfg.qkv_bias:
            attn["bq"] = jnp.zeros((cfg.n_heads * hd,), cfg.dtype)
            attn["bk"] = jnp.zeros((cfg.n_kv_heads * hd,), cfg.dtype)
            attn["bv"] = jnp.zeros((cfg.n_kv_heads * hd,), cfg.dtype)
        if cfg.qk_norm:
            attn["q_norm"] = jnp.ones((hd,), cfg.dtype)
            attn["k_norm"] = jnp.ones((hd,), cfg.dtype)
        layers.append({
            "attn": attn,
            "mlp": mlp_params,
            "ln1": jnp.ones((d,), cfg.dtype),
            "ln2": jnp.ones((d,), cfg.dtype),
        })
    params = {
        "embed": jax.random.normal(keys[-2], (cfg.vocab_size, d), jnp.float32)
        .astype(cfg.dtype) * 0.02,
        "layers": layers,
        "norm": jnp.ones((d,), cfg.dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(keys[-1], d, cfg.vocab_size)
    return params


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def rope_freqs(cfg: LlamaConfig) -> jax.Array:
    hd = cfg.head_dim
    freqs = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    rs = dict(cfg.rope_scaling) if cfg.rope_scaling else None
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        # Llama-3.1 frequency-dependent scaling (ref: transformers
        # ROPE_INIT_FUNCTIONS["llama3"]): long wavelengths divide by
        # `factor`, short ones stay, the band between interpolates
        factor = rs["factor"]
        low = rs.get("low_freq_factor", 1.0)
        high = rs.get("high_freq_factor", 4.0)
        orig = rs.get("original_max_position_embeddings", 8192)
        wavelen = 2.0 * jnp.pi / freqs
        low_wl = orig / low
        high_wl = orig / high
        smooth = (orig / wavelen - low) / (high - low)
        interp = (1 - smooth) * freqs / factor + smooth * freqs
        freqs = jnp.where(
            wavelen > low_wl, freqs / factor,
            jnp.where(wavelen < high_wl, freqs, interp),
        )
    return freqs


def apply_rope(x: jax.Array, positions: jax.Array, freqs: jax.Array) -> jax.Array:
    """x: (B, S, H, Dh); positions: (B, S)."""
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, S, Dh/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def attention(
    layer: Dict[str, Any],
    x: jax.Array,
    cfg: LlamaConfig,
    positions: jax.Array,
    freqs: jax.Array,
    mask: Optional[jax.Array],
    kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_index: Optional[jax.Array] = None,
    use_flash: bool = False,
):
    b, s, d = x.shape
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    q = linear(x, layer["wq"], layer.get("bq")).reshape(b, s, h, hd)
    k = linear(x, layer["wk"], layer.get("bk")).reshape(b, s, kvh, hd)
    v = linear(x, layer["wv"], layer.get("bv")).reshape(b, s, kvh, hd)

    if "q_norm" in layer:  # Qwen3 per-head RMSNorm before RoPE
        q = rms_norm(q, layer["q_norm"], cfg.norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.norm_eps)

    q = apply_rope(q, positions, freqs)
    k = apply_rope(k, positions, freqs)

    new_cache = None
    if kv_cache is not None:
        ck, cv = kv_cache  # (B, T, kvh, hd) arrays or QuantKVCache
        from ao_tpu.serving.kvcache import QuantKVCache
        from ao_tpu.serving.paged import PagedKVPool

        if isinstance(ck, PagedKVPool):
            # paged decode (s == 1): cache_index = (block_table, lengths)
            from ao_tpu.serving.paged import paged_attention

            assert s == 1, "paged caches support single-token decode steps"
            block_table, lengths = cache_index
            ck = ck.append_token(k[:, 0], block_table, lengths)
            cv = cv.append_token(v[:, 0], block_table, lengths)
            out = paged_attention(
                q[:, 0], ck, cv, block_table, lengths + 1,
                sm_scale=hd ** -0.5,
            )
            out = out.astype(x.dtype).reshape(b, 1, h * hd)
            return linear(out, layer["wo"]), (ck, cv)

        per_slot = (
            hasattr(cache_index, "ndim") and getattr(cache_index, "ndim", 0) == 1
        )

        if (s == 1 and cfg.sdpa == "bf16" and hd % 128 == 0
                and cfg.attn_softcap is None and not cfg.force_xla_attention):
            # single-token decode: Pallas flash-decoding kernel reading the
            # cache in place — int8/fp8 caches stream as 8-bit bytes, the
            # per-vector scales fold into scores/probs in-kernel
            from ao_tpu.ops import kernels as _kernels

            if _kernels.on_tpu():
                from ao_tpu.ops.pallas import UnsupportedShape
                from ao_tpu.ops.pallas.decode_attention import decode_attention

                if isinstance(ck, QuantKVCache):
                    ck = ck.update(k, cache_index)
                    cv = cv.update(v, cache_index)
                    kd, ks_, vd, vs_ = ck.qdata, ck.scale, cv.qdata, cv.scale
                elif per_slot:
                    rows = jnp.arange(b)
                    ck = ck.at[rows, cache_index].set(k[:, 0].astype(ck.dtype))
                    cv = cv.at[rows, cache_index].set(v[:, 0].astype(cv.dtype))
                    kd, ks_, vd, vs_ = ck, None, cv, None
                else:
                    ck = jax.lax.dynamic_update_slice(
                        ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
                    kd, ks_, vd, vs_ = ck, None, cv, None
                try:
                    lengths = positions[:, 0] + 1
                    out = decode_attention(
                        q[:, 0], kd, vd, lengths, k_scale=ks_, v_scale=vs_,
                        sm_scale=(cfg.sm_scale if cfg.sm_scale is not None
                                  else hd ** -0.5),
                        k_layout=(ck.layout if isinstance(ck, QuantKVCache)
                                  else "tokens"),
                    )
                    out = out.astype(x.dtype).reshape(b, 1, h * hd)
                    return linear(out, layer["wo"]), (ck, cv)
                except UnsupportedShape:
                    # cache already updated; fall through to the XLA path
                    if isinstance(ck, QuantKVCache):
                        k = ck.dequantize(x.dtype)
                        v = cv.dequantize(x.dtype)
                    else:
                        k, v = ck.astype(x.dtype), cv.astype(x.dtype)
                    new_cache = (ck, cv)

        if new_cache is not None:
            pass  # decode fallback above already materialized k/v
        elif isinstance(ck, QuantKVCache):
            ck = ck.update(k, cache_index)
            cv = cv.update(v, cache_index)
            k = ck.dequantize(x.dtype)
            v = cv.dequantize(x.dtype)
        elif per_slot:
            # continuous batching: each slot writes its s-token window at
            # its own position (s == 1 for plain decode; s == draft+1 for
            # speculative verify), clamped at the last row
            rows = jnp.arange(b)[:, None]
            cols = jnp.minimum(cache_index[:, None] + jnp.arange(s)[None],
                               ck.shape[1] - 1)
            ck = ck.at[rows, cols].set(k.astype(ck.dtype))
            cv = cv.at[rows, cols].set(v.astype(cv.dtype))
            k, v = ck.astype(x.dtype), cv.astype(x.dtype)
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, k.astype(ck.dtype), (0, cache_index, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype), (0, cache_index, 0, 0)
            )
            k, v = ck.astype(x.dtype), cv.astype(x.dtype)
        new_cache = (ck, cv)

    # GQA: repeat kv heads
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    q = q.transpose(0, 2, 1, 3)  # (B, H, S, Dh)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if (use_flash and cfg.attn_softcap is None and cfg.sm_scale is None
            and not cfg.force_xla_attention):
        # pallas online-softmax kernel; valid when query positions start at 0
        # (prefill) so the causal mask covers cache padding too
        from ao_tpu.ops import kernels as _kernels
        from ao_tpu.ops.pallas import UnsupportedShape

        if _kernels.on_tpu():
            try:
                from ao_tpu.ops.pallas.flash_attention import flash_attention

                out = flash_attention(q, k, v, causal=True)
                out = out.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
                return linear(out, layer["wo"]), new_cache
            except UnsupportedShape:
                pass

    if cfg.sdpa != "bf16":
        from ao_tpu.ops.attention import quantized_sdpa

        out = quantized_sdpa(
            q, k, v, dtype=cfg.sdpa, causal=False, mask=mask,
            sm_scale=hd ** -0.5, rotate=cfg.sdpa_rotate,
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
        return linear(out, layer["wo"]), new_cache

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    scores = scores * (cfg.sm_scale if cfg.sm_scale is not None
                       else hd ** -0.5)
    if cfg.attn_softcap:
        c = cfg.attn_softcap
        scores = jnp.tanh(scores / c) * c
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
    return linear(out, layer["wo"]), new_cache


def mlp(layer: Dict[str, Any], x: jax.Array, cfg=None) -> jax.Array:
    if "router" in layer:  # MoE FFN (Mixtral-style)
        from ao_tpu.moe.layer import MoEConfig, moe_forward

        mcfg = MoEConfig(dim=cfg.dim, ffn_dim=cfg.ffn_dim,
                         n_experts=cfg.n_experts, top_k=cfg.top_k_experts,
                         norm_topk=cfg.norm_topk_experts)
        return moe_forward(layer, x, mcfg)
    a, bq = linear(x, layer["w1"]), linear(x, layer["w3"])
    w2 = layer["w2"]
    from ao_tpu.ops.act_quant import producer_quant_ok

    if "r4" not in layer and producer_quant_ok(w2) and x.shape[-2] > 1:
        # prefill W8A8/W4A8: emit the SwiGLU gate as int8 qdata+scales in
        # one HBM pass (producer-epilogue quant, ops/pallas/fused_act.py)
        # — the standalone per-token quantize chain re-reads the f32
        # activation and cancels the int8 MXU win. Decode (S==1) keeps
        # the plain path: tiny activations, and the fused WO kernels own
        # that regime.
        from ao_tpu.ops.act_quant import silu_mul_quant

        return linear(silu_mul_quant(a, bq), w2)
    h = jax.nn.silu(a) * bq
    if "r4" in layer:
        # SpinQuant R4: online Hadamard on the down_proj contraction dim;
        # the matching Hᵀ is fused into w2 by algorithms.spinquant
        from ao_tpu.algorithms.spinquant import hadamard_transform

        h = hadamard_transform(h)
    return linear(h, layer["w2"])


def forward(
    params: Dict[str, Any],
    tokens: jax.Array,  # (B, S) int32
    cfg: LlamaConfig,
    positions: Optional[jax.Array] = None,
    kv_caches: Optional[list] = None,
    cache_index: Optional[jax.Array] = None,
    use_flash: bool = False,
) -> Tuple[jax.Array, Optional[list]]:
    """Returns (logits (B, S, V), new_kv_caches or None)."""
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    from ao_tpu.ops.embedding import embedding as embedding_op

    x = embedding_op(params["embed"], tokens, out_dtype=cfg.dtype)
    freqs = rope_freqs(cfg)

    if kv_caches is None:
        # causal mask over the local sequence
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        new_caches = None
    else:
        # decode: attend over cache positions <= current
        c0 = kv_caches[0][0]
        from ao_tpu.serving.paged import PagedKVPool

        if isinstance(c0, PagedKVPool):
            mask = None  # paged attention masks by per-sequence length
        else:
            # QuantKVCache: token capacity comes from the scale rows (int4
            # packs 8 tokens per qdata word row)
            t = c0.max_seq if hasattr(c0, "max_seq") else c0.shape[1]
            key_pos = jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
            mask = key_pos <= positions[:, None, :, None]
        new_caches = []

    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["ln1"], cfg.norm_eps)
        attn_out, new_c = attention(
            layer["attn"], h, cfg, positions, freqs, mask,
            kv_cache=None if kv_caches is None else kv_caches[i],
            cache_index=cache_index,
            use_flash=use_flash,
        )
        x = x + attn_out
        h = rms_norm(x, layer["ln2"], cfg.norm_eps)
        x = x + mlp(layer["mlp"], h, cfg)
        if new_caches is not None:
            new_caches.append(new_c)

    x = rms_norm(x, params["norm"], cfg.norm_eps)
    if cfg.tie_embeddings:
        emb = params["embed"]
        from ao_tpu.quantization.qarrays.base import QuantizedArray

        if isinstance(emb, QuantizedArray):
            # tied quantized table: dequant-transpose for the lm_head matmul
            # (ref: QuantizedTiedEmbedding, prototype .../embedding/api.py:117)
            logits = linear(x, emb.dequantize(cfg.dtype).T)
        else:
            logits = linear(x, emb.T)
    else:
        logits = linear(x, params["lm_head"])
    return logits.astype(jnp.float32), new_caches


def init_kv_caches(cfg: LlamaConfig, batch: int, max_seq: int,
                   dtype=jnp.bfloat16) -> list:
    return [
        (
            jnp.zeros((batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
            jnp.zeros((batch, max_seq, cfg.n_kv_heads, cfg.head_dim), dtype),
        )
        for _ in range(cfg.n_layers)
    ]
