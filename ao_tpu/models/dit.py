"""Diffusion Transformer (DiT), pure-functional JAX.

(ref analog: the reference's diffusion benchmark rows — Flux.1-dev
fp8-rowwise 1.21-1.24x / mxfp8 1.14-1.16x / nvfp4 1.30-1.37x
(docs/source/workflows/inference.md:200-205) — which it reaches by
applying the same linear configs to a diffusion transformer's matmuls.
This is the framework's diffusion family: the public DiT architecture
(patchify conv + adaLN-Zero transformer blocks + unpatchify), every
matmul routed through ``ao_tpu.ops.linear``/``ops.conv2d`` so
``quantize_``/``sparsify_`` apply unchanged, plus a jit-friendly
``lax.scan`` DDIM sampler with classifier-free guidance.)

Unlike decode-LLM inference, a denoise step is COMPUTE-bound (every
weight is read once per latent batch, seq_len ~ 256-1024): the win from
quantization here is int8/fp8 MXU throughput + halved weight residency,
mirroring the reference's prefill-style speedups — so the natural
configs are fp8-dyn / W4A8 / int8-dyn, not weight-only.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ao_tpu.ops import linear
from ao_tpu.ops.conv import conv2d


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    input_size: int = 32          # latent spatial size (SD-VAE: image/8)
    patch_size: int = 2
    in_channels: int = 4
    dim: int = 1152
    n_layers: int = 28
    n_heads: int = 16
    mlp_ratio: int = 4
    n_classes: int = 1000         # class-conditional; index n_classes = ∅
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def n_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def mlp_dim(self) -> int:
        return self.dim * self.mlp_ratio


DIT_XL2 = DiTConfig()             # DiT-XL/2 (675M)
DIT_B2 = DiTConfig(dim=768, n_layers=12, n_heads=12)
DIT_TINY = DiTConfig(input_size=8, patch_size=2, in_channels=4, dim=64,
                     n_layers=2, n_heads=4, n_classes=10, dtype=jnp.float32)

# TP rule extensions for shard_params(rules=...): attention/MLP names match
# the built-in megatron rules; everything conditioning-related modulates the
# full-width residual stream on every device, so it replicates explicitly.
TP_RULES = (
    (r"(^|\.)mod$", "replicate"),        # adaLN-Zero modulation (d, 6d)
    (r"(^|\.)y_embed$", "replicate"),    # label table (n_classes+1, d)
    (r"(^|\.)(t_w1|t_w2)$", "replicate"),  # timestep MLP
    (r"final\.out$", "replicate"),       # unpatchify projection (d, p²·c)
)


def init_params(key: jax.Array, cfg: DiTConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.n_layers + 4)

    def dense(k, fan_in, fan_out, scale=None):
        w = jax.random.normal(k, (fan_in, fan_out), jnp.float32)
        return (w * (scale if scale is not None else fan_in ** -0.5)).astype(
            cfg.dtype)

    d, p = cfg.dim, cfg.patch_size
    patch_k = (jax.random.normal(keys[0], (p, p, cfg.in_channels, d),
                                 jnp.float32)
               * ((p * p * cfg.in_channels) ** -0.5))

    kt = jax.random.split(keys[1], 2)
    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i + 2], 7)
        layers.append({
            "attn": {
                "wq": dense(ks[0], d, d), "wk": dense(ks[1], d, d),
                "wv": dense(ks[2], d, d), "wo": dense(ks[3], d, d),
            },
            "mlp": {
                "w1": dense(ks[4], d, cfg.mlp_dim),
                "w2": dense(ks[5], cfg.mlp_dim, d),
            },
            # adaLN-Zero: (d -> 6d) modulation from the conditioning vector;
            # zero-init so every block starts as identity (gates = 0)
            "mod": jnp.zeros((d, 6 * d), cfg.dtype),
            "mod_b": jnp.zeros((6 * d,), cfg.dtype),
        })

    return {
        "patch_embed": {"kernel": patch_k.astype(cfg.dtype),
                        "bias": jnp.zeros((d,), cfg.dtype)},
        "pos_embed": (jax.random.normal(keys[-2], (1, cfg.n_patches, d),
                                        jnp.float32) * 0.02).astype(cfg.dtype),
        "layers": layers,
        # timestep MLP over the sinusoidal embedding + label table (+∅ row)
        "t_w1": dense(kt[0], 256, d),
        "t_w2": dense(kt[1], d, d),
        "y_embed": (jax.random.normal(keys[-1], (cfg.n_classes + 1, d),
                                      jnp.float32) * 0.02).astype(cfg.dtype),
        "final": {
            # zero-init like the reference DiT: the net starts predicting 0
            "mod": jnp.zeros((d, 2 * d), cfg.dtype),
            "mod_b": jnp.zeros((2 * d,), cfg.dtype),
            "out": jnp.zeros((d, p * p * cfg.in_channels), cfg.dtype),
        },
    }


def timestep_embedding(t: jax.Array, dim: int = 256,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding of (continuous) timesteps t (B,) → (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _norm(x, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _attention(p, x, cfg: DiTConfig):
    b, t, d = x.shape
    h, hd = cfg.n_heads, cfg.head_dim
    q = linear(x, p["wq"]).reshape(b, t, h, hd)
    k = linear(x, p["wk"]).reshape(b, t, h, hd)
    v = linear(x, p["wv"]).reshape(b, t, h, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    a = jax.nn.softmax(s * (hd ** -0.5), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, t, d)
    return linear(o, p["wo"])


def forward(params: Dict[str, Any], x: jax.Array, t: jax.Array,
            y: jax.Array, cfg: DiTConfig) -> jax.Array:
    """Predict noise ε for latents x (B, H, W, C), timesteps t (B,) in
    [0, 1000), class labels y (B,) ints (cfg.n_classes = unconditional)."""
    pe = params["patch_embed"]
    h = conv2d(x.astype(cfg.dtype), pe["kernel"], stride=cfg.patch_size,
               padding="VALID", bias=pe["bias"])
    b = h.shape[0]
    h = h.reshape(b, -1, cfg.dim) + params["pos_embed"].astype(cfg.dtype)

    temb = timestep_embedding(t).astype(cfg.dtype)
    c = linear(jax.nn.silu(linear(temb, params["t_w1"])), params["t_w2"])
    c = c + params["y_embed"][y].astype(cfg.dtype)
    c_act = jax.nn.silu(c.astype(jnp.float32)).astype(cfg.dtype)

    # producer-epilogue activation quant: when the block linears carry an
    # int8 per-token dynamic-activation spec, emit int8 qdata + scales
    # straight out of the LN-modulate / GELU producers so the f32
    # activation never round-trips HBM (the standalone quantize chain
    # measured ~3.5ms/step on DiT-XL — it cancelled the int8 MXU win)
    from ao_tpu.ops.act_quant import gelu_quant, norm_modulate_quant

    from ao_tpu.ops.act_quant import producer_quant_ok as _w8a8

    for lp in params["layers"]:
        m = linear(c_act, lp["mod"]) + lp["mod_b"]
        # canonical DiT chunk order: shift/scale/gate for attn, then mlp
        sh_att, s_att, g_att, sh_mlp, s_mlp, g_mlp = (
            m[:, j * cfg.dim:(j + 1) * cfg.dim] for j in range(6))
        if _w8a8(lp["attn"]["wq"]):
            a_in = norm_modulate_quant(h, sh_att, s_att, cfg.norm_eps)
        else:
            a_in = _modulate(_norm(h, cfg.norm_eps), sh_att, s_att)
        h = h + g_att[:, None, :] * _attention(lp["attn"], a_in, cfg)
        if _w8a8(lp["mlp"]["w1"]):
            m_in = norm_modulate_quant(h, sh_mlp, s_mlp, cfg.norm_eps)
        else:
            m_in = _modulate(_norm(h, cfg.norm_eps), sh_mlp, s_mlp)
        up = linear(m_in, lp["mlp"]["w1"])
        if _w8a8(lp["mlp"]["w2"]):
            mlp = linear(gelu_quant(up), lp["mlp"]["w2"])
        else:
            mlp = linear(jax.nn.gelu(up, approximate=True), lp["mlp"]["w2"])
        h = h + g_mlp[:, None, :] * mlp

    fm = linear(c_act, params["final"]["mod"]) + params["final"]["mod_b"]
    h = _modulate(_norm(h, cfg.norm_eps), fm[:, :cfg.dim], fm[:, cfg.dim:])
    h = linear(h, params["final"]["out"])

    # unpatchify (B, n_patches, p*p*C) → (B, H, W, C)
    p, ch = cfg.patch_size, cfg.in_channels
    g = cfg.input_size // p
    h = h.reshape(b, g, g, p, p, ch)
    h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, cfg.input_size, cfg.input_size, ch)
    return h.astype(jnp.float32)


def sample(params: Dict[str, Any], cfg: DiTConfig, key: jax.Array,
           labels: jax.Array, steps: int = 50,
           guidance_scale: Optional[float] = None,
           n_train_timesteps: int = 1000) -> jax.Array:
    """DDIM (η=0) sampling: (B,) labels → (B, H, W, C) latents, one
    ``lax.scan`` over denoise steps — jits whole, no host control flow."""
    b = labels.shape[0]
    shape = (b, cfg.input_size, cfg.input_size, cfg.in_channels)
    x = jax.random.normal(key, shape, jnp.float32)

    # cosine ᾱ schedule (Nichol & Dhariwal), evaluated at the DDIM subsequence
    ts = jnp.linspace(n_train_timesteps - 1, 0, steps)

    def alpha_bar(t):
        f = jnp.cos((t / n_train_timesteps + 0.008) / 1.008 * jnp.pi / 2)
        return f * f

    def eps_of(x, t):
        tb = jnp.full((b,), t, jnp.float32)
        if guidance_scale is None:
            return forward(params, x, tb, labels, cfg)
        # classifier-free guidance: conditional + null-label passes batched
        x2 = jnp.concatenate([x, x], 0)
        t2 = jnp.concatenate([tb, tb], 0)
        y2 = jnp.concatenate(
            [labels, jnp.full_like(labels, cfg.n_classes)], 0)
        e = forward(params, x2, t2, y2, cfg)
        e_c, e_u = e[:b], e[b:]
        return e_u + guidance_scale * (e_c - e_u)

    def step(x, i):
        t = ts[i]
        t_prev = jnp.where(i + 1 < steps, ts[jnp.minimum(i + 1, steps - 1)],
                           jnp.float32(0.0))
        ab_t, ab_p = alpha_bar(t), alpha_bar(t_prev)
        eps = eps_of(x, t)
        x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
        x = jnp.sqrt(ab_p) * x0 + jnp.sqrt(1.0 - ab_p) * eps
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(steps))
    return x
