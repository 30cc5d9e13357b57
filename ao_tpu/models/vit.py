"""Vision Transformer, pure-functional JAX.

(ref analog: the reference's vision benchmark models — ViT-L 2:4 sparse
training (torchao README.md:246, sparsity/README.md:28) and the SAM/Flux
image pipelines it quantizes with the same linear configs
(docs/source/workflows/inference.md:200). This is the framework's vision
family: a patch-embed conv + encoder stack whose every matmul goes through
``ao_tpu.ops.linear``/``ops.conv2d`` so quantize_/sparsify_ apply directly.)

Params are a nested-dict pytree like models/llama.py; weights are stored
(in_features, out_features). The patch-embed conv weight is HWIO and 4-D,
so `quantize_`'s default filter skips it — quantize it explicitly with
`ops.conv.quantize_conv_weight` when checkpoint size matters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ao_tpu.ops import linear
from ao_tpu.ops.conv import conv2d


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    mlp_dim: int = 3072
    n_classes: int = 1000
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


VIT_L16 = ViTConfig(dim=1024, n_layers=24, n_heads=16, mlp_dim=4096)
VIT_B16 = ViTConfig()
VIT_TINY = ViTConfig(image_size=32, patch_size=8, dim=64, n_layers=2,
                     n_heads=4, mlp_dim=128, n_classes=10, dtype=jnp.float32)


def init_params(key: jax.Array, cfg: ViTConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.n_layers + 3)

    def dense(k, fan_in, fan_out):
        w = jax.random.normal(k, (fan_in, fan_out), jnp.float32)
        return (w * (fan_in ** -0.5)).astype(cfg.dtype)

    d = cfg.dim
    p = cfg.patch_size
    patch_k = jax.random.normal(
        keys[0], (p, p, cfg.in_channels, d), jnp.float32
    ) * ((p * p * cfg.in_channels) ** -0.5)

    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i + 1], 6)
        layers.append({
            "ln1": {"scale": jnp.ones((d,), cfg.dtype),
                    "bias": jnp.zeros((d,), cfg.dtype)},
            "attn": {
                "wq": dense(ks[0], d, d), "wk": dense(ks[1], d, d),
                "wv": dense(ks[2], d, d), "wo": dense(ks[3], d, d),
            },
            "ln2": {"scale": jnp.ones((d,), cfg.dtype),
                    "bias": jnp.zeros((d,), cfg.dtype)},
            "mlp": {
                "w1": dense(ks[4], d, cfg.mlp_dim),
                "b1": jnp.zeros((cfg.mlp_dim,), cfg.dtype),
                "w2": dense(ks[5], cfg.mlp_dim, d),
                "b2": jnp.zeros((d,), cfg.dtype),
            },
        })

    return {
        "patch_embed": {"kernel": patch_k.astype(cfg.dtype),
                        "bias": jnp.zeros((d,), cfg.dtype)},
        "cls_token": jnp.zeros((1, 1, d), cfg.dtype),
        "pos_embed": (jax.random.normal(
            keys[-2], (1, cfg.n_patches + 1, d), jnp.float32
        ) * 0.02).astype(cfg.dtype),
        "layers": layers,
        "ln_f": {"scale": jnp.ones((d,), cfg.dtype),
                 "bias": jnp.zeros((d,), cfg.dtype)},
        "head": {"proj": dense(keys[-1], d, cfg.n_classes)},
    }


def _layernorm(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _proj(x, p, w, b):
    y = linear(x, p[w])
    if b in p:  # biases present when imported from HF checkpoints
        y = y + p[b].astype(y.dtype)
    return y


def _attention(p, x, cfg: ViTConfig):
    b, t, d = x.shape
    h, hd = cfg.n_heads, cfg.head_dim
    q = _proj(x, p, "wq", "bq").reshape(b, t, h, hd)
    k = _proj(x, p, "wk", "bk").reshape(b, t, h, hd)
    v = _proj(x, p, "wv", "bv").reshape(b, t, h, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    a = jax.nn.softmax(s * (hd ** -0.5), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, t, d)
    return _proj(o, p, "wo", "bo")


def forward(params: Dict[str, Any], images: jax.Array,
            cfg: ViTConfig) -> jax.Array:
    """images (N, H, W, C) → class logits (N, n_classes)."""
    pe = params["patch_embed"]
    x = conv2d(images.astype(cfg.dtype), pe["kernel"],
               stride=cfg.patch_size, padding="VALID", bias=pe["bias"])
    n = x.shape[0]
    x = x.reshape(n, -1, cfg.dim)
    cls = jnp.broadcast_to(params["cls_token"], (n, 1, cfg.dim))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    for lp in params["layers"]:
        x = x + _attention(lp["attn"], _layernorm(x, lp["ln1"], cfg.norm_eps),
                           cfg)
        h = _layernorm(x, lp["ln2"], cfg.norm_eps)
        h = jax.nn.gelu(linear(h, lp["mlp"]["w1"]) + lp["mlp"]["b1"])
        x = x + linear(h, lp["mlp"]["w2"]) + lp["mlp"]["b2"]
    x = _layernorm(x, params["ln_f"], cfg.norm_eps)
    return _proj(x[:, 0], params["head"], "proj", "bias").astype(jnp.float32)
