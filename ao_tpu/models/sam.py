"""SAM-class promptable segmentation model, pure-functional JAX.

(ref analog: the reference's segment-anything benchmark family — torchao
quantizes/sparsifies SAM's ViT-det image encoder for its headline "SAM 1.1x
inference / 1.3x training" rows, README.md:47,246 — plus the prompt-encoder/
mask-decoder pipeline those benchmarks serve. TPU re-design: windowed
attention is a pure reshape partition (static shapes, XLA-fusable),
decomposed relative-position terms are static-index einsums, every matmul
routes through ``ao_tpu.ops.linear`` and every conv through ``ops.conv`` so
quantize_/sparsify_ apply to the whole pipeline, and the two-way decoder is
plain einsum attention — no hooks or module surgery.)

The parameter structure mirrors the original SAM (facebook/sam-vit-*) so
real checkpoints import via ``integrations.torch_import.import_hf_sam``:
qkv/proj biases, per-layer decomposed rel-pos tables, 5-type point
embeddings (pad / neg / pos / box-corner x2), query-PE re-added per decoder
layer, 3-layer hypernetwork and IoU heads.

Three pieces, mirroring the SAM call contract:
- ``encode_image``: ViT-det encoder (patch conv, windowed + global blocks
  with decomposed rel-pos, conv neck) → (N, H/16, W/16, neck_dim)
  embedding, computed once per image.
- ``encode_points`` / ``encode_boxes``: sparse prompt embeddings.
- ``decode_masks``: two-way transformer + upscaler + hypernetwork MLPs →
  (N, n_masks, H/4, W/4) mask logits and (N, n_masks) IoU predictions.

Params are a nested-dict pytree like models/vit.py; linear weights are
stored (in_features, out_features).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.ops import linear
from ao_tpu.ops.conv import conv2d, conv_transpose2d


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    image_size: int = 1024
    patch_size: int = 16
    in_channels: int = 3
    # image encoder (ViT-det)
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    mlp_ratio: int = 4
    window_size: int = 14
    global_attn_layers: Tuple[int, ...] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    neck_dim: int = 256
    # mask decoder
    decoder_layers: int = 2
    decoder_heads: int = 8
    decoder_mlp_mult: int = 8
    n_mask_tokens: int = 4
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


# TP rules beyond the built-in megatron set (pass to shard_params alongside
# DEFAULT_TP_RULES): prompt/decoder embedding tables and the small decoder
# convs live on every device; the encoder attn/mlp linears are covered by
# the default wq/wk/wv/wo/w1/w2 rules.
TP_RULES = (
    (r"(^|\.)(pe_gaussian|point_embed|no_mask_embed)$", "replicate"),
    (r"(^|\.)(rel_pos_h|rel_pos_w)$", "replicate"),
    # neck convs and the whole two-way decoder (incl. its linears, token
    # table, upscaler convs, hypernet/iou heads) are small next to the
    # encoder; replicate them so per-prompt decode needs no collectives
    (r"(^|\.)decoder\.", "replicate"),
    (r"neck\.conv\d\.kernel$", "replicate"),
)

SAM_B = SAMConfig()
SAM_L = SAMConfig(dim=1024, n_layers=24, n_heads=16,
                  global_attn_layers=(5, 11, 17, 23))
SAM_TINY = SAMConfig(image_size=64, patch_size=8, dim=64, n_layers=2,
                     n_heads=4, window_size=4, global_attn_layers=(1,),
                     neck_dim=32, decoder_heads=4, dtype=jnp.float32)


def _dense(k, fan_in, fan_out, dtype):
    w = jax.random.normal(k, (fan_in, fan_out), jnp.float32)
    return (w * (fan_in ** -0.5)).astype(dtype)


def _attn_params(key, dim, dtype):
    ks = jax.random.split(key, 4)
    return {"wq": _dense(ks[0], dim, dim, dtype),
            "bq": jnp.zeros((dim,), dtype),
            "wk": _dense(ks[1], dim, dim, dtype),
            "bk": jnp.zeros((dim,), dtype),
            "wv": _dense(ks[2], dim, dim, dtype),
            "bv": jnp.zeros((dim,), dtype),
            "wo": _dense(ks[3], dim, dim, dtype),
            "bo": jnp.zeros((dim,), dtype)}


def _cross_attn_params(key, q_dim, kv_dim, inner, dtype):
    ks = jax.random.split(key, 4)
    return {"wq": _dense(ks[0], q_dim, inner, dtype),
            "bq": jnp.zeros((inner,), dtype),
            "wk": _dense(ks[1], kv_dim, inner, dtype),
            "bk": jnp.zeros((inner,), dtype),
            "wv": _dense(ks[2], kv_dim, inner, dtype),
            "bv": jnp.zeros((inner,), dtype),
            "wo": _dense(ks[3], inner, q_dim, dtype),
            "bo": jnp.zeros((q_dim,), dtype)}


def _ln_params(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def _mlp_params(key, dim, hidden, out, dtype):
    k1, k2 = jax.random.split(key)
    return {"w1": _dense(k1, dim, hidden, dtype),
            "b1": jnp.zeros((hidden,), dtype),
            "w2": _dense(k2, hidden, out, dtype),
            "b2": jnp.zeros((out,), dtype)}


def _mlp3_params(key, dim, hidden, out, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"w1": _dense(k1, dim, hidden, dtype),
            "b1": jnp.zeros((hidden,), dtype),
            "w2": _dense(k2, hidden, hidden, dtype),
            "b2": jnp.zeros((hidden,), dtype),
            "w3": _dense(k3, hidden, out, dtype),
            "b3": jnp.zeros((out,), dtype)}


def init_params(key: jax.Array, cfg: SAMConfig) -> Dict[str, Any]:
    dt = cfg.dtype
    keys = jax.random.split(
        key, cfg.n_layers + cfg.decoder_layers + 12 + cfg.n_mask_tokens)
    d, nd = cfg.dim, cfg.neck_dim
    p = cfg.patch_size

    patch_k = jax.random.normal(
        keys[0], (p, p, cfg.in_channels, d), jnp.float32
    ) * ((p * p * cfg.in_channels) ** -0.5)

    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i + 1], 2)
        lp = {
            "ln1": _ln_params(d, dt),
            "attn": _attn_params(ks[0], d, dt),
            "ln2": _ln_params(d, dt),
            "mlp": _mlp_params(ks[1], d, cfg.mlp_ratio * d, d, dt),
        }
        if cfg.use_rel_pos:
            # zero-init decomposed tables (the ViTDet default); size spans
            # the layer's attention extent (window or full grid)
            span = cfg.grid if i in cfg.global_attn_layers else cfg.window_size
            lp["attn"]["rel_pos_h"] = jnp.zeros(
                (2 * span - 1, cfg.head_dim), dt)
            lp["attn"]["rel_pos_w"] = jnp.zeros(
                (2 * span - 1, cfg.head_dim), dt)
        layers.append(lp)

    ko = keys[cfg.n_layers + 1:]
    decoder = []
    for i in range(cfg.decoder_layers):
        ks = jax.random.split(ko[i], 4)
        decoder.append({
            "self_attn": _attn_params(ks[0], nd, dt),
            "ln1": _ln_params(nd, dt),
            "cross_t2i": _cross_attn_params(ks[1], nd, nd, nd // 2, dt),
            "ln2": _ln_params(nd, dt),
            "mlp": _mlp_params(ks[2], nd, cfg.decoder_mlp_mult * nd, nd, dt),
            "ln3": _ln_params(nd, dt),
            "cross_i2t": _cross_attn_params(ks[3], nd, nd, nd // 2, dt),
            "ln4": _ln_params(nd, dt),
        })
    kd = ko[cfg.decoder_layers:]

    n_tok = 1 + cfg.n_mask_tokens  # iou token + mask tokens
    return {
        "patch_embed": {"kernel": patch_k.astype(dt),
                        "bias": jnp.zeros((d,), dt)},
        "pos_embed": (jax.random.normal(
            kd[0], (1, cfg.grid, cfg.grid, d), jnp.float32) * 0.02).astype(dt),
        "layers": layers,
        "neck": {
            "conv1": {"kernel": _dense(kd[1], d, nd, dt).reshape(1, 1, d, nd)},
            "ln1": _ln_params(nd, dt),
            "conv2": {"kernel": (jax.random.normal(
                kd[2], (3, 3, nd, nd), jnp.float32
            ) * ((9 * nd) ** -0.5)).astype(dt)},
            "ln2": _ln_params(nd, dt),
        },
        "prompt": {
            # 5 rows: [not-a-point, neg point, pos point, box TL, box BR]
            # (the original's point_embeddings[0..3] + not_a_point_embed)
            "point_embed": (jax.random.normal(
                kd[3], (5, nd), jnp.float32) * 0.02).astype(dt),
            # random-Fourier positional encoding matrix (frozen at init)
            "pe_gaussian": (jax.random.normal(
                kd[4], (2, nd // 2), jnp.float32)).astype(jnp.float32),
            "no_mask_embed": (jax.random.normal(
                kd[5], (1, nd), jnp.float32) * 0.02).astype(dt),
        },
        "decoder": {
            "tokens": (jax.random.normal(
                kd[6], (n_tok, nd), jnp.float32) * 0.02).astype(dt),
            "layers": decoder,
            "final_t2i": _cross_attn_params(kd[7], nd, nd, nd // 2, dt),
            "ln_final": _ln_params(nd, dt),
            "up1": {"kernel": (jax.random.normal(
                kd[8], (2, 2, nd, nd // 4), jnp.float32
            ) * ((4 * nd) ** -0.5)).astype(dt),
                "bias": jnp.zeros((nd // 4,), dt)},
            "up_ln": _ln_params(nd // 4, dt),
            "up2": {"kernel": (jax.random.normal(
                kd[9], (2, 2, nd // 4, nd // 8), jnp.float32
            ) * (nd ** -0.5)).astype(dt),
                "bias": jnp.zeros((nd // 8,), dt)},
            "hyper_mlps": [
                _mlp3_params(kd[10 + i], nd, nd, nd // 8, dt)
                for i in range(cfg.n_mask_tokens)
            ],
            "iou_head": _mlp3_params(kd[10 + cfg.n_mask_tokens], nd, nd,
                                     cfg.n_mask_tokens, dt),
        },
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
    if b in p:
        y = y + p[b].astype(y.dtype)
    return y


def _rel_pos_bias(q, attn, p, side, n_heads):
    """Decomposed relative-position term (ViTDet): q (B, S*S, nh, hd),
    attn (B, nh, S*S, S*S) logits over a side×side grid.

    The textbook form — reshape attn to 6-D and broadcast-add
    rel_h[..., :, None] + rel_w[..., None, :] — measured 3953us PER
    WINDOWED LAYER on v5e (13.7x the 312us attention itself; the 6-D
    relayouts dominate the whole SAM encoder). Instead expand the
    decomposed terms to full (T, T) bias via static 0/1 EXPANSION
    matrices on the MXU: bias = rel_h @ Eh + rel_w @ Ew with
    Eh[j, k] = [k//side == j], Ew[j, k] = [k%side == j] — everything
    stays 4-D and the bias add fuses into the softmax input."""
    b = q.shape[0]
    rel_h, rel_w = _rel_pos_terms(q, p, side)  # (B, nh, T, side) each
    t = side * side
    cols = jnp.arange(t)
    eh = (cols[None, :] // side == jnp.arange(side)[:, None]).astype(rel_h.dtype)
    ew = (cols[None, :] % side == jnp.arange(side)[:, None]).astype(rel_w.dtype)
    bias = rel_h @ eh + rel_w @ ew
    return attn + bias


def _rel_pos_terms(q, p, side):
    """Decomposed rel-pos partial terms: q (B, S*S, nh, hd) →
    rel_h/rel_w (B, nh, S*S, side) f32 (rel_h[..., t, ky] pairs q-row t
    with key row ky; rel_w with key column kx). The einsums contract in
    bf16 with f32 accumulation — q and the tables are bf16 already, so
    upcasting the operands only doubled their traffic."""
    b = q.shape[0]
    hd = q.shape[-1]
    # table row (side-1) + (qi - ki) — static gather: (side, side, hd)
    idx = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = jnp.take(p["rel_pos_h"], idx, axis=0)
    rw = jnp.take(p["rel_pos_w"], idx, axis=0)
    rq = q.reshape(b, side, side, -1, hd)
    rel_h = jnp.einsum("byxnc,ykc->bnyxk", rq, rh,
                       preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("byxnc,xkc->bnyxk", rq, rw,
                       preferred_element_type=jnp.float32)
    n_heads = rel_h.shape[1]
    return (rel_h.reshape(b, n_heads, side * side, side),
            rel_w.reshape(b, n_heads, side * side, side))


def _mha(p, q_in, k_in, n_heads, v_in=None, rel_side: Optional[int] = None):
    """Multi-head attention through quantizable linears; q_in (B, Q, Dq),
    k_in (B, K, Dkv), v defaults to k_in (pass v_in when keys carry a
    positional term the values must not); optional decomposed rel-pos over
    a square grid."""
    if v_in is None:
        v_in = k_in
    b, tq, _ = q_in.shape
    tk = k_in.shape[1]
    q = _proj(q_in, p, "wq", "bq")
    k = _proj(k_in, p, "wk", "bk")
    v = _proj(v_in, p, "wv", "bv")
    inner = q.shape[-1]
    hd = inner // n_heads
    q = q.reshape(b, tq, n_heads, hd)
    k = k.reshape(b, tk, n_heads, hd)
    v = v.reshape(b, tk, n_heads, hd)
    if rel_side is not None and "rel_pos_h" in p and tq == tk:
        # fused Pallas path: the (B, nh, T, T) score + bias tensors never
        # touch HBM (windowed layer 1088us -> kernel, see
        # ops/pallas/window_attention.py); falls back to the XLA form off
        # TPU or on unsupported shapes
        from ao_tpu.ops import kernels as _kernels

        if _kernels.on_tpu():
            from ao_tpu.ops.pallas import UnsupportedShape
            from ao_tpu.ops.pallas.window_attention import (
                window_bias_attention,
            )

            try:
                rel_h, rel_w = _rel_pos_terms(q, p, rel_side)
                o = window_bias_attention(
                    q, k, v, rel_h, rel_w, side=rel_side, scale=hd ** -0.5)
                return _proj(o.astype(q_in.dtype), p, "wo", "bo")
            except UnsupportedShape:
                pass
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * (hd ** -0.5)
    if rel_side is not None and "rel_pos_h" in p:
        s = _rel_pos_bias(q, s, p, rel_side, n_heads)
    a = jax.nn.softmax(s, axis=-1).astype(q_in.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, tq, inner)
    return _proj(o, p, "wo", "bo")


def _window_partition(x, w):
    """(B, H, W, C) → (B*nW, w*w, C) with H, W divisible by w (static)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_merge(x, w, b, h, wd):
    c = x.shape[-1]
    x = x.reshape(b, h // w, wd // w, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wd, c)


def encode_image(params: Dict[str, Any], images: jax.Array,
                 cfg: SAMConfig) -> jax.Array:
    """images (N, H, W, C) → image embedding (N, grid, grid, neck_dim)."""
    pe = params["patch_embed"]
    x = conv2d(images.astype(cfg.dtype), pe["kernel"],
               stride=cfg.patch_size, padding="VALID", bias=pe["bias"])
    x = x + params["pos_embed"].astype(x.dtype)
    b, h, w, d = x.shape
    ws = cfg.window_size
    pad_h = (-h) % ws
    pad_w = (-w) % ws
    hp, wp = h + pad_h, w + pad_w

    # The residual stream stays WINDOW-PARTITIONED across consecutive
    # windowed layers and merges back only around global-attention layers:
    # the 6-D partition/merge transposes measured ~1.4ms each on v5e
    # (device_op_breakdown, ~29% of the SAM-B/512 encoder step when done
    # per layer, 8+8 of them) — runs of windowed layers need one each.
    # Numerics are IDENTICAL to per-layer partitioning: every in-run op is
    # per-token, and pad rows influence real tokens only as attention
    # keys/values, which enter as exact zeros both ways (per-layer code
    # zero-pads the NORMED branch; here the normed branch is multiplied by
    # the pad-validity mask — pad-row residual drift never escapes).
    if pad_h or pad_w:
        v2d = ((jnp.arange(hp) < h)[:, None]
               & (jnp.arange(wp) < w)[None, :])
        vmask = _window_partition(
            jnp.broadcast_to(v2d[None, :, :, None], (b, hp, wp, 1)
                             ).astype(cfg.dtype), ws)  # (b*nw, ws*ws, 1)
    else:
        vmask = None

    from ao_tpu.ops.act_quant import producer_quant_ok as _w8a8

    def _mlp(xin, lp):
        w1, w2 = lp["mlp"]["w1"], lp["mlp"]["w2"]
        if _w8a8(w1) and _w8a8(w2):
            # producer-epilogue quant: affine LN == modulate with
            # smod=scale-1 / shift=bias; GELU emits int8 directly — the
            # f32 activation never round-trips HBM (fused_act.py)
            from ao_tpu.ops.act_quant import (
                gelu_quant, norm_modulate_quant,
            )

            shp = xin.shape
            x3 = xin.reshape(shp[0], -1, shp[-1])
            bsz = shp[0]
            g = jnp.broadcast_to(lp["ln2"]["scale"][None],
                                 (bsz, shp[-1])) - 1.0
            bb = jnp.broadcast_to(lp["ln2"]["bias"][None], (bsz, shp[-1]))
            qa = norm_modulate_quant(x3, bb, g, cfg.norm_eps)
            up = linear(qa, w1) + lp["mlp"]["b1"]
            out = linear(gelu_quant(up), w2) + lp["mlp"]["b2"]
            return xin + out.reshape(shp[:-1] + (out.shape[-1],))
        hmid = _layernorm(xin, lp["ln2"], cfg.norm_eps)
        hmid = jax.nn.gelu(linear(hmid, w1) + lp["mlp"]["b1"])
        return xin + linear(hmid, w2) + lp["mlp"]["b2"]

    layers = params["layers"]
    glb = set(cfg.global_attn_layers)
    i, n_layers = 0, len(layers)
    while i < n_layers:
        if i in glb:
            lp = layers[i]
            if _w8a8(lp["attn"]["wq"]):
                # global layers have no pad mask: LN emits int8 straight
                # into the three QKV linears (one producer-quant pass)
                from ao_tpu.ops.act_quant import norm_modulate_quant

                g1 = jnp.broadcast_to(lp["ln1"]["scale"][None],
                                      (b, d)) - 1.0
                b1 = jnp.broadcast_to(lp["ln1"]["bias"][None], (b, d))
                xa = norm_modulate_quant(x.reshape(b, h * w, d), b1, g1,
                                         cfg.norm_eps)
            else:
                xa = _layernorm(x, lp["ln1"], cfg.norm_eps
                                ).reshape(b, h * w, d)
            xa = _mha(lp["attn"], xa, xa, cfg.n_heads, rel_side=h)
            x = x + xa.reshape(b, h, w, d)
            x = _mlp(x, lp)
            i += 1
            continue
        # windowed run [i, j): one partition, one merge
        if pad_h or pad_w:
            xw = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        else:
            xw = x
        xw = _window_partition(xw, ws)  # (b*nw, ws*ws, d)
        while i < n_layers and i not in glb:
            lp = layers[i]
            xa = _layernorm(xw, lp["ln1"], cfg.norm_eps)
            if vmask is not None:
                xa = xa * vmask
            xa = _mha(lp["attn"], xa, xa, cfg.n_heads, rel_side=ws)
            xw = xw + xa
            xw = _mlp(xw, lp)
            i += 1
        x = _window_merge(xw, ws, b, hp, wp)[:, :h, :w]
    nk = params["neck"]
    x = conv2d(x, nk["conv1"]["kernel"], stride=1, padding="SAME")
    x = _layernorm(x, nk["ln1"], cfg.norm_eps)
    x = conv2d(x, nk["conv2"]["kernel"], stride=1, padding="SAME")
    return _layernorm(x, nk["ln2"], cfg.norm_eps)


def _point_pe(prompt, coords, image_size):
    """Random-Fourier positional encoding of (x, y) pixel coords (shifted
    to pixel centers, the original's convention)."""
    norm = (coords.astype(jnp.float32) + 0.5) / image_size * 2.0 - 1.0
    proj = norm @ prompt["pe_gaussian"] * (2.0 * jnp.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def encode_points(params: Dict[str, Any], coords: jax.Array,
                  labels: jax.Array, cfg: SAMConfig) -> jax.Array:
    """coords (N, P, 2) pixel xy; labels (N, P) in {-1 pad, 0 neg, 1 pos,
    2 box-TL, 3 box-BR} → sparse prompt embeddings (N, P, neck_dim)."""
    prompt = params["prompt"]
    pe = _point_pe(prompt, coords, cfg.image_size).astype(cfg.dtype)
    emb = prompt["point_embed"].astype(cfg.dtype)[labels + 1]
    # padding points keep only their label embedding (no position)
    pe = jnp.where((labels == -1)[..., None], 0.0, pe)
    return pe + emb


def encode_boxes(params: Dict[str, Any], boxes: jax.Array,
                 cfg: SAMConfig) -> jax.Array:
    """boxes (N, B, 4) pixel (x1, y1, x2, y2) → embeddings (N, 2B, nd):
    each box becomes its two corner points with the TL/BR label types."""
    n, nb, _ = boxes.shape
    corners = boxes.reshape(n, nb * 2, 2)
    labels = jnp.tile(jnp.array([2, 3], jnp.int32), (n, nb))
    return encode_points(params, corners, labels, cfg)


def _grid_pe(params, cfg: SAMConfig):
    g = cfg.grid
    # patch centers; -0.5 cancels _point_pe's pixel-center shift (the grid
    # PE normalizes (i+0.5)/grid exactly, per the original)
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) * cfg.patch_size - 0.5
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
    coords = jnp.stack([gx, gy], axis=-1).reshape(1, g * g, 2)
    return _point_pe(params["prompt"], coords, cfg.image_size)


def decode_masks(
    params: Dict[str, Any],
    image_embed: jax.Array,
    sparse_prompt: jax.Array,
    cfg: SAMConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Two-way transformer decode.

    image_embed (N, g, g, nd); sparse_prompt (N, P, nd) →
    (mask logits (N, n_mask_tokens, 4g, 4g), iou predictions (N, n_mask_tokens)).
    """
    dec = params["decoder"]
    prompt = params["prompt"]
    n, g, _, nd = image_embed.shape
    base = dec["tokens"].astype(image_embed.dtype)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(base[None], (n,) + base.shape), sparse_prompt],
        axis=1,
    )
    # dense prompt: with no mask input, the learned no-mask embedding is
    # added to every image-embedding position (original prompt encoder)
    src = image_embed.reshape(n, g * g, nd)
    src = src + prompt["no_mask_embed"].astype(src.dtype)
    img_pe = _grid_pe(params, cfg).astype(src.dtype)

    q = tokens
    qpe = tokens  # query PE = the initial token embeddings, re-added per layer
    for li, lp in enumerate(dec["layers"]):
        if li == 0:
            # first layer: self-attention REPLACES the queries (the
            # original's skip_first_layer_pe branch — q, k, v all the raw
            # tokens, no residual)
            q = _mha(lp["self_attn"], q, q, cfg.decoder_heads)
        else:
            sq = q + qpe
            q = q + _mha(lp["self_attn"], sq, sq, cfg.decoder_heads, v_in=q)
        q = _layernorm(q, lp["ln1"], cfg.norm_eps)
        q = _layernorm(
            q + _mha(lp["cross_t2i"], q + qpe, src + img_pe,
                     cfg.decoder_heads, v_in=src),
            lp["ln2"], cfg.norm_eps)
        h = jax.nn.relu(linear(q, lp["mlp"]["w1"]) + lp["mlp"]["b1"])
        q = _layernorm(q + linear(h, lp["mlp"]["w2"]) + lp["mlp"]["b2"],
                       lp["ln3"], cfg.norm_eps)
        src = _layernorm(
            src + _mha(lp["cross_i2t"], src + img_pe, q + qpe,
                       cfg.decoder_heads, v_in=q),
            lp["ln4"], cfg.norm_eps)

    q = _layernorm(
        q + _mha(dec["final_t2i"], q + qpe, src + img_pe, cfg.decoder_heads,
                 v_in=src),
        dec["ln_final"], cfg.norm_eps)

    iou_tok = q[:, 0]
    mask_toks = q[:, 1:1 + cfg.n_mask_tokens]

    img = src.reshape(n, g, g, nd)
    up = conv_transpose2d(img, dec["up1"]["kernel"], stride=2,
                          bias=dec["up1"]["bias"])
    up = jax.nn.gelu(_layernorm(up, dec["up_ln"], cfg.norm_eps))
    up = jax.nn.gelu(conv_transpose2d(up, dec["up2"]["kernel"], stride=2,
                                      bias=dec["up2"]["bias"]))

    def mlp3(t, mp):
        # the original's output MLPs use ReLU (encoder/upscaler use GELU)
        t = jax.nn.relu(linear(t, mp["w1"]) + mp["b1"])
        t = jax.nn.relu(linear(t, mp["w2"]) + mp["b2"])
        return linear(t, mp["w3"]) + mp["b3"]

    hyper = [mlp3(mask_toks[:, i], mp)
             for i, mp in enumerate(dec["hyper_mlps"])]
    hyper_w = jnp.stack(hyper, axis=1)  # (N, n_masks, nd/8)
    masks = jnp.einsum("nmc,nhwc->nmhw", hyper_w, up).astype(jnp.float32)

    iou = mlp3(iou_tok, dec["iou_head"])
    return masks, iou.astype(jnp.float32)


def forward(params: Dict[str, Any], images: jax.Array, coords: jax.Array,
            labels: jax.Array, cfg: SAMConfig) -> Tuple[jax.Array, jax.Array]:
    """Full pipeline: images + point prompts → (mask logits, iou)."""
    emb = encode_image(params, images, cfg)
    sparse = encode_points(params, coords, labels, cfg)
    return decode_masks(params, emb, sparse, cfg)
