"""Import torch state_dicts (HF Llama layout) into ao_tpu param pytrees.

The migration path for reference (pytorch/ao) users: load the same HF
checkpoint torch serves, convert once (transpose nn.Linear's (out, in) to
this framework's (in, out)), then `quantize_` / `quantize_on_load`.

Works with plain dict[str, torch.Tensor] or dict[str, np.ndarray] — torch
is only touched if the values are torch tensors (CPU copy via numpy).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np


def _to_np(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (cpu) — avoid importing torch unless needed
    if hasattr(v, "detach"):
        v = v.detach()
        if hasattr(v, "to") and str(getattr(v, "dtype", "")) == "torch.bfloat16":
            v = v.float()
        return v.cpu().numpy()
    return np.asarray(v)


def import_linear(v, dtype=jnp.bfloat16):
    """torch nn.Linear weight (out, in) → (in, out)."""
    return jnp.asarray(_to_np(v).T).astype(dtype)


def _gate_up_split(gate_up, down, dtype):
    """Phi-3 fused MLP: gate_up_proj rows [gate | up] → w1/w3 + down → w2
    (transformers Phi3MLP chunks the output as (gate, up))."""
    w = _to_np(gate_up)
    f = w.shape[0] // 2
    return {
        "w1": import_linear(w[:f], dtype),
        "w3": import_linear(w[f:], dtype),
        "w2": import_linear(down, dtype),
    }


def _qwen_moe_from(sd, p, dtype):
    """Qwen3-MoE ``mlp`` → the framework's MoE dict: router = ``mlp.gate``,
    experts stacked from ``mlp.experts.{j}.{gate,up,down}_proj`` (the
    Qwen3MoeSparseMoeBlock layout — per-expert Qwen3MoeMLP modules)."""
    b = p + "mlp."
    n_experts = 0
    while b + f"experts.{n_experts}.gate_proj.weight" in sd:
        n_experts += 1
    stack = lambda nm: jnp.stack([
        import_linear(sd[b + f"experts.{j}.{nm}.weight"], dtype)
        for j in range(n_experts)
    ])
    return {
        "router": import_linear(sd[b + "gate.weight"], jnp.float32),
        "w_gate": stack("gate_proj"),
        "w_up": stack("up_proj"),
        "w_down": stack("down_proj"),
    }


def _moe_from(sd, p, dtype):
    """Mixtral ``block_sparse_moe`` → the framework's MoE dict: router
    (D, E) + stacked expert weights (E, K, N) for ragged_dot dispatch."""
    b = p + "block_sparse_moe."
    n_experts = 0
    while b + f"experts.{n_experts}.w1.weight" in sd:
        n_experts += 1
    stack = lambda nm: jnp.stack([
        import_linear(sd[b + f"experts.{j}.{nm}.weight"], dtype)
        for j in range(n_experts)
    ])
    return {
        "router": import_linear(sd[b + "gate.weight"], jnp.float32),
        "w_gate": stack("w1"),   # Mixtral w1 = gate (silu)
        "w_up": stack("w3"),     # w3 = up
        "w_down": stack("w2"),   # w2 = down
    }


def import_hf_llama(
    state_dict: Mapping[str, Any],
    n_layers: int,
    dtype=jnp.bfloat16,
    prefix: str = "model.",
    n_heads: int = None,
    n_kv_heads: int = None,
) -> Dict[str, Any]:
    """HF LlamaForCausalLM state_dict → ao_tpu.models.llama params pytree.

    Weights transpose to the (K, N) convention; norms and embeddings copy
    through. Missing lm_head (tied models) is omitted — set
    ``tie_embeddings=True`` in the LlamaConfig.

    Phi-3-style fused projections (``self_attn.qkv_proj`` rows ordered
    [q | k | v], ``mlp.gate_up_proj`` rows [gate | up]) split onto the same
    layout; the fused-qkv split needs ``n_heads``/``n_kv_heads``.
    """
    sd = {k: v for k, v in state_dict.items()}

    def get(name):
        return sd[prefix + name] if prefix + name in sd else sd[name]

    def has(name):
        return prefix + name in sd or name in sd

    layers = []
    for i in range(n_layers):
        p = f"layers.{i}."
        if has(p + "self_attn.qkv_proj.weight"):
            if n_heads is None or n_kv_heads is None:
                raise ValueError("fused qkv_proj needs n_heads/n_kv_heads "
                                 "(pass them or use auto.import_from_hf)")
            w = _to_np(get(p + "self_attn.qkv_proj.weight"))
            hd = w.shape[0] // (n_heads + 2 * n_kv_heads)
            qh, kh = n_heads * hd, n_kv_heads * hd
            attn = {
                "wq": import_linear(w[:qh], dtype),
                "wk": import_linear(w[qh:qh + kh], dtype),
                "wv": import_linear(w[qh + kh:qh + 2 * kh], dtype),
                "wo": import_linear(get(p + "self_attn.o_proj.weight"),
                                    dtype),
            }
        else:
            attn = {
                "wq": import_linear(get(p + "self_attn.q_proj.weight"), dtype),
                "wk": import_linear(get(p + "self_attn.k_proj.weight"), dtype),
                "wv": import_linear(get(p + "self_attn.v_proj.weight"), dtype),
                "wo": import_linear(get(p + "self_attn.o_proj.weight"), dtype),
            }
        # Qwen2-style q/k/v biases (set qkv_bias=True in LlamaConfig)
        for nm, t in (("bq", "q_proj"), ("bk", "k_proj"), ("bv", "v_proj")):
            if has(p + f"self_attn.{t}.bias"):
                attn[nm] = jnp.asarray(
                    _to_np(get(p + f"self_attn.{t}.bias"))).astype(dtype)
        # Qwen3-style per-head q/k RMSNorm (set qk_norm=True)
        for nm, t in (("q_norm", "q_norm"), ("k_norm", "k_norm")):
            if has(p + f"self_attn.{t}.weight"):
                attn[nm] = jnp.asarray(
                    _to_np(get(p + f"self_attn.{t}.weight"))).astype(dtype)
        layers.append({
            "attn": attn,
            "mlp": _moe_from(sd, prefix + p, dtype)
            if has(p + "block_sparse_moe.gate.weight")
            else _qwen_moe_from(sd, prefix + p, dtype)
            if has(p + "mlp.experts.0.gate_proj.weight")
            else _gate_up_split(get(p + "mlp.gate_up_proj.weight"),
                                get(p + "mlp.down_proj.weight"), dtype)
            if has(p + "mlp.gate_up_proj.weight")
            else {
                "w1": import_linear(get(p + "mlp.gate_proj.weight"), dtype),
                "w3": import_linear(get(p + "mlp.up_proj.weight"), dtype),
                "w2": import_linear(get(p + "mlp.down_proj.weight"), dtype),
            },
            "ln1": jnp.asarray(_to_np(get(p + "input_layernorm.weight"))
                               ).astype(dtype),
            "ln2": jnp.asarray(
                _to_np(get(p + "post_attention_layernorm.weight"))
            ).astype(dtype),
        })
    params: Dict[str, Any] = {
        "embed": jnp.asarray(_to_np(get("embed_tokens.weight"))).astype(dtype),
        "layers": layers,
        "norm": jnp.asarray(_to_np(get("norm.weight"))).astype(dtype),
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = import_linear(sd["lm_head.weight"], dtype)
    return params


def _conv(v, dtype):
    """torch Conv2d weight (out, in, kh, kw) → HWIO."""
    return jnp.asarray(_to_np(v).transpose(2, 3, 1, 0)).astype(dtype)


def _convT(v, dtype):
    """torch ConvTranspose2d weight (in, out, kh, kw) → the framework's
    conv_transpose2d HWIO kernel (kh, kw, in, out). torch's transposed conv
    equals a fractionally-strided conv with the SPATIALLY FLIPPED kernel
    (verified exactly in tests/test_torch_import.py)."""
    w = _to_np(v).transpose(2, 3, 0, 1)[::-1, ::-1]
    return jnp.asarray(np.ascontiguousarray(w)).astype(dtype)


def _vec(v, dtype):
    return jnp.asarray(_to_np(v)).astype(dtype)


def _ln(sd, name, dtype):
    return {"scale": _vec(sd[name + ".weight"], dtype),
            "bias": _vec(sd[name + ".bias"], dtype)}


def _attn_from(sd, base, dtype, qkv_fused):
    """Attention params from either a fused `qkv` (ViT-det encoder) or
    separate `{q,k,v,out}_proj` (two-way decoder) torch layout."""
    if qkv_fused:
        w = _to_np(sd[base + ".qkv.weight"])  # (3d, d)
        b = _to_np(sd[base + ".qkv.bias"])
        d = w.shape[1]
        out = {}
        for i, nm in enumerate(("q", "k", "v")):
            out["w" + nm] = jnp.asarray(w[i * d:(i + 1) * d].T).astype(dtype)
            out["b" + nm] = jnp.asarray(b[i * d:(i + 1) * d]).astype(dtype)
        out["wo"] = import_linear(sd[base + ".proj.weight"], dtype)
        out["bo"] = _vec(sd[base + ".proj.bias"], dtype)
        return out
    out = {}
    for nm, t in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                  ("o", "out_proj")):
        out["w" + nm] = import_linear(sd[f"{base}.{t}.weight"], dtype)
        out["b" + nm] = _vec(sd[f"{base}.{t}.bias"], dtype)
    return out


def _mlp_from(sd, base, dtype, names=("lin1", "lin2")):
    return {"w1": import_linear(sd[f"{base}.{names[0]}.weight"], dtype),
            "b1": _vec(sd[f"{base}.{names[0]}.bias"], dtype),
            "w2": import_linear(sd[f"{base}.{names[1]}.weight"], dtype),
            "b2": _vec(sd[f"{base}.{names[1]}.bias"], dtype)}


def _mlp3_from(sd, base, dtype):
    out = {}
    for i in range(3):
        out[f"w{i+1}"] = import_linear(sd[f"{base}.layers.{i}.weight"], dtype)
        out[f"b{i+1}"] = _vec(sd[f"{base}.layers.{i}.bias"], dtype)
    return out


_SAM_HF_RENAMES = (
    # HF transformers SamModel names → original segment-anything names
    (r"^vision_encoder\.", "image_encoder."),
    (r"^(image_encoder)\.layers\.(\d+)\.", r"\1.blocks.\2."),
    (r"\.patch_embed\.projection\.", ".patch_embed.proj."),
    (r"\.layer_norm_final_attn\.", ".norm_final_attn."),
    (r"\.layer_norm(\d)\.", r".norm\1."),
    (r"\.neck\.conv1\.", ".neck.0."),
    (r"\.neck\.norm1\.", ".neck.1."),
    (r"\.neck\.conv2\.", ".neck.2."),
    (r"\.neck\.norm2\.", ".neck.3."),
    (r"\.shared_embedding\.positional_embedding$",
     ".pe_layer.positional_encoding_gaussian_matrix"),
    (r"\.point_embed\.(\d+)\.", r".point_embeddings.\1."),
    (r"\.upscale_conv1\.", ".output_upscaling.0."),
    (r"\.upscale_layer_norm\.", ".output_upscaling.1."),
    (r"\.upscale_conv2\.", ".output_upscaling.3."),
    # SamFeedForward (depth 3): proj_in / layers.0 / proj_out → layers.0..2
    # (the inner-hidden rename must run BEFORE proj_in claims "layers.0")
    (r"(output_hypernetworks_mlps\.\d+|iou_prediction_head)\.layers\.0\.",
     r"\1.layers.1."),
    (r"(output_hypernetworks_mlps\.\d+|iou_prediction_head)\.proj_in\.",
     r"\1.layers.0."),
    (r"(output_hypernetworks_mlps\.\d+|iou_prediction_head)\.proj_out\.",
     r"\1.layers.2."),
)


def _normalize_sam_keys(sd: Dict[str, Any]) -> Dict[str, Any]:
    import re

    out = {}
    for k, v in sd.items():
        nk = k
        for pat, rep in _SAM_HF_RENAMES:
            nk = re.sub(pat, rep, nk)
        out[nk] = v
    return out


def import_hf_sam(
    state_dict: Mapping[str, Any],
    cfg,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Segment-anything state_dict (original facebook sam_vit_* naming OR
    HF ``transformers.SamModel`` naming) → ao_tpu.models.sam params pytree.

    Covers the image encoder (fused-qkv ViT-det blocks, rel-pos tables,
    conv neck), the point-prompt encoder (5-type embeddings, gaussian PE
    matrix), and the two-way mask decoder (token-to-image / image-to-token
    attention, upscaler, hypernetwork + IoU heads). The mask-prompt
    downscaling convs are not imported (point/box prompts only).
    Numerics validated against transformers.SamModel in
    tests/test_torch_import.py.

    ``cfg`` is the matching ``SAMConfig`` (e.g. ``sam.SAM_B``).
    """
    sd = dict(state_dict)
    if any(k.startswith("vision_encoder.") for k in sd):
        sd = _normalize_sam_keys(sd)
    import numpy as _np

    layers = []
    for i in range(cfg.n_layers):
        b = f"image_encoder.blocks.{i}"
        lp = {
            "ln1": _ln(sd, b + ".norm1", dtype),
            "attn": _attn_from(sd, b + ".attn", dtype, qkv_fused=True),
            "ln2": _ln(sd, b + ".norm2", dtype),
            "mlp": _mlp_from(sd, b + ".mlp", dtype),
        }
        if cfg.use_rel_pos and b + ".attn.rel_pos_h" in sd:
            lp["attn"]["rel_pos_h"] = _vec(sd[b + ".attn.rel_pos_h"], dtype)
            lp["attn"]["rel_pos_w"] = _vec(sd[b + ".attn.rel_pos_w"], dtype)
        layers.append(lp)

    dec_layers = []
    for i in range(cfg.decoder_layers):
        b = f"mask_decoder.transformer.layers.{i}"
        dec_layers.append({
            "self_attn": _attn_from(sd, b + ".self_attn", dtype, False),
            "ln1": _ln(sd, b + ".norm1", dtype),
            "cross_t2i": _attn_from(
                sd, b + ".cross_attn_token_to_image", dtype, False),
            "ln2": _ln(sd, b + ".norm2", dtype),
            "mlp": _mlp_from(sd, b + ".mlp", dtype),
            "ln3": _ln(sd, b + ".norm3", dtype),
            "cross_i2t": _attn_from(
                sd, b + ".cross_attn_image_to_token", dtype, False),
            "ln4": _ln(sd, b + ".norm4", dtype),
        })

    point_rows = _np.concatenate(
        [_to_np(sd["prompt_encoder.not_a_point_embed.weight"])]
        + [_to_np(sd[f"prompt_encoder.point_embeddings.{i}.weight"])
           for i in range(4)],
        axis=0,
    )
    tokens = _np.concatenate(
        [_to_np(sd["mask_decoder.iou_token.weight"]),
         _to_np(sd["mask_decoder.mask_tokens.weight"])], axis=0)

    return {
        "patch_embed": {
            "kernel": _conv(sd["image_encoder.patch_embed.proj.weight"], dtype),
            "bias": _vec(sd["image_encoder.patch_embed.proj.bias"], dtype),
        },
        "pos_embed": _vec(sd["image_encoder.pos_embed"], dtype),
        "layers": layers,
        "neck": {
            "conv1": {"kernel": _conv(sd["image_encoder.neck.0.weight"], dtype)},
            "ln1": _ln(sd, "image_encoder.neck.1", dtype),
            "conv2": {"kernel": _conv(sd["image_encoder.neck.2.weight"], dtype)},
            "ln2": _ln(sd, "image_encoder.neck.3", dtype),
        },
        "prompt": {
            "point_embed": jnp.asarray(point_rows).astype(dtype),
            "pe_gaussian": jnp.asarray(_to_np(
                sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
            )).astype(jnp.float32),
            "no_mask_embed": _vec(sd["prompt_encoder.no_mask_embed.weight"],
                                  dtype),
        },
        "decoder": {
            "tokens": jnp.asarray(tokens).astype(dtype),
            "layers": dec_layers,
            "final_t2i": _attn_from(
                sd, "mask_decoder.transformer.final_attn_token_to_image",
                dtype, False),
            "ln_final": _ln(sd, "mask_decoder.transformer.norm_final_attn",
                            dtype),
            "up1": {"kernel": _convT(sd["mask_decoder.output_upscaling.0.weight"],
                                     dtype),
                    "bias": _vec(sd["mask_decoder.output_upscaling.0.bias"],
                                 dtype)},
            "up_ln": _ln(sd, "mask_decoder.output_upscaling.1", dtype),
            "up2": {"kernel": _convT(sd["mask_decoder.output_upscaling.3.weight"],
                                     dtype),
                    "bias": _vec(sd["mask_decoder.output_upscaling.3.bias"],
                                 dtype)},
            "hyper_mlps": [
                _mlp3_from(sd, f"mask_decoder.output_hypernetworks_mlps.{i}",
                           dtype)
                for i in range(cfg.n_mask_tokens)
            ],
            "iou_head": _mlp3_from(sd, "mask_decoder.iou_prediction_head",
                                   dtype),
        },
    }


def import_hf_vit(
    state_dict: Mapping[str, Any],
    cfg,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """HF ``transformers.ViTForImageClassification`` (or ViTModel, prefixed
    ``vit.``) state_dict → ao_tpu.models.vit params pytree. Numerics
    validated against transformers in tests/test_torch_import.py.

    ``cfg`` is the matching ``ViTConfig`` (e.g. ``vit.VIT_B16``).
    """
    sd = dict(state_dict)
    if not any(k.startswith("vit.") for k in sd):
        sd = {"vit." + k if not k.startswith("classifier") else k: v
              for k, v in sd.items()}

    def ln(name):
        return {"scale": _vec(sd[name + ".weight"], dtype),
                "bias": _vec(sd[name + ".bias"], dtype)}

    layers = []
    for i in range(cfg.n_layers):
        b = f"vit.encoder.layer.{i}"
        att = f"{b}.attention.attention"
        attn = {}
        for nm, t in (("q", "query"), ("k", "key"), ("v", "value")):
            attn["w" + nm] = import_linear(sd[f"{att}.{t}.weight"], dtype)
            attn["b" + nm] = _vec(sd[f"{att}.{t}.bias"], dtype)
        attn["wo"] = import_linear(sd[f"{b}.attention.output.dense.weight"],
                                   dtype)
        attn["bo"] = _vec(sd[f"{b}.attention.output.dense.bias"], dtype)
        layers.append({
            "ln1": ln(b + ".layernorm_before"),
            "attn": attn,
            "ln2": ln(b + ".layernorm_after"),
            "mlp": {
                "w1": import_linear(sd[f"{b}.intermediate.dense.weight"], dtype),
                "b1": _vec(sd[f"{b}.intermediate.dense.bias"], dtype),
                "w2": import_linear(sd[f"{b}.output.dense.weight"], dtype),
                "b2": _vec(sd[f"{b}.output.dense.bias"], dtype),
            },
        })

    params = {
        "patch_embed": {
            "kernel": _conv(
                sd["vit.embeddings.patch_embeddings.projection.weight"], dtype),
            "bias": _vec(
                sd["vit.embeddings.patch_embeddings.projection.bias"], dtype),
        },
        "cls_token": _vec(sd["vit.embeddings.cls_token"], dtype),
        "pos_embed": _vec(sd["vit.embeddings.position_embeddings"], dtype),
        "layers": layers,
        "ln_f": ln("vit.layernorm"),
    }
    if "classifier.weight" in sd:
        params["head"] = {"proj": import_linear(sd["classifier.weight"], dtype),
                          "bias": _vec(sd["classifier.bias"], dtype)}
    else:  # bare ViTModel: identity head placeholder
        import numpy as _np

        params["head"] = {"proj": jnp.eye(cfg.dim, cfg.n_classes, dtype=dtype)}
    return params


def import_hf_gemma(
    state_dict: Mapping[str, Any],
    n_layers: int,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """HF Gemma/Gemma2/Gemma3 state_dict → ao_tpu.models.gemma params.

    Gemma-1 shares the Llama key layout exactly. Gemma-2/3 add sandwich
    norms (post_attention/pre_feedforward/post_feedforward layernorms —
    note HF's "post_attention_layernorm" is the POST-attention sandwich
    norm there, not Llama's pre-MLP norm) and Gemma-3 per-head q/k norms
    (stored here pre-offset as 1 + w so the shared per-head RMSNorm
    reproduces Gemma's (1+w) semantics). Logits parity vs transformers is
    tested in tests/test_torch_import.py.
    """
    sd = dict(state_dict)
    prefix = "model." if any(k.startswith("model.") for k in sd) else ""
    sandwich = any("pre_feedforward_layernorm" in k for k in sd)
    params = import_hf_llama(state_dict, n_layers, dtype)
    if not sandwich:
        return params

    def vec(name):
        return jnp.asarray(_to_np(sd[prefix + name])).astype(dtype)

    for i, lp in enumerate(params["layers"]):
        p = f"layers.{i}."
        # llama mapping put HF post_attention_layernorm into ln2; in the
        # sandwich layout that weight is the POST-attention norm
        lp["post_ln1"] = lp.pop("ln2")
        lp["ln2"] = vec(p + "pre_feedforward_layernorm.weight")
        lp["post_ln2"] = vec(p + "post_feedforward_layernorm.weight")
        for nm in ("q_norm", "k_norm"):
            key = p + f"self_attn.{nm}.weight"
            if prefix + key in sd:
                lp["attn"][nm] = 1.0 + vec(key).astype(jnp.float32)
    return params
