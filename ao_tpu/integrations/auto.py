"""Auto-import: HF ``config.json`` dict + state_dict → (params, config).

The one-liner migration path for reference (pytorch/ao) users: where
torchao quantizes an already-constructed HF module, here the HF config
dict (``AutoConfig...to_dict()`` or a parsed ``config.json``) selects the
model family, builds the matching ao_tpu config, and dispatches to the
ground-truth-validated importer in :mod:`ao_tpu.integrations.torch_import`.

    hf_cfg = json.load(open("config.json"))          # or AutoConfig dict
    params, cfg = auto.import_from_hf(state_dict, hf_cfg)
    qparams = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig())
    logits, _ = resolve_model(cfg).forward(qparams, tokens, cfg)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp


def config_from_hf(hf_cfg: Mapping[str, Any], dtype: Any = jnp.bfloat16):
    """HF config dict → the matching ao_tpu model config.

    Supported ``model_type``: llama, qwen2, qwen3 (QK-norm), qwen3_moe
    (QK-norm + routed experts), mistral (Llama layout),
    mixtral (MoE), phi3 (fused qkv/gate_up), gemma, gemma2, gemma3_text,
    vit, sam.
    """
    mt = hf_cfg.get("model_type", "")
    if mt in ("llama", "qwen2", "qwen3", "qwen3_moe", "mistral", "mixtral", "phi3"):
        from ao_tpu.models.llama import LlamaConfig

        if hf_cfg.get("sliding_window"):
            import warnings

            warnings.warn(
                f"{mt}: sliding_window={hf_cfg['sliding_window']} is not "
                "modeled (full causal attention); outputs diverge from "
                "transformers beyond that context length")
        rs = hf_cfg.get("rope_scaling") or {}
        rs_type = rs.get("rope_type", rs.get("type"))
        if rs_type not in (None, "default", "llama3"):
            import warnings

            warnings.warn(
                f"{mt}: rope_scaling type {rs_type!r} is not modeled "
                "(plain RoPE used); long-context outputs diverge from "
                "transformers")
        return LlamaConfig(
            vocab_size=hf_cfg["vocab_size"],
            dim=hf_cfg["hidden_size"],
            n_layers=hf_cfg["num_hidden_layers"],
            n_heads=hf_cfg["num_attention_heads"],
            n_kv_heads=hf_cfg.get("num_key_value_heads",
                                  hf_cfg["num_attention_heads"]),
            ffn_dim=hf_cfg["intermediate_size"],
            norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
            rope_theta=hf_cfg.get("rope_theta", 10000.0),
            tie_embeddings=bool(hf_cfg.get("tie_word_embeddings", False)),
            rope_scaling=tuple(sorted(
                (str(k), v) for k, v in hf_cfg["rope_scaling"].items()
                if not isinstance(v, (dict, list))
            )) if hf_cfg.get("rope_scaling") else None,
            qkv_bias=bool(hf_cfg.get("attention_bias", False)
                          or mt == "qwen2"),
            qk_norm=(mt in ("qwen3", "qwen3_moe")),
            qk_head_dim=hf_cfg.get("head_dim"),
            n_experts=hf_cfg.get("num_local_experts",
                                 hf_cfg.get("num_experts", 0)
                                 if mt == "qwen3_moe" else 0),
            top_k_experts=hf_cfg.get("num_experts_per_tok", 2),
            norm_topk_experts=bool(hf_cfg.get("norm_topk_prob", True))
            if mt == "qwen3_moe" else True,
            dtype=dtype,
        )
    if mt in ("gemma", "gemma2", "gemma3_text"):
        from ao_tpu.models.gemma import GemmaConfig

        sandwich = mt in ("gemma2", "gemma3_text")
        return GemmaConfig(
            vocab_size=hf_cfg["vocab_size"],
            dim=hf_cfg["hidden_size"],
            n_layers=hf_cfg["num_hidden_layers"],
            n_heads=hf_cfg["num_attention_heads"],
            n_kv_heads=hf_cfg.get("num_key_value_heads", 1),
            head_dim=hf_cfg.get(
                "head_dim",
                hf_cfg["hidden_size"] // hf_cfg["num_attention_heads"]),
            ffn_dim=hf_cfg["intermediate_size"],
            norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
            rope_theta=hf_cfg.get("rope_theta", 10000.0),
            final_logit_softcap=hf_cfg.get("final_logit_softcapping"),
            attn_logit_softcap=hf_cfg.get("attn_logit_softcapping"),
            query_pre_attn_scalar=hf_cfg.get("query_pre_attn_scalar"),
            post_norms=sandwich,
            qk_norm=(mt == "gemma3_text"),
            sliding_window=hf_cfg.get("sliding_window")
            if sandwich else None,
            layer_types=tuple(hf_cfg["layer_types"])
            if hf_cfg.get("layer_types") else None,
            rope_local_theta=hf_cfg.get("rope_local_base_freq"),
            dtype=dtype,
        )
    if mt == "vit":
        from ao_tpu.models.vit import ViTConfig

        return ViTConfig(
            image_size=hf_cfg["image_size"],
            patch_size=hf_cfg["patch_size"],
            in_channels=hf_cfg.get("num_channels", 3),
            dim=hf_cfg["hidden_size"],
            n_layers=hf_cfg["num_hidden_layers"],
            n_heads=hf_cfg["num_attention_heads"],
            mlp_dim=hf_cfg["intermediate_size"],
            n_classes=len(hf_cfg.get("id2label") or {}) or 1000,
            norm_eps=hf_cfg.get("layer_norm_eps", 1e-6),
            dtype=dtype,
        )
    if mt == "sam":
        from ao_tpu.models.sam import SAMConfig

        v = hf_cfg["vision_config"]
        m = hf_cfg["mask_decoder_config"]
        return SAMConfig(
            image_size=v["image_size"],
            patch_size=v["patch_size"],
            in_channels=v.get("num_channels", 3),
            dim=v["hidden_size"],
            n_layers=v["num_hidden_layers"],
            n_heads=v["num_attention_heads"],
            mlp_ratio=v["mlp_dim"] // v["hidden_size"],
            window_size=v.get("window_size", 14),
            global_attn_layers=tuple(v.get("global_attn_indexes", ())),
            use_rel_pos=bool(v.get("use_rel_pos", True)),
            neck_dim=v["output_channels"],
            decoder_layers=m["num_hidden_layers"],
            decoder_heads=m["num_attention_heads"],
            decoder_mlp_mult=m["mlp_dim"] // m["hidden_size"],
            n_mask_tokens=m.get("num_multimask_outputs", 3) + 1,
            dtype=dtype,
        )
    raise ValueError(
        f"unsupported HF model_type {mt!r}; import manually via "
        "ao_tpu.integrations.torch_import"
    )


def import_from_hf(
    state_dict: Mapping[str, Any],
    hf_cfg: Mapping[str, Any],
    dtype: Any = jnp.bfloat16,
) -> Tuple[Dict[str, Any], Any]:
    """(state_dict, HF config dict) → (ao_tpu params pytree, model config)."""
    from ao_tpu.integrations import torch_import as ti

    cfg = config_from_hf(hf_cfg, dtype)
    mt = hf_cfg.get("model_type", "")
    if mt in ("llama", "qwen2", "qwen3", "qwen3_moe", "mistral", "mixtral", "phi3"):
        params = ti.import_hf_llama(state_dict, cfg.n_layers, dtype,
                                    n_heads=cfg.n_heads,
                                    n_kv_heads=cfg.n_kv_heads)
    elif mt in ("gemma", "gemma2", "gemma3_text"):
        params = ti.import_hf_gemma(state_dict, cfg.n_layers, dtype)
    elif mt == "vit":
        params = ti.import_hf_vit(state_dict, cfg, dtype)
    elif mt == "sam":
        params = ti.import_hf_sam(state_dict, cfg, dtype)
    else:  # unreachable: config_from_hf already raised
        raise ValueError(mt)
    return params, cfg


def load_hf_checkpoint(
    path: str,
    dtype: Any = jnp.bfloat16,
) -> Tuple[Dict[str, Any], Any]:
    """Load an HF checkpoint directory (``config.json`` + ``*.safetensors``,
    single file or sharded) into (params, config) — no torch needed.

    (ref analog: the reference's safetensors serialization support,
    torchao/prototype/safetensors — here it is the INPUT side of the
    migration: the same files transformers' ``save_pretrained`` writes.)
    """
    import json
    import os

    from safetensors import numpy as st_numpy

    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)

    index = os.path.join(path, "model.safetensors.index.json")
    state: Dict[str, Any] = {}
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            state.update(st_numpy.load_file(os.path.join(path, shard)))
    else:
        single = os.path.join(path, "model.safetensors")
        state = st_numpy.load_file(single)
    return import_from_hf(state, hf_cfg, dtype)
