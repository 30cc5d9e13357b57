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


def import_hf_llama(
    state_dict: Mapping[str, Any],
    n_layers: int,
    dtype=jnp.bfloat16,
    prefix: str = "model.",
) -> Dict[str, Any]:
    """HF LlamaForCausalLM state_dict → ao_tpu.models.llama params pytree.

    Weights transpose to the (K, N) convention; norms and embeddings copy
    through. Missing lm_head (tied models) is omitted — set
    ``tie_embeddings=True`` in the LlamaConfig.
    """
    sd = {k: v for k, v in state_dict.items()}

    def get(name):
        return sd[prefix + name] if prefix + name in sd else sd[name]

    layers = []
    for i in range(n_layers):
        p = f"layers.{i}."
        layers.append({
            "attn": {
                "wq": import_linear(get(p + "self_attn.q_proj.weight"), dtype),
                "wk": import_linear(get(p + "self_attn.k_proj.weight"), dtype),
                "wv": import_linear(get(p + "self_attn.v_proj.weight"), dtype),
                "wo": import_linear(get(p + "self_attn.o_proj.weight"), dtype),
            },
            "mlp": {
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
