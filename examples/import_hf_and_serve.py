"""Migrate an HF checkpoint end-to-end: save_pretrained dir → auto-import →
host-side int4 quantize (fused magic layout) → continuous-batching engine.

python examples/import_hf_and_serve.py

This is the torchao-user migration path: the same files transformers
writes (`config.json` + safetensors) load without torch, quantize on the
host during load, and serve. Here a tiny random HF Llama stands in for a
real checkpoint directory.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # tiny demo; avoid tunnel roundtrips

import jax.numpy as jnp

import ao_tpu
from ao_tpu.integrations.auto import load_hf_checkpoint
from ao_tpu.integrations.loader import quantize_on_load
from ao_tpu.models import llama
from ao_tpu.serving.engine import Engine, ServeConfig


def make_checkpoint_dir(path: str) -> None:
    """Stand-in for a downloaded HF repo (needs torch+transformers once)."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf = HFLlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    LlamaForCausalLM(hf).save_pretrained(path, safe_serialization=True)


def main():
    ckpt = os.path.join(tempfile.gettempdir(), "hf_llama_demo")
    if not os.path.exists(os.path.join(ckpt, "config.json")):
        make_checkpoint_dir(ckpt)

    # 1. config.json picks the family; safetensors load without torch
    params, cfg = load_hf_checkpoint(ckpt, dtype=jnp.bfloat16)
    print(f"imported {type(cfg).__name__}: dim={cfg.dim}, "
          f"layers={cfg.n_layers}, kv_heads={cfg.n_kv_heads}")

    # 2. quantize on the host during load — int4 qdata arrives on device
    #    already in the fused kernels' magic layout
    qparams = quantize_on_load(
        params, ao_tpu.Int4WeightOnlyConfig(group_size=32))
    print("wq layout:", qparams["layers"][0]["attn"]["wq"].layout)

    # 3. serve
    eng = Engine(qparams, cfg, ServeConfig(
        max_batch=4, max_seq=256, kv_quant="int8",
        prefill_buckets=(32,), temperature=0.8, top_k=40,
    ))
    for i in range(4):
        eng.submit([1 + i, 7, 42], max_new_tokens=12)
    for req in eng.run():
        print(f"request {req.uid}: {req.generated}")


if __name__ == "__main__":
    main()
