"""Serve one quantized base model with per-request LoRA adapters.

Run: python examples/multilora_serving.py
Demonstrates: NF4 base + QLoRA fine-tunes → multi-adapter continuous
batching where every request picks its adapter and all decode in one
device program.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.serving.engine import Engine, ServeConfig
from ao_tpu.training.qlora import apply_lora, init_lora

cfg = llama.LlamaConfig(vocab_size=512, dim=256, n_layers=2, n_heads=4,
                        n_kv_heads=2, ffn_dim=512, tie_embeddings=True,
                        dtype=jnp.float32)
params = llama.init_params(jax.random.PRNGKey(0), cfg)
qbase = ao_tpu.quantize_(params, ao_tpu.NF4WeightOnlyConfig(block_size=64))


def finetune(seed, target):
    """A tiny QLoRA fine-tune teaching the adapter to emit ``target``."""
    lora = init_lora(jax.random.PRNGKey(seed), qbase, rank=8)
    # random contexts, constant label: the adapter must emit ``target``
    # regardless of what it is prompted with
    toks = jax.random.randint(jax.random.PRNGKey(seed + 50), (4, 8), 0,
                              cfg.vocab_size)

    def loss(ad):
        logits, _ = llama.forward(apply_lora(qbase, ad), toks, cfg)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -lp[..., target].mean()

    opt = optax.adam(5e-2)
    st = opt.init(lora)
    step = jax.jit(lambda ad, st: _step(loss, opt, ad, st))
    for _ in range(80):
        lora, st, _ = step(lora, st)
    return lora


def _step(loss, opt, ad, st):
    l, g = jax.value_and_grad(loss)(ad)
    up, st = opt.update(g, st, ad)
    return optax.apply_updates(ad, up), st, l


print("fine-tuning two adapters...")
adapters = {"sevens": finetune(1, 7), "nines": finetune(2, 9)}

eng = Engine(qbase, cfg, ServeConfig(max_batch=3, max_seq=64,
                                     prefill_buckets=(8,)),
             lora_adapters=adapters)
prompt = [3, 17, 42]
eng.submit(prompt, 8)                      # base model
eng.submit(prompt, 8, lora="sevens")       # adapter 1
eng.submit(prompt, 8, lora="nines")        # adapter 2 — same batch
for req in eng.run():
    name = ([None] + eng._lora_names)[req.lora_idx]
    print(f"adapter={name!s:8s} tokens={req.generated}")
