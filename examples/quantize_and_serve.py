"""End-to-end: build a Llama, quantize int4, serve with continuous batching.

python examples/quantize_and_serve.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.serving.engine import Engine, ServeConfig


def main():
    cfg = llama.LlamaConfig(
        vocab_size=32000, dim=1024, n_layers=4, n_heads=8, n_kv_heads=2,
        ffn_dim=2816, tie_embeddings=True,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)

    # one call: every linear (and expert stack / lm_head) becomes int4
    qparams = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(group_size=128))

    # checkpoint roundtrip with the recipe embedded
    ao_tpu.save_quantized("/tmp/llama_int4.safetensors", qparams,
                          config=ao_tpu.Int4WeightOnlyConfig(group_size=128))
    qparams, recipe = ao_tpu.load_quantized("/tmp/llama_int4.safetensors")
    print("loaded checkpoint quantized with:", type(recipe).__name__)

    eng = Engine(qparams, cfg, ServeConfig(
        max_batch=4, max_seq=512, kv_layout="paged", page_size=128,
        kv_quant="int8", prefill_buckets=(128,), temperature=0.8, top_k=40,
    ))
    for i in range(6):
        eng.submit([1 + i, 2, 3], max_new_tokens=16)
    for req in eng.run():
        print(f"request {req.uid}: {req.generated}")


if __name__ == "__main__":
    main()
