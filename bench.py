"""Headline benchmark: int4-WO vs bf16 decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline to beat (BASELINE.md): torchao int4-WO Llama-3-8B 1.89x tokens/s
vs bf16 (A100/H100-class, gpt-fast). Here: Llama-3-8B layer dimensions with
the layer count trimmed so the bf16 model fits one v5e's 16 GB HBM; batch 8
decode via the scan-based generate loop. vs_baseline = speedup / 1.89.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import ao_tpu
    from ao_tpu.models import llama
    from ao_tpu.serving.decode import generate

    # Llama-3-8B dims, 12/32 layers (bf16 must fit 16GB HBM next to int4)
    cfg = llama.LlamaConfig(
        vocab_size=128256, dim=4096, n_layers=12, n_heads=32, n_kv_heads=8,
        ffn_dim=14336, tie_embeddings=False,
    )
    batch, prompt_len, steps, max_seq = 8, 128, 64, 256

    key = jax.random.PRNGKey(0)
    params = llama.init_params(key, cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    prompt = jax.random.randint(key, (batch, prompt_len), 0, cfg.vocab_size)

    from ao_tpu.utils.timing import device_time_us

    def bench(p, tag):
        # perturb the prompt each iter to defeat remote-result memoization
        def mutate(args, i):
            pr = (args[1] + i + 1) % cfg.vocab_size
            return (args[0], pr) + args[2:]

        us = device_time_us(
            lambda p_, pr: generate(p_, pr, cfg, steps, max_seq),
            p, prompt, iters=3, mutate=mutate,
        )
        dt = us / 1e6
        tok_s = batch * steps / dt
        print(f"# {tag}: {dt*1e3:.1f} ms device time for {steps} steps x "
              f"{batch} batch = {tok_s:.1f} tok/s", file=sys.stderr)
        return tok_s

    tok_bf16 = bench(params, "bf16")
    qparams = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(group_size=128))
    del params
    tok_int4 = bench(qparams, "int4-wo")

    speedup = tok_int4 / tok_bf16
    print(json.dumps({
        "metric": "int4-WO vs bf16 decode speedup (Llama-3-8B dims, 12L, bs8, 1 chip)",
        "value": round(speedup, 4),
        "unit": "x (int4 tok/s / bf16 tok/s)",
        "vs_baseline": round(speedup / 1.89, 4),
        "detail": {
            "bf16_tok_s": round(tok_bf16, 1),
            "int4_tok_s": round(tok_int4, 1),
            "reference_speedup": 1.89,
        },
    }))


if __name__ == "__main__":
    main()
