"""GPTQ observe → calibrate → convert, with quality deltas vs plain RTN.

python examples/gptq_calibration.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import ao_tpu
from ao_tpu.eval import ppl_delta_report, synthetic_tokens
from ao_tpu.models import llama


def main():
    cfg = llama.LlamaConfig(
        vocab_size=1024, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=512, tie_embeddings=True, dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    base = ao_tpu.Int4WeightOnlyConfig(group_size=64)
    gptq = ao_tpu.GPTQConfig(base_config=base, step="observe")

    def quantize_gptq(p):
        obs = ao_tpu.quantize_(p, gptq)
        for i in range(4):  # calibration forwards run EAGERLY
            batch = jax.random.randint(jax.random.PRNGKey(i), (2, 64), 0, 1024)
            llama.forward(obs, batch, cfg)
        return ao_tpu.quantize_(obs, dataclasses.replace(gptq, step="convert"))

    tokens = synthetic_tokens(jax.random.PRNGKey(9), 8192, cfg.vocab_size)
    report = ppl_delta_report(
        params,
        lambda p: (lambda b: llama.forward(p, b, cfg)[0]),
        {"int4_rtn": lambda p: ao_tpu.quantize_(p, base),
         "int4_gptq": quantize_gptq},
        tokens, seq_len=128, batch_size=2,
    )
    for name, row in report.items():
        print(f"{name:10s} ppl={row['ppl']:.3f} delta={row['delta']:+.3f}")


if __name__ == "__main__":
    main()
