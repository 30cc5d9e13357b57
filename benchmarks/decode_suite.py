"""End-to-end decode throughput across quantization configs.

``python benchmarks/decode_suite.py`` on a real TPU. Prints one JSON line
per config: tokens/s and speedup over bf16 — the multi-config version of
the headline ``bench.py`` (which stays int4-WO only for the driver).

(ref analog: the README/gpt-fast benchmark table — int4 1.89x, fp8 1.5x…)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
# explicitly so `JAX_PLATFORMS=cpu` smokes work
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.serving.decode import generate
from ao_tpu.utils.timing import device_time_us


def main():
    cfg = llama.LlamaConfig(
        vocab_size=128256, dim=4096, n_layers=8, n_heads=32, n_kv_heads=8,
        ffn_dim=14336, tie_embeddings=False,
    )
    batch, prompt_len, steps, max_seq = 8, 128, 32, 256
    key = jax.random.PRNGKey(0)
    params = llama.init_params(key, cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    prompt = jax.random.randint(key, (batch, prompt_len), 0, cfg.vocab_size)

    def bench(p, kv_quant=None):
        def mutate(args, i):
            return (args[0], (args[1] + i + 1) % cfg.vocab_size) + args[2:]

        us = device_time_us(
            lambda p_, pr: generate(p_, pr, cfg, steps, max_seq,
                                    kv_quant=kv_quant),
            p, prompt, iters=3, mutate=mutate,
        )
        return batch * steps / (us / 1e6)

    base = bench(params)
    print(json.dumps({"config": "bf16", "tok_s": round(base, 1),
                      "speedup": 1.0}))

    suites = [
        ("int4_wo_g128", ao_tpu.Int4WeightOnlyConfig(group_size=128), None),
        ("w4a8_g128",
         ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=128), None),
        ("int8_wo", ao_tpu.Int8WeightOnlyConfig(), None),
        ("fp8_dyn", ao_tpu.Float8DynamicActivationFloat8WeightConfig(), None),
        ("int4_wo+int8kv", ao_tpu.Int4WeightOnlyConfig(group_size=128),
         "int8"),
        # QLoRA-style NF4 decode: the fused LUT kernel vs its old
        # dequantize-the-world fallback is the row to watch here
        ("nf4_wo", ao_tpu.NF4WeightOnlyConfig(), None),
    ]
    for name, qcfg, kv in suites:
        qp = ao_tpu.quantize_(params, qcfg)
        tok_s = bench(qp, kv_quant=kv)
        print(json.dumps({"config": name, "tok_s": round(tok_s, 1),
                          "speedup": round(tok_s / base, 3)}), flush=True)
        del qp  # free HBM before the next config
        jax.clear_caches()

    # ---- long context: at max_seq 4096 the per-step KV reads (bf16
    # ~1.1 GB across 8 layers at batch 4) rival the int4 weight bytes, so
    # int8-KV halves the dominant stream — this is where KV quantization
    # pays, not at the 256-token suite above ----
    batch, prompt_len, steps, max_seq = 4, 3968, 16, 4096
    prompt = jax.random.randint(key, (batch, prompt_len), 0, cfg.vocab_size)
    qp = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(group_size=128))
    del params

    def bench_decode(kv_quant):
        """DECODE-ONLY tok/s at a full cache: generate() jits prefill +
        scan(decode) as one program, and the 3968-token prefill dominates
        a 16-step run (measured: it hid a 2.7x attention-kernel win as
        +1.9% e2e) — difference two step counts to isolate the decode."""
        def mutate(args, i):
            return (args[0], (args[1] + i + 1) % cfg.vocab_size) + args[2:]

        def run(n):
            return device_time_us(
                lambda p_, pr: generate(p_, pr, cfg, n, max_seq,
                                        kv_quant=kv_quant),
                qp, prompt, iters=3, mutate=mutate)

        us1, us16 = run(1), run(steps)
        return batch * (steps - 1) / ((us16 - us1) / 1e6)

    lbase = bench_decode(None)
    print(json.dumps({"config": "long4k_int4_wo", "tok_s": round(lbase, 1),
                      "speedup": 1.0, "note": "decode-only"}), flush=True)
    lkv = bench_decode("int8")
    print(json.dumps({"config": "long4k_int4_wo+int8kv",
                      "tok_s": round(lkv, 1),
                      "speedup": round(lkv / lbase, 3)}), flush=True)
    lkv4 = bench_decode("int4")
    print(json.dumps({"config": "long4k_int4_wo+int4kv",
                      "tok_s": round(lkv4, 1),
                      "speedup": round(lkv4 / lbase, 3)}), flush=True)
    lkv8f = bench_decode("float8_e4m3fn")
    print(json.dumps({"config": "long4k_int4_wo+fp8kv",
                      "tok_s": round(lkv8f, 1),
                      "speedup": round(lkv8f / lbase, 3)}), flush=True)


if __name__ == "__main__":
    main()
