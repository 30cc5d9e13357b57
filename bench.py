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
import os

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
# explicitly so `JAX_PLATFORMS=cpu` smokes work
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

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

    def bench(p, tag, bcfg=cfg):
        # perturb the prompt each iter to defeat remote-result memoization
        def mutate(args, i):
            pr = (args[1] + i + 1) % bcfg.vocab_size
            return (args[0], pr) + args[2:]

        us = device_time_us(
            lambda p_, pr: generate(p_, pr, bcfg, steps, max_seq),
            p, prompt, iters=3, mutate=mutate,
        )
        dt = us / 1e6
        tok_s = batch * steps / dt
        print(f"# {tag}: {dt*1e3:.1f} ms device time for {steps} steps x "
              f"{batch} batch = {tok_s:.1f} tok/s", file=sys.stderr)
        return tok_s

    tok_bf16 = bench(params, "bf16")
    # W4A8 sidecar row (the headline stays int4-WO for baseline
    # comparability — torchao's 1.89x is weight-only)
    qp8 = ao_tpu.quantize_(
        params, ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=128))
    tok_w4a8 = bench(qp8, "w4a8")
    del qp8
    qparams = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(group_size=128))
    del params
    tok_int4 = bench(qparams, "int4-wo")
    del qparams

    # --- full-size 32-layer 8B: ABSOLUTE int4 tok/s (int4 fits in HBM;
    # bf16 8B does not, so its tok/s is modeled from the measured 12-layer
    # bf16 effective bandwidth — the 12L ratio above stays the comparable
    # headline, this row pins it to a non-proxy absolute number)
    cfg32 = llama.LlamaConfig(
        vocab_size=cfg.vocab_size, dim=cfg.dim, n_layers=32,
        n_heads=cfg.n_heads, n_kv_heads=cfg.n_kv_heads, ffn_dim=cfg.ffn_dim,
        tie_embeddings=False,
    )
    int4cfg = ao_tpu.Int4WeightOnlyConfig(group_size=128)
    # build layer-by-layer so the transient bf16 layer (~0.4 GB) never
    # coexists with a full bf16 model (16 GB > HBM)
    one = llama.LlamaConfig(
        vocab_size=256, dim=cfg.dim, n_layers=1, n_heads=cfg.n_heads,
        n_kv_heads=cfg.n_kv_heads, ffn_dim=cfg.ffn_dim, tie_embeddings=True,
    )
    layers32 = []
    for i in range(cfg32.n_layers):
        lp = llama.init_params(jax.random.PRNGKey(100 + i), one)["layers"][0]
        lp = jax.tree.map(lambda x: x.astype(jnp.bfloat16), lp)
        layers32.append(ao_tpu.quantize_(lp, int4cfg))
    ke = jax.random.PRNGKey(999)
    d = cfg32.dim
    embed = (jax.random.normal(ke, (cfg32.vocab_size, d), jnp.float32)
             .astype(jnp.bfloat16) * 0.02)
    head = ao_tpu.quantize_(
        {"lm_head": (jax.random.normal(jax.random.PRNGKey(998),
                                       (d, cfg32.vocab_size), jnp.float32)
                     * d ** -0.5).astype(jnp.bfloat16)}, int4cfg)
    params32 = {"embed": embed, "layers": layers32,
                "norm": jnp.ones((d,), jnp.bfloat16),
                "lm_head": head["lm_head"]}
    tok_int4_full = bench(params32, "int4-wo 32L (full 8B)", bcfg=cfg32)
    del params32

    # modeled bf16 roofline for the full model: effective weight bandwidth
    # from the measured 12L bf16 run, scaled to 32L weight bytes
    hd = cfg.head_dim
    layer_params = (cfg.dim * cfg.n_heads * hd
                    + 2 * cfg.dim * cfg.n_kv_heads * hd
                    + cfg.n_heads * hd * cfg.dim
                    + 3 * cfg.dim * cfg.ffn_dim)
    head_params = cfg.dim * cfg.vocab_size
    b12 = (12 * layer_params + head_params) * 2.0
    b32 = (32 * layer_params + head_params) * 2.0
    bw_eff = b12 * tok_bf16 / batch  # bytes/s inferred from measured 12L
    tok_bf16_full_modeled = bw_eff / b32 * batch
    full_speedup = tok_int4_full / tok_bf16_full_modeled
    print(f"# full 8B: int4 {tok_int4_full:.1f} tok/s vs modeled bf16 "
          f"{tok_bf16_full_modeled:.1f} tok/s = {full_speedup:.2f}x",
          file=sys.stderr)

    speedup = tok_int4 / tok_bf16
    print(json.dumps({
        "metric": "int4-WO vs bf16 decode speedup (Llama-3-8B dims, 12L, bs8, 1 chip)",
        "value": round(speedup, 4),
        "unit": "x (int4 tok/s / bf16 tok/s)",
        "vs_baseline": round(speedup / 1.89, 4),
        "detail": {
            "bf16_tok_s": round(tok_bf16, 1),
            "int4_tok_s": round(tok_int4, 1),
            "w4a8_tok_s": round(tok_w4a8, 1),
            "w4a8_speedup": round(tok_w4a8 / tok_bf16, 4),
            "reference_speedup": 1.89,
            "full_8b_32L": {
                "int4_tok_s_measured": round(tok_int4_full, 1),
                "bf16_tok_s_modeled_roofline": round(
                    tok_bf16_full_modeled, 1),
                "speedup_vs_modeled": round(full_speedup, 4),
            },
        },
    }))


if __name__ == "__main__":
    main()
