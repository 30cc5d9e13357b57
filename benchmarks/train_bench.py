"""End-to-end training-step benchmark: quantized-training recipes vs bf16.

Run on a real TPU: ``python benchmarks/train_bench.py [n_layers] [tokens]``.
Prints one JSON line per recipe with ms/step (fwd+bwd+AdamW update) and the
speedup vs the bf16 baseline, plus a final line with low-bit optimizer-state
memory.

TPU-native expectations (honest, per generation):
- ``int8_mp``  — int8 dynamic matmuls fwd+bwd (ref analog:
  Int8MixedPrecisionTrainingConfig, prototype/quantized_training/README.md):
  the v5e MXU runs i8xi8->i32 at 2x bf16 FLOPs, so the compute-bound step
  should approach that. This is the TPU-native counterpart of the
  reference's "fp8 pretrain 1.5x" headline (README.md:8) — on v5e fp8 has
  NO native MXU, so int8 carries the compute win there.
- ``fp8_tensorwise`` / ``fp8_rowwise`` — the reference's float8 training
  recipes (torchao/float8/README.md). On v5e these measure the cast
  overhead only (matmuls upcast — expect <=1x); on fp8-native generations
  (v6e+) they inherit the hardware win.
- ``bitnet`` — ternary weights with int8 activations (ref:
  prototype/quantized_training bitnet).

Weights are distinct per iteration (mutate) to defeat remote memoization.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here so
# `JAX_PLATFORMS=cpu python benchmarks/train_bench.py` works for smokes
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from ao_tpu.training.float8 import Float8TrainingRecipe, fp8_matmul
from ao_tpu.training.quantized_training import (
    bitnet_linear,
    int8_mixed_precision_matmul,
)
from ao_tpu.training.optim import adamw_lowbit
from ao_tpu.utils.roofline import detect_tpu_spec
from ao_tpu.utils.timing import device_time_us

# Llama-3-8B block dims; AO_TPU_TRAIN_BENCH_DIMS="D,F" overrides (CPU smoke)
D, F = (int(v) for v in os.environ.get(
    "AO_TPU_TRAIN_BENCH_DIMS", "4096,14336").split(","))


def init_blocks(key, n_layers):
    ks = jax.random.split(key, 3 * n_layers)
    blocks = []
    for i in range(n_layers):
        blocks.append({
            "w_in": jax.random.normal(ks[3 * i], (D, F), jnp.float32) * 0.02,
            "w_gate": jax.random.normal(ks[3 * i + 1], (D, F), jnp.float32) * 0.02,
            "w_out": jax.random.normal(ks[3 * i + 2], (F, D), jnp.float32) * 0.02,
        })
    return blocks


def make_step(matmul, n_layers):
    """SwiGLU MLP stack: captures the 3 big GEMMs/block of a Llama step
    (attention GEMMs have identical arithmetic class; MLP is 2/3 of 8B
    FLOPs) with a full value_and_grad + AdamW-style update."""

    def loss_fn(blocks, x):
        h = x
        for blk in blocks:
            up = matmul(h, blk["w_in"])
            gate = jax.nn.silu(matmul(h, blk["w_gate"]))
            h = h + matmul((up * gate).astype(x.dtype), blk["w_out"]).astype(
                x.dtype
            )
        return jnp.mean(h.astype(jnp.float32) ** 2)

    @jax.jit
    def step(blocks, mu, x):
        loss, grads = jax.value_and_grad(loss_fn)(blocks, x)
        # first-moment SGD update stands in for the optimizer traffic
        new_mu = jax.tree.map(lambda m, g: 0.9 * m + g, mu, grads)
        new_blocks = jax.tree.map(lambda p, m: p - 1e-3 * m, blocks, new_mu)
        return new_blocks, new_mu, loss

    return step


def bench_recipe(name, matmul, n_layers, tokens, base_ms=None):
    blocks = init_blocks(jax.random.PRNGKey(0), n_layers)
    mu = jax.tree.map(jnp.zeros_like, blocks)
    x = jax.random.normal(jax.random.PRNGKey(1), (tokens, D), jnp.bfloat16)
    step = make_step(matmul, n_layers)

    def run(blocks, mu, x):
        b2, m2, loss = step(blocks, mu, x)
        return loss

    def mutate(args, i):
        blocks, mu, x = args
        blocks = jax.tree.map(lambda p: p * (1.0 + 1e-6 * (i + 1)), blocks)
        return (blocks, mu, x)

    us = device_time_us(run, blocks, mu, x, iters=6, mutate=mutate)
    ms = us / 1e3
    rec = {"recipe": name, "ms_per_step": round(ms, 3),
           "tokens": tokens, "layers": n_layers}
    if base_ms is not None and ms > 0:
        rec["speedup_vs_bf16"] = round(base_ms / ms, 3)
    print(json.dumps(rec))
    return ms


def optim_state_report(n_layers):
    blocks = init_blocks(jax.random.PRNGKey(0), n_layers)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(blocks))
    opt8 = adamw_lowbit(1e-3, state_bits=8)
    st = opt8.init(blocks)
    bytes8 = sum(
        t.size * t.dtype.itemsize
        for t in jax.tree.leaves(st)
        if hasattr(t, "dtype")
    )
    print(json.dumps({
        "recipe": "adamw8bit_state",
        "state_bytes_per_param": round(bytes8 / n_params, 3),
        "fp32_adam_bytes_per_param": 8.0,
        "reduction": round(8.0 * n_params / bytes8, 2),
    }))


def main():
    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    spec = detect_tpu_spec()
    print(json.dumps({"tpu": spec.name, "note": "ms/step fwd+bwd+update"}))

    bf16 = lambda x, w: jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    base = bench_recipe("bf16", bf16, n_layers, tokens)

    bench_recipe("int8_mp", int8_mixed_precision_matmul, n_layers, tokens, base)

    tw = Float8TrainingRecipe(name="tensorwise")
    bench_recipe("fp8_tensorwise", lambda x, w: fp8_matmul(x, w, tw),
                 n_layers, tokens, base)
    rw = Float8TrainingRecipe(name="rowwise")
    bench_recipe("fp8_rowwise", lambda x, w: fp8_matmul(x, w, rw),
                 n_layers, tokens, base)

    bench_recipe("bitnet", bitnet_linear, n_layers, tokens, base)

    optim_state_report(n_layers)


if __name__ == "__main__":
    main()
