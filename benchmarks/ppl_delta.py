"""Perplexity-delta acceptance table across the quantization config ladder.

(ref analog: docs/source/workflows/inference.md:44-51 — the reference gates
quantization quality on wikitext ppl DELTA vs the bf16 baseline:
bf16 7.3315 → fp8-rowwise +0.088 / int8-WO +0.014 / int8×int8 +0.122 /
mxfp8 +0.272 / nvfp4 +1.114. No public corpus ships in this environment,
so the protocol runs hermetically: train a small Llama on the Zipf
synthetic stream until it has real structure to lose, then measure each
config's ppl delta — deltas track real-text deltas because both are
dominated by logit perturbation, and the ORDERING across bit widths is the
acceptance criterion.)

Run: python benchmarks/ppl_delta.py  (one TPU chip, ~3 min)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
# explicitly so `JAX_PLATFORMS=cpu` smokes work
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import optax

import ao_tpu
from ao_tpu.eval.perplexity import load_tokens, perplexity, synthetic_tokens
from ao_tpu.models import llama

VOCAB = 512
CFG = llama.LlamaConfig(vocab_size=VOCAB, dim=256, n_layers=4, n_heads=8,
                        n_kv_heads=4, ffn_dim=512, tie_embeddings=True,
                        dtype=jnp.bfloat16)
SEQ, BATCH, STEPS = 128, 16, 300


def train_base(key):
    params = llama.init_params(key, CFG)
    stream = synthetic_tokens(jax.random.fold_in(key, 1),
                              STEPS * BATCH * SEQ + SEQ, VOCAB)
    opt = optax.adamw(3e-3, weight_decay=0.01)
    state = opt.init(params)

    def loss_fn(p, batch):
        logits, _ = llama.forward(p, batch, CFG)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = batch[:, 1:]
        return -jnp.take_along_axis(logp, tgt[..., None], -1).mean()

    @jax.jit
    def step(p, st, batch):
        l, g = jax.value_and_grad(loss_fn)(p, batch)
        up, st = opt.update(g, st, p)
        return optax.apply_updates(p, up), st, l

    for i in range(STEPS):
        batch = stream[i * BATCH * SEQ:(i + 1) * BATCH * SEQ].reshape(
            BATCH, SEQ)
        params, state, l = step(params, state, batch)
        if i % 100 == 0:
            print(f"  train step {i}: loss {float(l):.3f}")
    return params


def main():
    key = jax.random.PRNGKey(0)
    print("training base model on the synthetic stream...")
    params = train_base(key)
    corpus = os.environ.get("AO_TPU_PPL_TOKENS")
    if corpus:  # real tokenized corpus (e.g. wikitext-2) is first-class
        eval_toks = load_tokens(corpus, VOCAB)
    else:
        eval_toks = synthetic_tokens(
            jax.random.fold_in(key, 99), 64 * SEQ, VOCAB)

    def ppl_of(p):
        return perplexity(
            lambda b: llama.forward(p, b, CFG)[0], eval_toks,
            seq_len=SEQ, batch_size=8,
        )

    base_ppl = ppl_of(params)
    print(f"bf16 ppl {base_ppl:.4f}")

    ladder = [
        ("int8-WO", ao_tpu.Int8WeightOnlyConfig()),
        ("int8xint8", ao_tpu.Int8DynamicActivationInt8WeightConfig()),
        ("fp8-dyn", ao_tpu.Float8DynamicActivationFloat8WeightConfig()),
        ("int4-WO g64", ao_tpu.Int4WeightOnlyConfig(group_size=64)),
        ("w4a8 g64",
         ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=64)),
        ("nf4 g64", ao_tpu.NF4WeightOnlyConfig(block_size=64)),
        ("intx-3bit", ao_tpu.IntxWeightOnlyConfig(bit_width=3)),
    ]
    rows = {}
    for name, cfg in ladder:
        qp = ao_tpu.quantize_(params, cfg)
        ppl = ppl_of(qp)
        rows[name] = {"ppl": round(ppl, 4),
                      "delta": round(ppl - base_ppl, 4)}
        print(f"{name:14s} ppl {ppl:.4f}  delta {ppl - base_ppl:+.4f}")

    # acceptance: deltas must be ordered by information kept — 8-bit
    # (weight-only or dynamic-act) tighter than 4-bit, 4-bit tighter than
    # 3-bit — and 8-bit deltas must be small in absolute terms
    assert rows["int8-WO"]["delta"] < rows["int4-WO g64"]["delta"]
    assert rows["int4-WO g64"]["delta"] < rows["intx-3bit"]["delta"]
    assert abs(rows["int8-WO"]["delta"]) < 0.05 * base_ppl

    # ---- KV-cache quantization rows: teacher-forced through the DECODE
    # path (cached_forward_fn) so the cache error is actually exercised.
    # Shorter eval (sequential scan per window) — the deltas, not absolute
    # ppl, are the metric, and bf16-cache must reproduce the cache-free
    # baseline exactly (same math, different program) ----
    from ao_tpu.eval.perplexity import cached_forward_fn

    kv_toks = eval_toks[: 16 * SEQ]
    kv_base = perplexity(cached_forward_fn(params, CFG), kv_toks,
                         seq_len=SEQ, batch_size=8)
    print(f"bf16-KV (decode path) ppl {kv_base:.4f}")
    for kvq in ("int8", "int4"):
        p = perplexity(cached_forward_fn(params, CFG, kv_quant=kvq),
                       kv_toks, seq_len=SEQ, batch_size=8)
        rows[f"kv-{kvq}"] = {"ppl": round(p, 4),
                             "delta": round(p - kv_base, 4)}
        print(f"kv-{kvq:10s} ppl {p:.4f}  delta {p - kv_base:+.4f}")
    assert rows["kv-int8"]["delta"] <= rows["kv-int4"]["delta"]

    print(json.dumps({"metric": "ppl-delta ladder (synthetic)",
                      "bf16_ppl": round(base_ppl, 4),
                      "kv_bf16_ppl": round(kv_base, 4), "rows": rows}))


if __name__ == "__main__":
    main()
