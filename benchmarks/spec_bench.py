"""Speculative decoding end-to-end: tok/s + acceptance vs plain decode.

``python benchmarks/spec_bench.py`` on a real TPU. Configuration is the
classic deployable one: bf16 target + the SAME model int4-WO-quantized as
the draft (quantization rarely flips a greedy argmax, so acceptance is
high and the draft chain reads 4x fewer weight bytes per token).

(ref analog: gpt-fast's speculative-decoding demo around the reference's
int4 models — torchao README's generate.py flags. Here both loops are the
framework's own: `generate` and `generate_speculative`, each ONE jitted
program.)
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
import numpy as np

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.serving.decode import generate, generate_speculative
from ao_tpu.utils.timing import device_time_us


def main():
    cfg = llama.LlamaConfig(
        vocab_size=128256, dim=4096, n_layers=8, n_heads=32, n_kv_heads=8,
        ffn_dim=14336, tie_embeddings=False,
    )
    batch, prompt_len, max_seq, k, rounds = 8, 128, 512, 4, 16
    if os.environ.get("AO_SPEC_TINY"):  # CPU smoke
        cfg = llama.LlamaConfig(vocab_size=512, dim=128, n_layers=2,
                                n_heads=4, n_kv_heads=2, ffn_dim=256,
                                tie_embeddings=True)
        batch, prompt_len, max_seq, rounds = 2, 8, 128, 4

    key = jax.random.PRNGKey(0)
    params = llama.init_params(key, cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    draft = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(group_size=128))
    prompt = jax.random.randint(key, (batch, prompt_len), 0, cfg.vocab_size)

    def mutate(args, i):
        pr = (args[2] + i + 1) % cfg.vocab_size
        return args[:2] + (pr,) + args[3:]

    # plain greedy decode, same token budget as the spec run's ceiling
    steps = rounds * (k + 1) + 1
    us_plain = max(device_time_us(
        lambda p_, _unused, pr: generate(p_, pr, cfg, steps, max_seq),
        params, draft, prompt, iters=3, mutate=mutate), 1e-3)
    plain_tok_s = batch * steps / (us_plain / 1e6)
    print(json.dumps({"config": "plain_greedy",
                      "tok_s": round(plain_tok_s, 1), "speedup": 1.0}),
          flush=True)

    us_spec = max(device_time_us(
        lambda p_, d_, pr: generate_speculative(
            p_, d_, pr, cfg, cfg, rounds, max_seq, k=k),
        params, draft, prompt, iters=3, mutate=mutate), 1e-3)
    toks, n_valid = generate_speculative(
        params, draft, prompt, cfg, cfg, rounds, max_seq, k=k)
    n_tok = float(np.mean(np.asarray(n_valid)))
    accept = (n_tok - 1 - rounds) / (rounds * k)  # drafts accepted / drafted
    spec_tok_s = batch * n_tok / (us_spec / 1e6)
    print(json.dumps({
        "config": f"spec_int4_draft_k{k}",
        "tok_s": round(spec_tok_s, 1),
        "speedup": round(spec_tok_s / plain_tok_s, 3),
        "accept_rate": round(max(accept, 0.0), 3),
        "tokens_per_round": round(n_tok / rounds, 2),
    }), flush=True)

    # Acceptance here is a RANDOM-INIT artifact: at vocab 128k the top-2
    # logit gap of an untrained model is tiny, so 4-bit noise flips the
    # argmax almost always (measured 1.0 accept for an identical draft and
    # ~0.7 for int4 on trained/small-vocab models — see ppl_delta.py's
    # trained-model spec row). The acceptance-INDEPENDENT statement of
    # this measurement is the breakeven curve: one spec round (k drafts +
    # wide verify) costs r plain steps, so spec wins per accepted-token
    # whenever accept > (r - 1) / k.
    plain_step_us = us_plain / steps
    round_us = us_spec / rounds
    r = round_us / plain_step_us
    print(json.dumps({
        "config": f"spec_round_overhead_k{k}",
        "plain_step_us": round(plain_step_us, 1),
        "spec_round_us": round(round_us, 1),
        "rounds_per_plain_step": round(r, 3),
        "breakeven_accept": round(max((r - 1.0) / k, 0.0), 3),
    }), flush=True)

    # The deployable draft SHAPE: a much smaller model (here 2 of 8
    # layers, int4) — a same-size int4 draft only cuts weight bytes 4x,
    # so k=4 drafts already cost ~1.7 plain steps before the verify
    draft_cfg = llama.LlamaConfig(
        vocab_size=cfg.vocab_size, dim=cfg.dim, n_layers=max(cfg.n_layers // 4, 1),
        n_heads=cfg.n_heads, n_kv_heads=cfg.n_kv_heads, ffn_dim=cfg.ffn_dim,
        tie_embeddings=cfg.tie_embeddings,
    )
    dsmall = ao_tpu.quantize_(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                     llama.init_params(jax.random.PRNGKey(7), draft_cfg)),
        ao_tpu.Int4WeightOnlyConfig(group_size=128))
    us_small = max(device_time_us(
        lambda p_, d_, pr: generate_speculative(
            p_, d_, pr, cfg, draft_cfg, rounds, max_seq, k=k),
        params, dsmall, prompt, iters=3, mutate=mutate), 1e-3)
    r2 = (us_small / rounds) / plain_step_us
    print(json.dumps({
        "config": f"spec_round_overhead_smalldraft_k{k}",
        "draft_layers": draft_cfg.n_layers,
        "spec_round_us": round(us_small / rounds, 1),
        "rounds_per_plain_step": round(r2, 3),
        "breakeven_accept": round(max((r2 - 1.0) / k, 0.0), 3),
    }), flush=True)

    # ---- the REAL demonstration: a TRAINED pair (byte-level target +
    # small trained draft on the committed corpus). The rows above are
    # overhead geometry on random-init weights, where vocab-128k argmax
    # margins are noise and acceptance is an artifact (accept 0.049 in
    # r4). Trained models have real margins: the ladder measured 0.914
    # accept for an int4 draft — this section combines the ingredients
    # into a committed tok/s WIN (VERDICT r4 next-step 5). ----
    if not os.environ.get("AO_SPEC_TINY"):
        trained_pair(k=6, rounds=12)


def _train_byte_lm(cfg, stream, steps, key, lr=3e-3):
    import optax

    params = llama.init_params(key, cfg)
    opt = optax.adamw(lr, weight_decay=0.01)
    state = opt.init(params)

    def loss_fn(p, batch):
        logits, _ = llama.forward(p, batch, cfg)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        return -jnp.take_along_axis(
            logp, batch[:, 1:][..., None], -1).mean()

    @jax.jit
    def step(p, st, batch):
        l, g = jax.value_and_grad(loss_fn)(p, batch)
        up, st = opt.update(g, st, p)
        return optax.apply_updates(p, up), st, l

    bsz, seq = 16, 128
    per = bsz * seq
    n = stream.shape[0]
    for i in range(steps):
        off = (i * per) % (n - per)
        batch = jnp.asarray(stream[off:off + per]).reshape(bsz, seq)
        params, state, l = step(params, state, batch)
    print(f"  trained {cfg.n_layers}L/d{cfg.dim}: final loss {float(l):.3f}",
          file=sys.stderr)
    return params


def trained_pair(k: int, rounds: int):
    """bf16 trained target (12L d1024) + int4 trained draft (2L d512) on
    real text: measured tok/s vs the target's plain decode."""
    from ao_tpu.eval.corpus import load_byte_corpus, train_eval_split

    toks = load_byte_corpus()
    train_toks, eval_toks = train_eval_split(toks, eval_frac=0.05)
    tcfg = llama.LlamaConfig(vocab_size=256, dim=1024, n_layers=12,
                             n_heads=16, n_kv_heads=8, ffn_dim=2816,
                             tie_embeddings=True)
    dcfg = llama.LlamaConfig(vocab_size=256, dim=512, n_layers=2,
                             n_heads=8, n_kv_heads=4, ffn_dim=1408,
                             tie_embeddings=True)
    key = jax.random.PRNGKey(0)
    target = _train_byte_lm(tcfg, np.asarray(train_toks), 800, key)
    target = jax.tree.map(lambda x: x.astype(jnp.bfloat16), target)
    draft_hp = _train_byte_lm(dcfg, np.asarray(train_toks), 400,
                              jax.random.PRNGKey(1))
    draft = ao_tpu.quantize_(draft_hp,
                             ao_tpu.Int4WeightOnlyConfig(group_size=64))

    batch, plen, max_seq = 8, 128, 512
    prompt = jnp.asarray(np.asarray(eval_toks[: batch * plen])
                         ).reshape(batch, plen)

    def mutate(args, i):
        return args[:2] + ((args[2] + i + 1) % 256,) + args[3:]

    steps = rounds * (k + 1) + 1
    us_plain = max(device_time_us(
        lambda p_, _d, pr: generate(p_, pr, tcfg, steps, max_seq),
        target, draft, prompt, iters=3, mutate=mutate), 1e-3)
    plain_tok_s = batch * steps / (us_plain / 1e6)

    us_spec = max(device_time_us(
        lambda p_, d_, pr: generate_speculative(
            p_, d_, pr, tcfg, dcfg, rounds, max_seq, k=k),
        target, draft, prompt, iters=3, mutate=mutate), 1e-3)
    _, n_valid = generate_speculative(target, draft, prompt, tcfg, dcfg,
                                      rounds, max_seq, k=k)
    n_tok = float(np.mean(np.asarray(n_valid)))
    accept = (n_tok - 1 - rounds) / (rounds * k)
    spec_tok_s = batch * n_tok / (us_spec / 1e6)
    print(json.dumps({
        "config": f"spec_trained_pair_k{k}",
        "target": "12L/d1024 bf16 byte-LM",
        "draft": "2L/d512 int4-WO byte-LM",
        "tok_s": round(spec_tok_s, 1),
        "plain_tok_s": round(plain_tok_s, 1),
        "speedup": round(spec_tok_s / plain_tok_s, 3),
        "accept_rate": round(max(accept, 0.0), 3),
        "tokens_per_round": round(n_tok / rounds, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
