"""Autoregressive decode loop: prefill + lax.scan token generation.

(ref analog: the gpt-fast decode loop used for the reference's headline
int4 benchmarks, README.md:10. TPU-native: the whole generation is ONE
jitted program — prefill, then `lax.scan` over decode steps with an
in-place-donated KV cache; no per-token python dispatch.)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.models import llama, resolve_model


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_steps", "max_seq", "kv_quant", "use_flash",
                     "temperature", "top_k", "top_p"),
)
def generate(
    params: Any,
    prompt: jax.Array,  # (B, S) int32
    cfg: llama.LlamaConfig,
    num_steps: int,
    max_seq: int,
    kv_quant: Optional[str] = None,  # None | "int8" | "float8_e4m3fn" | "int4"
    use_flash: bool = False,
    temperature: float = 0.0,  # 0 = greedy
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Generation (greedy by default, or temperature/top-k/top-p sampling);
    returns (B, num_steps) generated tokens."""
    from ao_tpu.serving.sampling import sample_logits

    if temperature > 0.0 and rng is None:
        rng = jax.random.PRNGKey(0)

    model = resolve_model(cfg)

    def pick(logits, i):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return sample_logits(
            logits, jax.random.fold_in(rng, i), temperature, top_k, top_p
        )
    b, s = prompt.shape
    if kv_quant:
        from ao_tpu.serving.kvcache import init_quant_kv_caches

        caches = init_quant_kv_caches(cfg, b, max_seq, kv_quant)
    else:
        caches = model.init_kv_caches(cfg, b, max_seq)

    # prefill
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    logits, caches = model.forward(
        params, prompt, cfg, positions=positions, kv_caches=caches,
        cache_index=0, use_flash=use_flash,
    )
    next_tok = pick(logits[:, -1], 0)

    def step(carry, _):
        caches, tok, idx = carry
        pos = jnp.full((b, 1), idx, jnp.int32)
        logits, caches = model.forward(
            params, tok[:, None], cfg, positions=pos, kv_caches=caches,
            cache_index=idx,
        )
        nxt = pick(logits[:, -1], idx)
        return (caches, nxt, idx + 1), nxt

    (_, _, _), toks = jax.lax.scan(
        step, (caches, next_tok, jnp.int32(s)), None, length=num_steps - 1
    )
    # the prefill-predicted token is the FIRST generated token
    return jnp.concatenate([next_tok[:, None], toks.T], axis=1)  # (B, steps)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dcfg", "rounds", "k", "max_seq", "kv_quant"),
)
def generate_speculative(
    params: Any,
    draft_params: Any,
    prompt: jax.Array,  # (B, S) int32
    cfg: llama.LlamaConfig,
    dcfg: llama.LlamaConfig,
    rounds: int,
    max_seq: int,
    k: int = 4,
    kv_quant: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Draft-model speculative decoding, greedy, fully on device: each
    round drafts ``k`` tokens with the small model, verifies them in ONE
    wide forward of the target model, and accepts the longest matching
    prefix plus the bonus token — draft, verify, accept, and both KV-cache
    fix-ups all inside one ``lax.scan`` body with zero host syncs.

    (ref analog: the speculative-decoding serving pattern around the
    reference's quantized models (gpt-fast/vLLM); the engine's
    ``spec_draft`` is the host-drafted n-gram variant — this is the
    model-drafted one. Natural pairing: a quantized draft (e.g. int4-WO
    of a small model) + a quantized target. KV rows past each round's
    accepted prefix hold rejected-branch values; every next round's
    window starts exactly at the first stale row, so they are rewritten
    before the causal mask ever exposes them.)

    Returns ``(tokens, n_valid)``: tokens (B, 1 + rounds*(k+1)) — the
    prefill-predicted token first, then each round's slots left-packed
    with -1 padding on rejected drafts; n_valid (B,) counts the real
    tokens. Requires prompt_len + rounds*(k+1) <= max_seq.
    """
    model = resolve_model(cfg)
    dmodel = resolve_model(dcfg)
    b, s = prompt.shape
    if kv_quant:
        from ao_tpu.serving.kvcache import init_quant_kv_caches

        caches = init_quant_kv_caches(cfg, b, max_seq, kv_quant)
    else:
        caches = model.init_kv_caches(cfg, b, max_seq)
    dcaches = dmodel.init_kv_caches(dcfg, b, max_seq)

    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    logits, caches = model.forward(
        params, prompt, cfg, positions=positions, kv_caches=caches,
        cache_index=0,
    )
    _, dcaches = dmodel.forward(
        draft_params, prompt, dcfg, positions=positions, kv_caches=dcaches,
        cache_index=0,
    )
    cur = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos = jnp.full((b,), s, jnp.int32)
    cap = max_seq - 1
    rows = jnp.arange(b)

    def round_step(carry, _):
        caches, dcaches, cur, pos = carry
        # -- draft chain: k single-token forwards of the small model,
        # starting by (re)feeding cur at pos — which also repairs the
        # draft cache row left wrong by the previous round's rejection
        toks = [cur]
        t = cur
        dc = dcaches
        for j in range(k):
            pj = jnp.minimum(pos + j, cap)
            lg, dc = dmodel.forward(
                draft_params, t[:, None], dcfg, positions=pj[:, None],
                kv_caches=dc, cache_index=pj,
            )
            t = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
            toks.append(t)
        # write-only step for the last draft token's KV row: without it a
        # fully-accepted round (acc == k) leaves a zero row at pos+k that
        # the next round's drafts would attend over
        pk = jnp.minimum(pos + k, cap)
        _, dc = dmodel.forward(
            draft_params, t[:, None], dcfg, positions=pk[:, None],
            kv_caches=dc, cache_index=pk,
        )
        window = jnp.stack(toks, axis=1)  # (B, k+1)

        # -- verify: one (k+1)-wide target forward at per-slot offsets
        wpos = jnp.minimum(pos[:, None] + jnp.arange(k + 1)[None], cap)
        logits, caches = model.forward(
            params, window, cfg, positions=wpos, kv_caches=caches,
            cache_index=pos,
        )
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)

        # -- accept longest matching draft prefix + 1 bonus token
        match = (window[:, 1:] == preds[:, :k]).astype(jnp.int32)
        acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # (B,) in [0, k]
        emit_mask = jnp.arange(k + 1)[None] <= acc[:, None]
        emitted = jnp.where(emit_mask, preds, -1)
        cur_new = preds[rows, acc]
        pos_new = jnp.minimum(pos + acc + 1, cap)
        return (caches, dc, cur_new, pos_new), (emitted, acc + 1)

    (_, _, _, _), (emitted, n_round) = jax.lax.scan(
        round_step, (caches, dcaches, cur, pos), None, length=rounds
    )
    # (rounds, B, k+1) → (B, rounds*(k+1)); prepend the prefill token
    packed = emitted.transpose(1, 0, 2).reshape(b, rounds * (k + 1))
    tokens = jnp.concatenate([cur[:, None], packed], axis=1)
    return tokens, 1 + jnp.sum(n_round, axis=0)
