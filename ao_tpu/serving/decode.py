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
    kv_quant: Optional[str] = None,  # None | "int8" | "float8_e4m3fn"
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
