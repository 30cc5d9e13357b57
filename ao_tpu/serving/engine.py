"""Continuous-batching serving engine.

(ref analog: the serving story the reference delegates to vLLM
(docs/source/eager_tutorials/serving.rst) — here it's in-framework: a
slot-based engine over one jitted decode step. TPU re-design for static
shapes: the batch is a fixed pool of ``max_batch`` slots; requests claim a
slot, prefill once (bucketed prompt lengths bound recompilation), and every
`step()` advances ALL active slots with one device program — per-slot
positions drive the causal mask, inactive slots are masked lanes. The KV
pool may be int8/fp8 quantized (QuantKVCache), halving decode HBM reads.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.models import llama
from ao_tpu.serving.kvcache import QuantKVCache, init_quant_kv_caches


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    max_batch: int = 8
    max_seq: int = 2048
    kv_quant: Optional[str] = None  # None | "int8" | "float8_e4m3fn"
    eos_id: int = -1  # -1: never stop on a token
    prefill_buckets: Tuple[int, ...] = (128, 512, 2048)


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int
    generated: List[int] = dataclasses.field(default_factory=list)
    slot: int = -1
    done: bool = False


class Engine:
    """Host-side request orchestrator around jitted prefill/step programs."""

    def __init__(self, params: Any, model_cfg: llama.LlamaConfig,
                 cfg: ServeConfig = ServeConfig()):
        self.params = params
        self.model_cfg = model_cfg
        self.cfg = cfg
        b, t = cfg.max_batch, cfg.max_seq
        if cfg.kv_quant:
            self.caches = init_quant_kv_caches(model_cfg, b, t, cfg.kv_quant)
        else:
            self.caches = llama.init_kv_caches(model_cfg, b, t)
        self.positions = jnp.zeros((b,), jnp.int32)  # next write index
        self.cur_tok = jnp.zeros((b,), jnp.int32)
        self.active = jnp.zeros((b,), bool)
        self._slots: List[Optional[Request]] = [None] * b
        self._uid = 0
        self._queue: List[Request] = []
        self._finished: List[Request] = []

        self._prefill = jax.jit(
            self._prefill_impl, static_argnames=("plen",), donate_argnums=(0,)
        )
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    # -- jitted programs ----------------------------------------------------

    def _prefill_impl(self, caches, prompt, slot, true_len, *, plen):
        """prompt (1, plen) padded; writes this slot's KV rows and returns
        (caches, first generated token)."""
        mcfg = self.model_cfg
        # single-slot scratch caches for the prefill forward
        if self.cfg.kv_quant:
            scratch = init_quant_kv_caches(mcfg, 1, plen, self.cfg.kv_quant)
        else:
            scratch = llama.init_kv_caches(mcfg, 1, plen)
        positions = jnp.arange(plen, dtype=jnp.int32)[None]
        logits, scratch = llama.forward(
            self.params, prompt, mcfg, positions=positions,
            kv_caches=scratch, cache_index=0,
        )

        # insert the scratch rows into the slot of the pool
        def insert(pool_leaf, new_leaf):
            return jax.lax.dynamic_update_slice(
                pool_leaf, new_leaf.astype(pool_leaf.dtype),
                (slot,) + (0,) * (pool_leaf.ndim - 1),
            )

        caches = jax.tree_util.tree_map(insert, caches, scratch)
        next_tok = jnp.argmax(logits[0, true_len - 1], axis=-1).astype(jnp.int32)
        return caches, next_tok

    def _step_impl(self, caches, cur_tok, positions, active):
        """One decode step for all slots; returns (caches, next_tok)."""
        mcfg = self.model_cfg
        b = self.cfg.max_batch
        pos = positions[:, None]  # (B, 1)
        logits, new_caches = llama.forward(
            self.params, cur_tok[:, None], mcfg, positions=pos,
            kv_caches=caches, cache_index=positions,
        )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return new_caches, jnp.where(active, nxt, cur_tok)

    # -- host API -------------------------------------------------------------

    def submit(self, prompt: List[int], max_new_tokens: int = 32) -> int:
        req = Request(uid=self._uid, prompt=list(prompt),
                      max_new_tokens=max_new_tokens)
        self._uid += 1
        self._queue.append(req)
        return req.uid

    def _bucket(self, n: int) -> int:
        for b in self.cfg.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds buckets "
                         f"{self.cfg.prefill_buckets}")

    def _admit(self) -> None:
        for slot in range(self.cfg.max_batch):
            if self._slots[slot] is not None or not self._queue:
                continue
            req = self._queue.pop(0)
            req.slot = slot
            plen = self._bucket(len(req.prompt))
            prompt = jnp.asarray(
                req.prompt + [0] * (plen - len(req.prompt)), jnp.int32
            )[None]
            self.caches, tok = self._prefill(
                self.caches, prompt, jnp.int32(slot),
                jnp.int32(len(req.prompt)), plen=plen,
            )
            req.generated.append(int(tok))
            self.cur_tok = self.cur_tok.at[slot].set(tok)
            self.positions = self.positions.at[slot].set(len(req.prompt))
            self.active = self.active.at[slot].set(True)
            self._slots[slot] = req
            self._maybe_finish(req)

    def _maybe_finish(self, req: Request) -> None:
        hit_eos = req.generated and req.generated[-1] == self.cfg.eos_id
        full = int(self.positions[req.slot]) + 1 >= self.cfg.max_seq
        if len(req.generated) >= req.max_new_tokens or hit_eos or full:
            req.done = True
            self.active = self.active.at[req.slot].set(False)
            self._slots[req.slot] = None
            self._finished.append(req)

    def step(self) -> None:
        """Admit queued requests into free slots, then advance one token."""
        self._admit()
        if not bool(jnp.any(self.active)):
            return
        self.caches, nxt = self._step(
            self.caches, self.cur_tok, self.positions, self.active
        )
        self.cur_tok = nxt
        self.positions = jnp.where(
            self.active, self.positions + 1, self.positions
        )
        for slot, req in enumerate(self._slots):
            if req is None:
                continue
            req.generated.append(int(nxt[slot]))
            self._maybe_finish(req)

    def run(self, max_steps: int = 10_000) -> List[Request]:
        """Drive until queue and slots drain; returns finished requests."""
        for _ in range(max_steps):
            if not self._queue and all(s is None for s in self._slots):
                break
            self.step()
        return sorted(self._finished, key=lambda r: r.uid)
