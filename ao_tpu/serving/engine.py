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

from ao_tpu.serving.kvcache import QuantKVCache, init_quant_kv_caches


def _insert_tree(caches, scratch, slot):
    """Scratch (batch=1) prefill caches -> pool slot. QuantKVCache nodes go
    through their layout-aware ``insert_slot`` (the fp8 parity layouts
    translate between parity windows); plain arrays slot in leaf-wise."""

    def insert(pool, new):
        if isinstance(pool, QuantKVCache):
            return pool.insert_slot(new, slot)
        return jax.lax.dynamic_update_slice(
            pool, new.astype(pool.dtype),
            (slot,) + (0,) * (pool.ndim - 1))

    return jax.tree_util.tree_map(
        insert, caches, scratch,
        is_leaf=lambda x: isinstance(x, QuantKVCache))


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    max_batch: int = 8
    max_seq: int = 2048
    kv_quant: Optional[str] = None  # None | "int8" | "float8_e4m3fn" | "int4" (slot or paged)
    eos_id: int = -1  # -1: never stop on a token
    prefill_buckets: Tuple[int, ...] = (128, 512, 2048)
    # KV memory layout: "slots" (per-slot contiguous max_seq caches) or
    # "paged" (page pool + block tables — HBM grows with tokens cached)
    kv_layout: str = "slots"
    page_size: int = 128
    num_pages: Optional[int] = None  # default: max_batch*max_seq/page_size+1
    # automatic prefix caching (paged layout only): requests sharing a
    # page-aligned prompt prefix reuse the cached KV pages
    prefix_cache: bool = False
    # decode steps fused into one device program per step() call (the
    # vLLM multi-step-scheduling analog): k tokens per host round-trip,
    # at the cost of up to k-1 wasted device steps when a request hits
    # eos mid-window and of admission only at window boundaries
    decode_steps_per_call: int = 1
    # speculative decoding: draft this many tokens per step and verify
    # them in ONE multi-token forward — greedy-equivalent, up to draft+1
    # tokens per device call. Drafts come from the host n-gram
    # (prompt-lookup) drafter, or — when Engine(draft_params=, draft_cfg=)
    # is given — from a small draft model in a fused on-device
    # draft+verify program. 0 = off. Requires temperature == 0
    # and is mutually exclusive with decode_steps_per_call > 1. Exactness
    # caveat: in bf16 the multi-token verify program and the single-token
    # step round differently, so near-tie argmaxes can flip (bit-exact in
    # f32; same caveat as every batched-verification server).
    spec_draft: int = 0
    # sampling (0.0 = greedy); one PRNG stream per engine, folded per step
    temperature: float = 0.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    min_p: float = 0.0  # drop tokens with prob < min_p * max prob
    # context penalties (repetition / frequency / presence). Enabling
    # allocates two (max_batch, vocab) device buffers (prompt presence +
    # output counts) threaded through the jitted steps; with the default
    # per-request values the math is an exact identity, so an enabled
    # engine stays token-identical to a disabled one until a request
    # actually sets a penalty.
    penalties: bool = False
    repetition_penalty: float = 1.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    # logprobs: maximum top-N alternatives the jitted steps return (static;
    # per-request N ≤ this). 0 = no logprob outputs. When enabled, every
    # step additionally computes a (B, vocab) log-softmax + top-k — the
    # logprobs are taken from the distribution the picker saw (after
    # penalties, before temperature).
    logprobs: int = 0
    seed: int = 0


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int
    generated: List[int] = dataclasses.field(default_factory=list)
    slot: int = -1
    done: bool = False
    lora_idx: int = 0  # 0 = base model; i+1 = Engine lora adapter i
    # per-request sampling overrides (None → the engine's ServeConfig
    # defaults); a continuous batch freely mixes greedy and sampled slots
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    min_p: Optional[float] = None
    repetition_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    presence_penalty: Optional[float] = None
    # stop sequences (lists of token ids); on match the matched tokens are
    # trimmed from ``generated`` and the request finishes with reason "stop"
    stop: Optional[List[List[int]]] = None
    # OpenAI-style additive logit bias {token_id: bias} (needs
    # ServeConfig(penalties=True); ±1e9 hard-bans/forces tokens)
    logit_bias: Optional[Dict[int, float]] = None
    # logprobs: None = off; N ≥ 0 fills token_logprobs (+ top_logprobs as
    # [(token_id, logprob)] * N per step when N > 0)
    logprobs: Optional[int] = None
    token_logprobs: List[float] = dataclasses.field(default_factory=list)
    top_logprobs: List[List[Tuple[int, float]]] = dataclasses.field(
        default_factory=list)
    # "length" | "stop" (eos or stop sequence) | "cancelled" | None (running)
    finish_reason: Optional[str] = None


class Engine:
    """Host-side request orchestrator around jitted prefill/step programs."""

    def __init__(self, params: Any, model_cfg: Any,
                 cfg: ServeConfig = ServeConfig(),
                 lora_adapters: Optional[Dict[str, Any]] = None,
                 draft_params: Any = None, draft_cfg: Any = None):
        from ao_tpu.models import resolve_model

        self.params = params
        self._lora_names: List[str] = []
        if lora_adapters:
            from ao_tpu.serving.lora import stack_adapters

            self.params, self._lora_names = stack_adapters(
                params, lora_adapters, cfg.max_batch)
        self.model_cfg = model_cfg
        self.model = resolve_model(model_cfg)  # llama, gemma, or registered
        self.cfg = cfg
        b, t = cfg.max_batch, cfg.max_seq
        self.paged = cfg.kv_layout == "paged"
        import numpy as _np

        if self.paged:
            from ao_tpu.serving.paged import PageAllocator, PagedKVPool

            ps = cfg.page_size
            if t % ps or any(pb % ps for pb in cfg.prefill_buckets):
                raise ValueError("max_seq and prefill buckets must be "
                                 f"multiples of page_size={ps}")
            n_pages = cfg.num_pages or (b * t // ps + 1)
            dt = cfg.kv_quant or "bf16"
            self.caches = [
                (
                    PagedKVPool.create(n_pages, ps, model_cfg.n_kv_heads,
                                       model_cfg.head_dim, dt),
                    PagedKVPool.create(n_pages, ps, model_cfg.n_kv_heads,
                                       model_cfg.head_dim, dt),
                )
                for _ in range(model_cfg.n_layers)
            ]
            self.allocator = PageAllocator(n_pages)
            self._table_host = _np.zeros((b, t // ps), _np.int32)
            self.block_table = jnp.asarray(self._table_host)
            self._slot_pages: List[List[int]] = [[] for _ in range(b)]
            # prefix cache: page-aligned token prefix → owned pages + users
            self._prefix_cache: Dict[tuple, dict] = {}
            self._slot_key: List[Optional[tuple]] = [None] * b
        elif cfg.kv_quant:
            self.caches = init_quant_kv_caches(model_cfg, b, t, cfg.kv_quant)
        else:
            self.caches = self.model.init_kv_caches(model_cfg, b, t)

        # small per-slot state lives on the HOST (one device read per step;
        # per-slot device reads through a remote runtime are ruinous)
        self.positions = _np.zeros((b,), _np.int32)  # next write index
        self.cur_tok = _np.zeros((b,), _np.int32)
        self.active = _np.zeros((b,), bool)
        # device-resident mirrors of (cur_tok, positions, active) and the
        # samp/pen argument tuples for the k=1 hot loop; invalidated by
        # _mark_state_dirty() whenever host-side slot state changes
        self._dev_state = None
        self._dev_args = None
        self._slots: List[Optional[Request]] = [None] * b
        self._uid = 0
        self._queue: List[Request] = []
        self._finished: List[Request] = []
        self._rng = jax.random.PRNGKey(cfg.seed)
        self._salt = 0  # host-advanced; folded into every device program's key
        self._step_count = 0
        self._finished_total = 0
        self._tokens_total = 0
        self._prefix_hits = 0
        self._prefills = 0
        self._spec_drafted = 0
        self._spec_accepted = 0
        self._slot_adapter = _np.zeros((b,), _np.int32)
        # per-slot sampling params (data args of the jitted programs, so
        # admitting a request with different settings never recompiles)
        self._slot_temp = _np.full((b,), cfg.temperature, _np.float32)
        self._slot_topk = _np.full((b,), cfg.top_k or 0, _np.int32)
        self._slot_topp = _np.full((b,), cfg.top_p or 1.0, _np.float32)
        self._slot_minp = _np.full((b,), cfg.min_p, _np.float32)
        # context penalties: per-slot params + two device-resident
        # (B, vocab) buffers — prompt presence (set at admit) and output
        # counts (updated inside the jitted steps)
        if not cfg.penalties and (cfg.repetition_penalty != 1.0 or
                                  cfg.frequency_penalty != 0.0 or
                                  cfg.presence_penalty != 0.0):
            raise ValueError("set ServeConfig(penalties=True) to use "
                             "repetition/frequency/presence penalties")
        self._slot_rep = _np.full((b,), cfg.repetition_penalty, _np.float32)
        self._slot_freq = _np.full((b,), cfg.frequency_penalty, _np.float32)
        self._slot_pres = _np.full((b,), cfg.presence_penalty, _np.float32)
        if cfg.penalties:
            v = model_cfg.vocab_size
            self._prompt_pres = jnp.zeros((b, v), jnp.int8)
            self._out_counts = jnp.zeros((b, v), jnp.int32)
            self._logit_bias = jnp.zeros((b, v), jnp.float32)
        if cfg.spec_draft > 0:
            if cfg.temperature != 0.0:
                raise ValueError("speculative decoding is greedy-only")
            if cfg.penalties:
                raise ValueError("speculative decoding does not support "
                                 "context penalties")
            if cfg.logprobs > 0:
                raise ValueError("speculative decoding does not support "
                                 "logprob outputs")
            if cfg.decode_steps_per_call > 1:
                raise ValueError("spec_draft and decode_steps_per_call are "
                                 "mutually exclusive")
            if self.paged or cfg.kv_quant:
                raise ValueError("spec_draft currently requires the slot "
                                 "layout with unquantized KV")

        # model-drafted speculation: a small model drafts spec_draft tokens
        # on device (vs the host n-gram drafter) — one fused draft+verify
        # program per step
        self.draft_model = None
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        if draft_params is not None:
            if cfg.spec_draft <= 0:
                raise ValueError("a draft model needs cfg.spec_draft > 0")
            self.draft_model = resolve_model(draft_cfg)
            self.dcaches = self.draft_model.init_kv_caches(draft_cfg, b, t)

        # params are ARGUMENTS of the jitted programs (a method closing
        # over self.params would bake the whole model into the compiled
        # program as constants)
        if self.paged:
            self._prefill = jax.jit(
                self._prefill_paged_impl, static_argnames=("plen",),
                donate_argnums=(1,),
            )
            self._step = jax.jit(self._step_paged_impl, donate_argnums=(1,))
        else:
            self._prefill = jax.jit(
                self._prefill_impl, static_argnames=("plen",),
                donate_argnums=(1,),
            )
            self._step = jax.jit(self._step_impl, donate_argnums=(1,))
            if self.draft_model is not None:
                self._dprefill = jax.jit(
                    self._dprefill_impl, static_argnames=("plen",),
                    donate_argnums=(1,),
                )
                self._step_spec_model = jax.jit(
                    self._step_spec_model_impl, static_argnames=("k",),
                    donate_argnums=(1, 2),
                )

    # -- jitted programs ----------------------------------------------------

    def _prefill_impl(self, params, caches, prompt, slot, true_len, step,
                      samp, pen=None, *, plen):
        """prompt (1, plen) padded; writes this slot's KV rows and returns
        (caches, first generated token)."""
        mcfg = self.model_cfg
        # single-slot scratch caches for the prefill forward
        if self.cfg.kv_quant:
            scratch = init_quant_kv_caches(mcfg, 1, plen, self.cfg.kv_quant)
        else:
            scratch = self.model.init_kv_caches(mcfg, 1, plen)
        positions = jnp.arange(plen, dtype=jnp.int32)[None]
        logits, scratch = self.model.forward(
            params, prompt, mcfg, positions=positions,
            kv_caches=scratch, cache_index=0, use_flash=True,
        )

        # insert the scratch rows into the slot of the pool (layout-aware:
        # QuantKVCache.insert_slot translates parity-window layouts)
        caches = _insert_tree(caches, scratch, slot)
        next_tok, lpi = self._pick2(logits[0, true_len - 1][None], true_len,
                                    step, samp, pen)
        return caches, next_tok[0], lpi

    def _prefill_paged_impl(self, params, caches, prompt, page_ids, true_len,
                            step, samp, pen=None, *, plen):
        """Prefill via a scratch contiguous cache, then bulk-write the rows
        into this request's pages (quantization happens in write_prompt)."""
        mcfg = self.model_cfg
        scratch = self.model.init_kv_caches(mcfg, 1, plen)
        positions = jnp.arange(plen, dtype=jnp.int32)[None]
        logits, scratch = self.model.forward(
            params, prompt, mcfg, positions=positions,
            kv_caches=scratch, cache_index=0, use_flash=True,
        )
        new_caches = []
        for (kp, vp), (sk, sv) in zip(caches, scratch):
            new_caches.append((
                kp.write_prompt(sk[0], page_ids),
                vp.write_prompt(sv[0], page_ids),
            ))
        next_tok, lpi = self._pick2(logits[0, true_len - 1][None], true_len,
                                    step, samp, pen)
        return new_caches, next_tok[0], lpi

    def _step_paged_impl(self, params, caches, cur_tok, positions, active,
                         block_table, step, samp, pen=None):
        mcfg = self.model_cfg
        logits, new_caches = self.model.forward(
            params, cur_tok[:, None], mcfg, positions=positions[:, None],
            kv_caches=caches, cache_index=(block_table, positions),
        )
        nxt, lpi = self._pick2(logits[:, -1], positions[0], step, samp, pen)
        nxt = jnp.where(active, nxt, cur_tok)
        counts = (None if pen is None
                  else self._count_picked(pen[4], nxt, active))
        return new_caches, nxt, counts, lpi

    def _step_impl(self, params, caches, cur_tok, positions, active, step,
                   samp, pen=None):
        """One decode step for all slots; returns
        (caches, next_tok, new_positions, counts, logprob_info). The new
        positions come back ON DEVICE so the k=1 hot loop can keep
        device-resident state mirrors and skip per-step H2D transfers
        (each one pays tunnel latency — see step())."""
        mcfg = self.model_cfg
        b = self.cfg.max_batch
        pos = positions[:, None]  # (B, 1)
        logits, new_caches = self.model.forward(
            params, cur_tok[:, None], mcfg, positions=pos,
            kv_caches=caches, cache_index=positions,
        )
        nxt, lpi = self._pick2(logits[:, -1], positions[0], step, samp, pen)
        nxt = jnp.where(active, nxt, cur_tok)
        cap = self.cfg.max_seq - 1
        new_pos = jnp.where(active, jnp.minimum(positions + 1, cap),
                            positions)
        counts = (None if pen is None
                  else self._count_picked(pen[4], nxt, active))
        return new_caches, nxt, new_pos, counts, lpi

    def _step_multi_impl(self, params, caches, cur_tok, positions, active,
                         step, samp, pen=None, block_table=None, *, k):
        """k fused decode steps (lax.scan): one device program, k tokens per
        host round-trip. Inactive slots idle; positions clamp at max_seq-1
        so mid-window finishes can't write out of bounds. With penalties
        the output-count buffer rides the scan carry so token i+1 sees
        token i's contribution."""
        mcfg = self.model_cfg
        cap = self.cfg.max_seq - 1

        def body(carry, i):
            caches, tok, pos, counts = carry
            idx = (pos if block_table is None else (block_table, pos))
            logits, caches = self.model.forward(
                params, tok[:, None], mcfg, positions=pos[:, None],
                kv_caches=caches, cache_index=idx,
            )
            p = pen if pen is None else pen[:4] + (counts,) + pen[5:]
            nxt, lpi = self._pick2(logits[:, -1], pos[0], step + i, samp, p)
            nxt = jnp.where(active, nxt, tok)
            if counts is not None:
                counts = self._count_picked(counts, nxt, active)
            pos = jnp.where(active, jnp.minimum(pos + 1, cap), pos)
            return (caches, nxt, pos, counts), (nxt, lpi)

        counts0 = None if pen is None else pen[4]
        (caches, _, _, counts), (toks, lpis) = jax.lax.scan(
            body, (caches, cur_tok, positions, counts0),
            jnp.arange(k, dtype=jnp.int32))
        return caches, toks, counts, lpis  # toks (k, B)

    def _pick(self, logits, salt, step, samp=None, pen=None):
        """Greedy or sampled next-token selection.

        ``step`` is the host-advanced call counter (every device program gets
        a fresh value, so keys never repeat even when slot 0 is idle and
        ``positions[0]`` stalls); ``salt`` adds per-position variety within a
        program. Passed as a traced argument — ``self._rng`` alone would be
        baked into the compiled program as a constant.

        ``samp`` = (temps, top_ks, top_ps, min_ps) per-ROW arrays threads
        the per-request sampling settings through as data (no recompiles);
        ``None`` keeps the engine-global ServeConfig behavior (spec decode
        and other greedy-only paths).

        ``pen`` = (rep, freq, pres, prompt_pres, out_counts) per-ROW
        penalty params + context buffers; applied to the raw logits before
        any selection (greedy rows see penalties too)."""
        if pen is not None:
            from ao_tpu.serving.sampling import apply_penalties

            logits = apply_penalties(logits, *pen)
        if samp is not None:
            from ao_tpu.serving.sampling import sample_logits_batched

            key = jax.random.fold_in(jax.random.fold_in(self._rng, step),
                                     salt)
            return sample_logits_batched(logits, key, *samp)
        if self.cfg.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        from ao_tpu.serving.sampling import sample_logits

        key = jax.random.fold_in(jax.random.fold_in(self._rng, step), salt)
        return sample_logits(logits, key, self.cfg.temperature,
                             self.cfg.top_k, self.cfg.top_p, self.cfg.min_p)

    def _pick2(self, logits, salt, step, samp=None, pen=None):
        """_pick plus logprob outputs when ``cfg.logprobs > 0``: returns
        (tok, None) or (tok, (chosen_logprob, top_vals, top_ids)) —
        logprobs taken from the post-penalty pre-temperature distribution
        (the OpenAI-style "model logprobs" with penalties folded in)."""
        if pen is not None:
            from ao_tpu.serving.sampling import apply_penalties

            logits = apply_penalties(logits, *pen)
        tok = self._pick(logits, salt, step, samp)
        if self.cfg.logprobs <= 0:
            return tok, None
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        chosen = jnp.take_along_axis(lp, tok[:, None], -1)[:, 0]
        tv, ti = jax.lax.top_k(lp, self.cfg.logprobs)
        return tok, (chosen, tv, ti)

    def _samp_args(self, slot=None):
        """(temps, top_ks, top_ps, min_ps) jnp arrays — all slots, or one
        slot's length-1 views for single-row prefill picks."""
        t, k, p, m = (self._slot_temp, self._slot_topk, self._slot_topp,
                      self._slot_minp)
        if slot is not None:
            t, k, p, m = (t[slot:slot + 1], k[slot:slot + 1],
                          p[slot:slot + 1], m[slot:slot + 1])
        return (jnp.asarray(t), jnp.asarray(k), jnp.asarray(p),
                jnp.asarray(m))

    def _pen_args(self, slot=None):
        """(rep, freq, pres, prompt_pres, out_counts, logit_bias) — None
        when the engine runs without context penalties; all slots, or one
        slot's length-1 rows for single-row prefill picks."""
        if not self.cfg.penalties:
            return None
        r, f, p = self._slot_rep, self._slot_freq, self._slot_pres
        pp, oc, lb = self._prompt_pres, self._out_counts, self._logit_bias
        if slot is not None:
            r, f, p = r[slot:slot + 1], f[slot:slot + 1], p[slot:slot + 1]
            pp, oc = pp[slot:slot + 1], oc[slot:slot + 1]
            lb = lb[slot:slot + 1]
        return (jnp.asarray(r), jnp.asarray(f), jnp.asarray(p), pp, oc, lb)

    def _count_picked(self, out_counts, nxt, active):
        """Add the picked tokens of active rows into the output-count
        buffer (inside the jitted step)."""
        b = nxt.shape[0]
        return out_counts.at[jnp.arange(b), nxt].add(
            active.astype(jnp.int32))

    def _next_salt(self, n=1):
        """Advance and return the host-side PRNG salt counter."""
        s = self._salt
        self._salt += n
        return jnp.int32(s)

    def _prefill_chunk_impl(self, params, scratch, chunk_toks, offset, *,
                            chunk):
        """One chunk of a long prefill into a (1, max_seq) scratch cache;
        decode-style masking makes causality hold across chunks."""
        mcfg = self.model_cfg
        positions = offset + jnp.arange(chunk, dtype=jnp.int32)[None]
        logits, scratch = self.model.forward(
            params, chunk_toks, mcfg, positions=positions,
            kv_caches=scratch, cache_index=offset,
        )
        return scratch, logits[0]

    def _insert_scratch_impl(self, caches, scratch, slot):
        return _insert_tree(caches, scratch, slot)

    def _write_pages_impl(self, caches, scratch, page_ids, *, n_rows):
        new_caches = []
        for (kp, vp), (sk, sv) in zip(caches, scratch):
            new_caches.append((
                kp.write_prompt(sk[0, :n_rows], page_ids),
                vp.write_prompt(sv[0, :n_rows], page_ids),
            ))
        return new_caches

    def _prefill_long(self, req, slot, page_ids=None):
        """Chunked prefill for prompts longer than the largest bucket."""
        self._ensure_chunk_fns()
        chunk = max(self.cfg.prefill_buckets)
        t = self.cfg.max_seq
        mcfg = self.model_cfg
        if self.cfg.kv_quant and not self.paged:
            scratch = init_quant_kv_caches(mcfg, 1, t, self.cfg.kv_quant)
        else:
            scratch = self.model.init_kv_caches(mcfg, 1, t)
        n = len(req.prompt)
        padded = req.prompt + [0] * ((-n) % chunk)
        logits = None
        for off in range(0, n, chunk):
            toks = jnp.asarray(padded[off:off + chunk], jnp.int32)[None]
            scratch, logits = self._prefill_chunk(
                self._params_for_prefill(req), scratch, toks,
                jnp.int32(off), chunk=chunk
            )
        last = (n - 1) % chunk
        tok_arr, lpi = self._pick2(logits[last][None], n, self._next_salt(),
                                   self._samp_args(req.slot),
                                   self._pen_args(req.slot))
        if self.paged:
            ps = self.cfg.page_size
            self.caches = self._write_pages(
                self.caches, scratch, jnp.asarray(page_ids, jnp.int32),
                n_rows=len(page_ids) * ps,
            )
        else:
            self.caches = self._insert_scratch(
                self.caches, scratch, jnp.int32(slot)
            )
        return tok_arr[0], lpi

    def _seed_scratch_impl(self, scratch, caches, page_ids, *, n_pages):
        """Copy shared prefix pages from the pools into the hp scratch
        cache (rows 0..n_pages*ps) before prefilling the uncached tail."""
        ps = self.cfg.page_size
        out = []
        for (kp, vp), (sk, sv) in zip(caches, scratch):
            def rows(pool):
                # gather() owns per-dtype dequantization (incl. the int4
                # word-unpack); inlining an astype*scale here corrupted
                # int4 pages (packed words times scales)
                pg = pool.gather(page_ids, jnp.float32)
                return pg.reshape(1, n_pages * ps, *pg.shape[1:])

            sk = jax.lax.dynamic_update_slice(
                sk, rows(kp).astype(sk.dtype), (0, 0, 0, 0))
            sv = jax.lax.dynamic_update_slice(
                sv, rows(vp).astype(sv.dtype), (0, 0, 0, 0))
            out.append((sk, sv))
        return out

    def _alloc_page(self) -> int:
        try:
            return self.allocator.alloc()
        except RuntimeError:
            # evict unused prefix-cache entries and retry
            for key in list(self._prefix_cache):
                if self._prefix_cache[key]["users"] == 0:
                    self.allocator.release(self._prefix_cache[key]["pages"])
                    del self._prefix_cache[key]
            return self.allocator.alloc()

    def _match_prefix(self, prompt: List[int]):
        """Longest cached page-aligned proper prefix of ``prompt``."""
        ps = self.cfg.page_size
        cap = ((len(prompt) - 1) // ps) * ps  # leave ≥1 token to compute
        best = None
        for key in self._prefix_cache:
            if len(key) <= cap and (best is None or len(key) > len(best)) \
                    and list(key) == prompt[:len(key)]:
                best = key
        return best

    def _prefill_paged_shared(self, req, slot, shared_key):
        """Chunked prefill reusing the cached prefix pages."""
        self._ensure_chunk_fns()
        ps = self.cfg.page_size
        entry = self._prefix_cache[shared_key]
        shared_pages = entry["pages"]
        shared_len = len(shared_key)
        n = len(req.prompt)
        n_pg = -(-n // ps)
        own = [self._alloc_page() for _ in range(n_pg - len(shared_pages))]
        row = shared_pages + own
        entry["users"] += 1
        self._slot_key[slot] = shared_key
        self._slot_pages[slot] = own  # request owns only its tail pages
        self._table_host[slot, :] = 0
        self._table_host[slot, :n_pg] = row
        self.block_table = jnp.asarray(self._table_host)

        scratch = self.model.init_kv_caches(self.model_cfg, 1, self.cfg.max_seq)
        if not hasattr(self, "_seed_scratch"):
            self._seed_scratch = jax.jit(
                self._seed_scratch_impl, static_argnames=("n_pages",),
                donate_argnums=(0,),
            )
        scratch = self._seed_scratch(
            scratch, self.caches, jnp.asarray(shared_pages, jnp.int32),
            n_pages=len(shared_pages),
        )
        chunk = max(self.cfg.prefill_buckets)
        padded = req.prompt + [0] * ((-(n - shared_len)) % chunk)
        logits = None
        for off in range(shared_len, n, chunk):
            toks = jnp.asarray(padded[off:off + chunk], jnp.int32)[None]
            scratch, logits = self._prefill_chunk(
                self._params_for_prefill(req), scratch, toks,
                jnp.int32(off), chunk=chunk)
        last = (n - 1 - shared_len) % chunk
        tok_arr, lpi = self._pick2(logits[last][None], n, self._next_salt(),
                                   self._samp_args(req.slot),
                                   self._pen_args(req.slot))
        # write only the tail pages the request owns
        if own:
            self._write_pages_from(scratch, own, start_pg=len(shared_pages))
        return tok_arr[0], lpi

    def _write_pages_from(self, scratch, page_ids, start_pg):
        ps = self.cfg.page_size
        if not hasattr(self, "_write_pages_slice"):
            def impl(caches, scratch, ids, *, start, n_rows):
                out = []
                for (kp, vp), (sk, sv) in zip(caches, scratch):
                    out.append((
                        kp.write_prompt(sk[0, start:start + n_rows], ids),
                        vp.write_prompt(sv[0, start:start + n_rows], ids),
                    ))
                return out

            self._write_pages_slice = jax.jit(
                impl, static_argnames=("start", "n_rows"),
                donate_argnums=(0,),
            )
        self.caches = self._write_pages_slice(
            self.caches, scratch, jnp.asarray(page_ids, jnp.int32),
            start=start_pg * ps, n_rows=len(page_ids) * ps,
        )

    def _register_prefix(self, req, slot):
        """After a no-hit prefill: move this prompt's full pages into the
        cache (the request keeps ownership of the partial tail page)."""
        ps = self.cfg.page_size
        full_pg = len(req.prompt) // ps
        if full_pg < 1:
            return
        key = tuple(req.prompt[:full_pg * ps])
        if key in self._prefix_cache:
            return  # duplicate prompt admitted before: keep own pages
        pages = self._slot_pages[slot][:full_pg]
        self._prefix_cache[key] = {"pages": pages, "users": 1}
        self._slot_key[slot] = key
        self._slot_pages[slot] = self._slot_pages[slot][full_pg:]

    def _ensure_chunk_fns(self):
        if not hasattr(self, "_prefill_chunk"):
            self._prefill_chunk = jax.jit(
                self._prefill_chunk_impl, static_argnames=("chunk",),
                donate_argnums=(1,),
            )
            self._insert_scratch = jax.jit(
                self._insert_scratch_impl, donate_argnums=(0,)
            )
            self._write_pages = jax.jit(
                self._write_pages_impl, static_argnames=("n_rows",),
                donate_argnums=(0,),
            )

    # -- host API -------------------------------------------------------------

    def submit(self, prompt: List[int], max_new_tokens: int = 32,
               lora: Optional[str] = None,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None,
               min_p: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               frequency_penalty: Optional[float] = None,
               presence_penalty: Optional[float] = None,
               stop: Optional[List] = None,
               logprobs: Optional[int] = None,
               logit_bias: Optional[Dict[int, float]] = None) -> int:
        if logprobs is not None and self.cfg.logprobs < max(1, logprobs):
            raise ValueError(
                f"logprobs={logprobs} needs ServeConfig(logprobs="
                f"{max(1, logprobs)}) or more (engine has "
                f"{self.cfg.logprobs})")
        if logit_bias:
            v = self.model_cfg.vocab_size
            if any(not (0 <= int(t) < v) for t in logit_bias):
                raise ValueError(f"logit_bias token ids must be in [0, {v})")
        if not self.cfg.penalties and any(
                x is not None for x in (repetition_penalty,
                                        frequency_penalty,
                                        presence_penalty, logit_bias)):
            raise ValueError("this engine was built without context "
                             "penalties; set ServeConfig(penalties=True)")
        idx = 0
        if lora is not None:
            if lora not in self._lora_names:
                raise ValueError(f"unknown adapter {lora!r}; have "
                                 f"{self._lora_names}")
            idx = self._lora_names.index(lora) + 1
        if temperature and self.cfg.spec_draft > 0:
            raise ValueError("speculative decoding is greedy-only; "
                             "per-request temperature is not supported")
        stop_seqs = None
        if stop:
            # accept one token-id sequence or a list of them
            if all(isinstance(t, int) for t in stop):
                stop = [stop]
            stop_seqs = []
            for s in stop:
                s = list(s)
                if not s or not all(isinstance(t, int) for t in s):
                    raise ValueError("stop must be token-id sequence(s)")
                stop_seqs.append(s)
        req = Request(uid=self._uid, prompt=list(prompt),
                      max_new_tokens=max_new_tokens, lora_idx=idx,
                      temperature=temperature, top_k=top_k, top_p=top_p,
                      min_p=min_p, repetition_penalty=repetition_penalty,
                      frequency_penalty=frequency_penalty,
                      presence_penalty=presence_penalty, stop=stop_seqs,
                      logprobs=logprobs, logit_bias=logit_bias)
        self._uid += 1
        self._queue.append(req)
        return req.uid

    def _params_for_prefill(self, req: Request):
        if not self._lora_names:
            return self.params
        from ao_tpu.serving.lora import set_slot_ids

        return set_slot_ids(self.params, [req.lora_idx])

    def _bind_slot_adapters(self) -> None:
        """Point every MultiLoRAWeight at the current slot→adapter map
        (data-leaf rebind; no recompilation)."""
        if self._lora_names:
            from ao_tpu.serving.lora import set_slot_ids

            self.params = set_slot_ids(self.params, self._slot_adapter)

    def _bucket(self, n: int) -> Optional[int]:
        if n >= self.cfg.max_seq:
            raise ValueError(f"prompt length {n} exceeds max_seq "
                             f"{self.cfg.max_seq}")
        for b in self.cfg.prefill_buckets:
            if n <= b:
                return b
        return None  # longer than every bucket → chunked prefill

    def _admit(self) -> None:
        for slot in range(self.cfg.max_batch):
            if self._slots[slot] is not None or not self._queue:
                continue
            req = self._queue.pop(0)
            req.slot = slot
            self._slot_adapter[slot] = req.lora_idx
            cfg = self.cfg
            self._slot_temp[slot] = (cfg.temperature if req.temperature
                                     is None else req.temperature)
            self._slot_topk[slot] = ((cfg.top_k or 0) if req.top_k is None
                                     else req.top_k)
            self._slot_topp[slot] = ((cfg.top_p or 1.0) if req.top_p is None
                                     else req.top_p)
            self._slot_minp[slot] = (cfg.min_p if req.min_p is None
                                     else req.min_p)
            self._admit_penalties(slot, req)
            if self.paged and self.cfg.prefix_cache:
                hit = self._match_prefix(req.prompt)
                if hit is not None:
                    self._prefix_hits += 1
                    self._prefills += 1
                    tok, lpi = self._prefill_paged_shared(req, slot, hit)
                    req.generated.append(int(tok))
                    self._note_first_tok(slot, int(tok))
                    self._note_logprobs0(req, lpi)
                    self.cur_tok[slot] = int(tok)
                    self.positions[slot] = len(req.prompt)
                    self.active[slot] = True
                    self._mark_state_dirty()
                    self._slots[slot] = req
                    self._maybe_finish(req)
                    continue
            self._prefills += 1
            plen = self._bucket(len(req.prompt))
            if plen is None:
                # chunked long-prompt prefill
                if self.paged:
                    ps = self.cfg.page_size
                    n_pg = -(-len(req.prompt) // ps)
                    ids = [self._alloc_page() for _ in range(n_pg)]
                    self._slot_pages[slot] = ids
                    self._slot_key[slot] = None
                    self._table_host[slot, :] = 0
                    self._table_host[slot, :n_pg] = ids
                    self.block_table = jnp.asarray(self._table_host)
                    tok, lpi = self._prefill_long(req, slot, page_ids=ids)
                    if self.cfg.prefix_cache:
                        self._register_prefix(req, slot)
                else:
                    tok, lpi = self._prefill_long(req, slot)
                if self.draft_model is not None:
                    self._dprefill_long(req, slot)
                req.generated.append(int(tok))
                self._note_first_tok(slot, int(tok))
                self._note_logprobs0(req, lpi)
                self.cur_tok[slot] = int(tok)
                self.positions[slot] = len(req.prompt)
                self.active[slot] = True
                self._mark_state_dirty()
                self._slots[slot] = req
                self._maybe_finish(req)
                continue
            prompt = jnp.asarray(
                req.prompt + [0] * (plen - len(req.prompt)), jnp.int32
            )[None]
            if self.paged:
                ps = self.cfg.page_size
                n_pg = plen // ps
                ids = [self._alloc_page() for _ in range(n_pg)]
                self._slot_pages[slot] = ids
                self._slot_key[slot] = None
                self._table_host[slot, :] = 0
                self._table_host[slot, :n_pg] = ids
                self.block_table = jnp.asarray(self._table_host)
                self.caches, tok, lpi = self._prefill(
                    self._params_for_prefill(req), self.caches, prompt,
                    jnp.asarray(ids, jnp.int32),
                    jnp.int32(len(req.prompt)), self._next_salt(),
                    self._samp_args(slot), self._pen_args(slot), plen=plen,
                )
                if self.cfg.prefix_cache:
                    self._register_prefix(req, slot)
            else:
                self.caches, tok, lpi = self._prefill(
                    self._params_for_prefill(req), self.caches, prompt,
                    jnp.int32(slot), jnp.int32(len(req.prompt)),
                    self._next_salt(), self._samp_args(slot),
                    self._pen_args(slot), plen=plen,
                )
                if self.draft_model is not None:
                    self.dcaches = self._dprefill(
                        self.draft_params, self.dcaches, prompt,
                        jnp.int32(slot), plen=plen,
                    )
            req.generated.append(int(tok))
            self._note_first_tok(slot, int(tok))
            self._note_logprobs0(req, lpi)
            self.cur_tok[slot] = int(tok)
            self.positions[slot] = len(req.prompt)
            self.active[slot] = True
            self._mark_state_dirty()
            self._slots[slot] = req
            self._maybe_finish(req)

    def _note_logprobs0(self, req: Request, lpi) -> None:
        """Record the prefill-picked token's logprob info (row 0)."""
        if lpi is None or req.logprobs is None:
            return
        import numpy as _np

        self._record_logprobs(req, float(_np.asarray(lpi[0])[0]),
                              _np.asarray(lpi[1])[0], _np.asarray(lpi[2])[0])

    def _admit_penalties(self, slot: int, req: Request) -> None:
        """Set the slot's penalty params; seed its prompt-presence row and
        zero its output-count row (clearing the previous occupant's)."""
        cfg = self.cfg
        rep = (cfg.repetition_penalty if req.repetition_penalty is None
               else req.repetition_penalty)
        freq = (cfg.frequency_penalty if req.frequency_penalty is None
                else req.frequency_penalty)
        pres = (cfg.presence_penalty if req.presence_penalty is None
                else req.presence_penalty)
        if not cfg.penalties:
            return
        import numpy as _np

        self._slot_rep[slot] = rep
        self._slot_freq[slot] = freq
        self._slot_pres[slot] = pres
        v = self.model_cfg.vocab_size
        row = (_np.bincount(_np.asarray(req.prompt, _np.int64),
                            minlength=v)[:v] > 0).astype(_np.int8)
        self._prompt_pres = self._prompt_pres.at[slot].set(jnp.asarray(row))
        self._out_counts = self._out_counts.at[slot].set(0)
        brow = _np.zeros((v,), _np.float32)
        for t, bval in (req.logit_bias or {}).items():
            brow[int(t)] = float(bval)
        self._logit_bias = self._logit_bias.at[slot].set(jnp.asarray(brow))

    def _note_first_tok(self, slot: int, tok: int) -> None:
        """Count the prefill-picked token into the output-count buffer."""
        if self.cfg.penalties:
            self._out_counts = self._out_counts.at[slot, tok].add(1)

    def _record_logprobs(self, req: Request, chosen: float, tv, ti) -> None:
        req.token_logprobs.append(chosen)
        n = req.logprobs or 0
        if n > 0:
            req.top_logprobs.append(
                [(int(t), float(v)) for t, v in zip(ti[:n], tv[:n])])


    def _mark_state_dirty(self) -> None:
        """Invalidate the k=1 hot loop's device-resident state mirrors
        (call after any host-side mutation of slot state)."""
        self._dev_state = None
        self._dev_args = None

    def _maybe_finish(self, req: Request) -> None:
        g = req.generated
        if g and g[-1] == self.cfg.eos_id:
            self._finish(req, "stop")
            return
        if req.stop:
            for s in req.stop:
                if len(g) >= len(s) and g[-len(s):] == s:
                    # trim the stop sequence from the visible output
                    # (logprob records trim with it)
                    del g[-len(s):]
                    del req.token_logprobs[len(g):]
                    del req.top_logprobs[len(g):]
                    self._finish(req, "stop")
                    return
        full = int(self.positions[req.slot]) + 1 >= self.cfg.max_seq
        if len(g) >= req.max_new_tokens or full:
            self._finish(req, "length")

    def _finish(self, req: Request, reason: str = "length") -> None:
        req.finish_reason = req.finish_reason or reason
        req.done = True
        self._finished_total += 1
        self._tokens_total += len(req.generated)
        self.active[req.slot] = False
        self._mark_state_dirty()
        self._slots[req.slot] = None
        self._finished.append(req)
        if self.paged:
            self.allocator.release(self._slot_pages[req.slot])
            self._slot_pages[req.slot] = []
            key = self._slot_key[req.slot]
            if key is not None and key in self._prefix_cache:
                self._prefix_cache[key]["users"] -= 1
            self._slot_key[req.slot] = None

    def cancel(self, uid: int) -> bool:
        """Abort a request: drop it from the queue, or free its slot and
        pages if in flight (it lands in the next run()'s results with
        whatever tokens it had). Returns False if the uid is unknown or
        already finished."""
        for i, req in enumerate(self._queue):
            if req.uid == uid:
                self._queue.pop(i)
                req.done = True
                req.finish_reason = "cancelled"
                self._finished.append(req)
                return True
        for req in self._slots:
            if req is not None and req.uid == uid:
                self._finish(req, "cancelled")
                return True
        return False

    def _grow_pages(self, horizon: int) -> None:
        """Allocate pages so every active slot can write ``horizon`` more
        tokens starting at its current position."""
        ps = self.cfg.page_size
        dirty = False
        for slot, req in enumerate(self._slots):
            if req is None:
                continue
            pos = int(self.positions[slot])  # host state, no sync
            last = min(pos + horizon - 1, self.cfg.max_seq - 1)
            key = self._slot_key[slot]
            n_shared = (len(self._prefix_cache[key]["pages"])
                        if key is not None and key in self._prefix_cache
                        else 0)
            while n_shared + len(self._slot_pages[slot]) <= last // ps:
                pid = self._alloc_page()
                pg = n_shared + len(self._slot_pages[slot])
                self._slot_pages[slot].append(pid)
                self._table_host[slot, pg] = pid
                dirty = True
        if dirty:
            self.block_table = jnp.asarray(self._table_host)

    def step(self) -> None:
        """Admit queued requests into free slots, then advance every active
        slot by ``decode_steps_per_call`` tokens (one device program)."""
        import numpy as _np

        self._admit()
        self._step_count += 1
        if not self.active.any():
            return
        self._bind_slot_adapters()
        if self.cfg.spec_draft > 0:
            self._step_spec()
            return
        k = max(1, self.cfg.decode_steps_per_call)
        if self.paged:
            self._grow_pages(k)
        if k == 1:
            if self.paged:
                args = (self.params, self.caches, jnp.asarray(self.cur_tok),
                        jnp.asarray(self.positions), jnp.asarray(self.active),
                        self.block_table, self._next_salt(),
                        self._samp_args(), self._pen_args())
                self.caches, nxt, counts, lpis = self._step(*args)
            else:
                # device-resident state mirrors: cur_tok/positions come
                # back from the step itself and samp/pen args only change
                # on admission/finish, so the steady-state hot loop does
                # ONE H2D-free dispatch + one D2H token read — each extra
                # transfer pays tunnel latency (slots_bf16kv measured 401
                # tok/s at k=1 vs 1134 for the raw loop, VERDICT r4 #8)
                if self._dev_state is None:
                    self._dev_state = (jnp.asarray(self.cur_tok),
                                       jnp.asarray(self.positions),
                                       jnp.asarray(self.active))
                    self._dev_args = (self._samp_args(), self._pen_args())
                cur_d, pos_d, act_d = self._dev_state
                samp_d, pen_d = self._dev_args
                if pen_d is not None:
                    # the output-count buffer advances on device each step
                    pen_d = pen_d[:4] + (self._out_counts,) + pen_d[5:]
                self.caches, nxt, new_pos, counts, lpis = self._step(
                    self.params, self.caches, cur_d, pos_d, act_d,
                    self._next_salt(), samp_d, pen_d)
                self._dev_state = (nxt, new_pos, act_d)
            toks_host = _np.asarray(nxt)[None]  # (1, B); ONE device read
            if lpis is not None:
                lpis = jax.tree_util.tree_map(lambda a: a[None], lpis)
        else:
            if not hasattr(self, "_step_multi"):
                self._step_multi = jax.jit(
                    self._step_multi_impl, static_argnames=("k",),
                    donate_argnums=(1,),
                )
            self.caches, toks, counts, lpis = self._step_multi(
                self.params, self.caches, jnp.asarray(self.cur_tok),
                jnp.asarray(self.positions), jnp.asarray(self.active),
                self._next_salt(k), self._samp_args(), self._pen_args(),
                self.block_table if self.paged else None, k=k,
            )
            toks_host = _np.asarray(toks)  # (k, B); ONE device read
        if counts is not None:
            self._out_counts = counts
        lp_host = None
        if lpis is not None:
            lp_host = tuple(_np.asarray(a) for a in lpis)  # (k,B) (k,B,N)x2
        for slot, req in enumerate(list(self._slots)):
            if req is None:
                continue
            for i in range(toks_host.shape[0]):
                tok = int(toks_host[i, slot])
                self.cur_tok[slot] = tok
                self.positions[slot] += 1
                req.generated.append(tok)
                if lp_host is not None and req.logprobs is not None:
                    self._record_logprobs(
                        req, float(lp_host[0][i, slot]),
                        lp_host[1][i, slot], lp_host[2][i, slot])
                self._maybe_finish(req)
                if req.done:
                    break

    def _step_spec_impl(self, params, caches, toks, positions, active,
                        block_table=None, *, k):
        """Speculative verify: ONE forward over the k+1-token window
        [cur_tok, draft...] per slot; returns greedy predictions at every
        window position. KV rows for the whole window are written — rows
        past the accepted prefix are garbage at positions the causal mask
        hides until they are overwritten."""
        mcfg = self.model_cfg
        cap = self.cfg.max_seq - 1
        b = toks.shape[0]
        offs = jnp.arange(k + 1, dtype=jnp.int32)[None]
        pos = jnp.minimum(positions[:, None] + offs, cap)  # (B, k+1)
        idx = (positions if block_table is None
               else (block_table, positions))
        logits, caches = self.model.forward(
            params, toks, mcfg, positions=pos, kv_caches=caches,
            cache_index=idx,
        )
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)
        return caches, preds

    def _dprefill_impl(self, dparams, dcaches, prompt, slot, *, plen):
        """Draft-model prefill of one slot (KV rows only; logits unused)."""
        dcfg = self.draft_cfg
        scratch = self.draft_model.init_kv_caches(dcfg, 1, plen)
        positions = jnp.arange(plen, dtype=jnp.int32)[None]
        _, scratch = self.draft_model.forward(
            dparams, prompt, dcfg, positions=positions, kv_caches=scratch,
            cache_index=0, use_flash=True,
        )
        return self._insert_scratch_impl(dcaches, scratch, slot)

    def _dprefill_chunk_impl(self, dparams, scratch, chunk_toks, offset, *,
                             chunk):
        dcfg = self.draft_cfg
        positions = offset + jnp.arange(chunk, dtype=jnp.int32)[None]
        _, scratch = self.draft_model.forward(
            dparams, chunk_toks, dcfg, positions=positions,
            kv_caches=scratch, cache_index=offset,
        )
        return scratch

    def _dprefill_long(self, req, slot):
        """Chunked draft prefill mirroring ``_prefill_long``."""
        self._ensure_chunk_fns()
        chunk = max(self.cfg.prefill_buckets)
        scratch = self.draft_model.init_kv_caches(
            self.draft_cfg, 1, self.cfg.max_seq)
        if not hasattr(self, "_dprefill_chunk"):
            self._dprefill_chunk = jax.jit(
                self._dprefill_chunk_impl, static_argnames=("chunk",),
                donate_argnums=(1,),
            )
        n = len(req.prompt)
        padded = req.prompt + [0] * ((-n) % chunk)
        for off in range(0, n, chunk):
            toks = jnp.asarray(padded[off:off + chunk], jnp.int32)[None]
            scratch = self._dprefill_chunk(
                self.draft_params, scratch, toks, jnp.int32(off), chunk=chunk)
        self.dcaches = self._insert_scratch(
            self.dcaches, scratch, jnp.int32(slot))

    def _step_spec_model_impl(self, params, caches, dcaches, dparams,
                              cur_tok, positions, active, *, k):
        """Fused draft(k)+verify, ONE device program: the draft chain
        re-feeds cur_tok at pos (repairing the draft-cache row left wrong
        by the previous rejection), drafts k greedy tokens, writes the
        last draft's KV row, then the target verifies the whole window.
        Stale-row argument as in serving.decode.generate_speculative."""
        mcfg, dcfg = self.model_cfg, self.draft_cfg
        cap = self.cfg.max_seq - 1
        pos = positions
        toks = [cur_tok]
        t = cur_tok
        dc = dcaches
        for j in range(k):
            pj = jnp.minimum(pos + j, cap)
            lg, dc = self.draft_model.forward(
                dparams, t[:, None], dcfg, positions=pj[:, None],
                kv_caches=dc, cache_index=pj,
            )
            t = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
            toks.append(t)
        pk = jnp.minimum(pos + k, cap)
        _, dc = self.draft_model.forward(
            dparams, t[:, None], dcfg, positions=pk[:, None],
            kv_caches=dc, cache_index=pk,
        )
        window = jnp.stack(toks, axis=1)  # (B, k+1)
        wpos = jnp.minimum(pos[:, None] + jnp.arange(k + 1)[None], cap)
        logits, caches = self.model.forward(
            params, window, mcfg, positions=wpos, kv_caches=caches,
            cache_index=pos,
        )
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return caches, dc, window, preds

    def _draft_ngram(self, req, k: int) -> List[int]:
        """Prompt-lookup drafting: continue from the most recent earlier
        occurrence of the context's final bigram; fall back to repeating
        the last token. (Pure host work — no model involved.)"""
        ctx = req.prompt + req.generated
        if len(ctx) >= 3:
            tail = ctx[-2:]
            for i in range(len(ctx) - 3, -1, -1):
                if ctx[i:i + 2] == tail:
                    cont = ctx[i + 2:i + 2 + k]
                    if cont:
                        return (cont + [ctx[-1]] * k)[:k]
        return [ctx[-1]] * k

    def _step_spec(self) -> None:
        """One speculative step: host-draft k tokens per active slot,
        verify in one device program, accept the longest matching prefix
        (+1 free token from the verify logits)."""
        import numpy as _np

        k = self.cfg.spec_draft
        if self.draft_model is not None:
            # device-drafted: fused draft-chain + verify program
            self.caches, self.dcaches, window, preds = self._step_spec_model(
                self.params, self.caches, self.dcaches, self.draft_params,
                jnp.asarray(self.cur_tok), jnp.asarray(self.positions),
                jnp.asarray(self.active), k=k,
            )
            drafts = _np.asarray(window)[:, 1:]
            preds_host = _np.asarray(preds)  # (B, k+1)
        else:
            drafts = _np.zeros((self.cfg.max_batch, k), _np.int32)
            for slot, req in enumerate(self._slots):
                if req is not None:
                    drafts[slot] = self._draft_ngram(req, k)
            toks = _np.concatenate([self.cur_tok[:, None], drafts], axis=1)
            if not hasattr(self, "_step_spec_jit"):
                self._step_spec_jit = jax.jit(
                    self._step_spec_impl, static_argnames=("k",),
                    donate_argnums=(1,),
                )
            self.caches, preds = self._step_spec_jit(
                self.params, self.caches, jnp.asarray(toks),
                jnp.asarray(self.positions), jnp.asarray(self.active),
                self.block_table if self.paged else None, k=k,
            )
            preds_host = _np.asarray(preds)  # (B, k+1); ONE device read
        for slot, req in enumerate(list(self._slots)):
            if req is None:
                continue
            # accept draft[j] while it matches the model's prediction
            acc = 0
            while acc < k and drafts[slot, acc] == preds_host[slot, acc]:
                acc += 1
            self._spec_drafted += k
            self._spec_accepted += acc
            for i in range(acc + 1):
                tok = int(preds_host[slot, i])
                self.cur_tok[slot] = tok
                self.positions[slot] += 1
                req.generated.append(tok)
                self._maybe_finish(req)
                if req.done:
                    break

    def stats(self) -> Dict[str, Any]:
        """Serving counters (host-side, no device sync): request/token
        totals, slot occupancy, and — for paged layouts — page-pool and
        prefix-cache utilization. (ref analog: the vLLM metrics the
        reference's serving docs report against.)"""
        d: Dict[str, Any] = {
            "steps": self._step_count,
            "prefills": self._prefills,
            "finished_requests": self._finished_total,
            "generated_tokens": self._tokens_total,
            "active_slots": int(self.active.sum()),
            "queued_requests": len(self._queue),
        }
        if self.cfg.spec_draft > 0:
            d["spec_drafted"] = self._spec_drafted
            d["spec_accepted"] = self._spec_accepted
            d["spec_accept_rate"] = round(
                self._spec_accepted / max(1, self._spec_drafted), 3)
        if self.paged:
            n_pages = self.caches[0][0].pages.shape[0]
            cached = sum(len(e["pages"]) for e in self._prefix_cache.values())
            d.update({
                "pages_total": n_pages - 1,  # page 0 reserved
                "pages_free": len(self.allocator.free),
                "pages_cached_prefix": cached,
                "prefix_cache_entries": len(self._prefix_cache),
                "prefix_cache_hits": self._prefix_hits,
            })
        return d

    def run(self, max_steps: int = 10_000) -> List[Request]:
        """Drive until queue and slots drain; returns the requests that
        finished during THIS call (drained — a later run() call returns
        only its own completions)."""
        for _ in range(max_steps):
            if not self._queue and all(s is None for s in self._slots):
                break
            self.step()
        out = sorted(self._finished, key=lambda r: r.uid)
        self._finished = []
        return out
