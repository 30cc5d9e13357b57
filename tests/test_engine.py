"""Continuous-batching engine tests: parity with the one-shot generate loop,
slot reuse, quantized KV pool, eos handling.

(ref analog: the vLLM-integration behavior contract — batched serving must
reproduce single-request greedy decoding exactly.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ao_tpu.models import llama
from ao_tpu.serving.decode import generate
from ao_tpu.serving.engine import Engine, ServeConfig


def _model(sdpa="bf16"):
    cfg = llama.LlamaConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def _ref_generate(params, cfg, prompt, steps):
    toks = generate(
        params, jnp.asarray(prompt, jnp.int32)[None], cfg, steps, max_seq=64
    )
    return [int(t) for t in np.asarray(toks)[0]]


class TestEngine:
    def test_single_request_matches_generate(self):
        params, cfg = _model()
        prompt = [3, 17, 42, 9]
        ref = _ref_generate(params, cfg, prompt, 8)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=4, max_seq=64, prefill_buckets=(8,)))
        eng.submit(prompt, max_new_tokens=8)
        done = eng.run()
        assert len(done) == 1
        assert done[0].generated == ref

    def test_staggered_requests_match_individual(self):
        params, cfg = _model()
        prompts = [[1, 2, 3], [7, 8], [10, 11, 12, 13], [99], [5, 6, 7]]
        refs = [_ref_generate(params, cfg, p, 6) for p in prompts]

        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)))
        # submit two now, the rest mid-flight (forces slot reuse)
        eng.submit(prompts[0], 6)
        eng.submit(prompts[1], 6)
        eng.step()
        eng.step()
        for p in prompts[2:]:
            eng.submit(p, 6)
        done = eng.run()
        assert len(done) == len(prompts)
        for req, ref in zip(done, refs):
            assert req.generated == ref, (req.uid, req.generated, ref)

    def test_int4_kv_pool(self):
        """int4 word-packed slot caches run the engine end to end (the
        numeric contract for int4 KV lives in test_serving/test_pallas_*;
        random-init greedy trajectories diverge at 4-bit KV noise)."""
        params, cfg = _model()
        prompt = [3, 17, 42, 9]
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, kv_quant="int4", prefill_buckets=(8,)))
        eng.submit(prompt, 6)
        done = eng.run()
        assert len(done[0].generated) == 6
        assert all(0 <= t < cfg.vocab_size for t in done[0].generated)

    def test_tp_sharded_params_match_unsharded(self):
        """Serving with TENSOR-PARALLEL sharded params on a 2-way mesh must
        reproduce the unsharded engine's tokens exactly — the quantized
        leaves shard over the tp axis and XLA inserts the collectives."""
        from ao_tpu.parallel.sharding import make_mesh, shard_params

        params, cfg = _model()
        prompt = [3, 17, 42, 9]
        ref = _ref_generate(params, cfg, prompt, 8)

        mesh = make_mesh((1, 2), ("dp", "tp"))
        with mesh:
            sharded = shard_params(params, mesh)
            eng = Engine(sharded, cfg, ServeConfig(
                max_batch=2, max_seq=64, prefill_buckets=(8,)))
            eng.submit(prompt, max_new_tokens=8)
            done = eng.run()
        assert done[0].generated == ref

    def test_quantized_kv_pool(self):
        params, cfg = _model()
        prompt = [3, 17, 42, 9]
        ref = _ref_generate(params, cfg, prompt, 6)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, kv_quant="int8", prefill_buckets=(8,)))
        eng.submit(prompt, 6)
        done = eng.run()
        # int8 KV perturbs logits: require agreement on the first tokens
        assert done[0].generated[:2] == ref[:2]
        assert len(done[0].generated) == 6

    def test_eos_stops_early(self):
        params, cfg = _model()
        prompt = [3, 17, 42, 9]
        ref = _ref_generate(params, cfg, prompt, 8)
        eos = ref[2]
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, eos_id=eos, prefill_buckets=(8,)))
        eng.submit(prompt, 8)
        done = eng.run()
        assert done[0].generated == ref[:3]

    def test_prompt_beyond_max_seq_raises(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)))
        eng.submit(list(range(100)), 4)
        with pytest.raises(ValueError, match="max_seq"):
            eng.step()


class TestPagedEngine:
    def test_paged_matches_slot_engine(self):
        """Paged and slot layouts must produce identical greedy tokens."""
        params, cfg = _model()
        prompts = [[1, 2, 3], [7, 8], [10, 11, 12, 13], [99]]
        slot_eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)))
        paged_eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,),
            kv_layout="paged", page_size=8))
        for p in prompts:
            slot_eng.submit(p, 6)
            paged_eng.submit(p, 6)
        a = slot_eng.run()
        b = paged_eng.run()
        for ra, rb in zip(a, b):
            assert ra.generated == rb.generated, (ra.uid, ra.generated,
                                                  rb.generated)

    def test_paged_quantized_pool(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,),
            kv_layout="paged", page_size=8, kv_quant="int8"))
        eng.submit([3, 17, 42, 9], 6)
        done = eng.run()
        assert len(done[0].generated) == 6

    def test_paged_int4_pool(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,),
            kv_layout="paged", page_size=8, kv_quant="int4"))
        eng.submit([3, 17, 42, 9], 6)
        done = eng.run()
        assert len(done[0].generated) == 6
        assert all(0 <= t < cfg.vocab_size for t in done[0].generated)

    def test_pages_released_and_reused(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=32, prefill_buckets=(8,),
            kv_layout="paged", page_size=8, num_pages=6))
        # 5 sequential requests through a 5-free-page pool: requires reuse
        for i in range(5):
            eng.submit([i + 1, i + 2], 4)
        done = eng.run()
        assert len(done) == 5
        assert all(len(r.generated) == 4 for r in done)

    def test_pool_exhaustion_raises(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=32, prefill_buckets=(16,),
            kv_layout="paged", page_size=8, num_pages=3))
        eng.submit([1, 2, 3], 4)  # needs 2 pages of the 2 free
        eng.submit([4, 5, 6], 4)
        with pytest.raises(RuntimeError, match="exhausted"):
            eng.run()


class TestEngineSampling:
    def test_sampled_engine_runs_and_differs_by_seed(self):
        params, cfg = _model()
        outs = []
        for seed in (0, 1):
            eng = Engine(params, cfg, ServeConfig(
                max_batch=2, max_seq=64, prefill_buckets=(8,),
                temperature=1.0, top_k=16, seed=seed))
            eng.submit([3, 17, 42, 9], 8)
            outs.append(eng.run()[0].generated)
        assert len(outs[0]) == len(outs[1]) == 8
        assert outs[0] != outs[1]


class TestChunkedPrefill:
    def test_long_prompt_matches_generate(self):
        """Prompt longer than every bucket → chunked prefill, same tokens."""
        params, cfg = _model()
        prompt = list(range(1, 21))  # 20 tokens, buckets max out at 8
        ref = _ref_generate(params, cfg, prompt, 5)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)))
        eng.submit(prompt, 5)
        done = eng.run()
        assert done[0].generated == ref

    def test_long_prompt_paged(self):
        params, cfg = _model()
        prompt = list(range(1, 21))
        ref = _ref_generate(params, cfg, prompt, 5)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,),
            kv_layout="paged", page_size=8))
        eng.submit(prompt, 5)
        done = eng.run()
        assert done[0].generated == ref

    def test_over_max_seq_rejected(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=32, prefill_buckets=(8,)))
        eng.submit(list(range(40)), 2)
        with pytest.raises(ValueError, match="max_seq"):
            eng.step()


class TestPrefixCache:
    def _engines(self, **kw):
        params, cfg = _model()
        base = dict(max_batch=2, max_seq=64, prefill_buckets=(8,),
                    kv_layout="paged", page_size=8)
        base.update(kw)
        return params, cfg, Engine(params, cfg, ServeConfig(**base))

    def test_cached_prefix_same_tokens(self):
        """Second request with a shared prefix reuses pages and produces
        exactly the tokens the uncached engine produces."""
        params, cfg, eng = self._engines(prefix_cache=True)
        sys_prompt = list(range(1, 17))  # 16 tokens = 2 full pages
        p1 = sys_prompt + [50, 51]
        p2 = sys_prompt + [70, 71, 72]
        refs = [_ref_generate(params, cfg, p, 5) for p in (p1, p2)]

        eng.submit(p1, 5)
        done1 = eng.run()
        assert done1[0].generated == refs[0]
        free_before = len(eng.allocator.free)
        eng.submit(p2, 5)
        done2 = eng.run()
        assert done2[0].generated == refs[1]
        # the 2 prefix pages were reused: only tail pages newly allocated
        assert len(eng._prefix_cache) >= 1
        hit_key = tuple(sys_prompt)
        assert hit_key in eng._prefix_cache

    def test_cached_prefix_quantized_pools(self):
        """Prefix hits on QUANTIZED pools must seed the scratch cache via
        proper dequantization — regression for the int4 packed-words-times
        -scales bug (a prefix hit generated different tokens than a cold
        run of the same prompt)."""
        for kvq in ("int8", "int4"):
            params, cfg, eng = self._engines(prefix_cache=True, kv_quant=kvq)
            sys_prompt = list(range(1, 17))  # 2 full pages
            p2 = sys_prompt + [70, 71, 72]
            eng.submit(sys_prompt + [50, 51], 5)
            eng.run()  # populates the prefix cache
            eng.submit(p2, 5)
            hit = eng.run()[0].generated
            cold = Engine(params, cfg, ServeConfig(
                max_batch=2, max_seq=64, prefill_buckets=(8,),
                kv_layout="paged", page_size=8, kv_quant=kvq))
            cold.submit(p2, 5)
            want = cold.run()[0].generated
            assert hit == want, (kvq, hit, want)

    def test_page_savings(self):
        """With caching, a repeated long prefix allocates fewer new pages."""
        params, cfg, eng = self._engines(prefix_cache=True, num_pages=32)
        prompt = list(range(1, 25))  # 24 tokens = 3 pages
        eng.submit(prompt + [90], 3)
        eng.run()
        free_after_first = len(eng.allocator.free)
        eng.submit(prompt + [91], 3)
        eng.run()
        free_after_second = len(eng.allocator.free)
        # second run borrowed the 3 cached pages; net new allocations are
        # only the tail page(s), all released at finish
        assert free_after_second >= free_after_first - 1

    def test_eviction_under_pressure(self):
        params, cfg, eng = self._engines(prefix_cache=True, num_pages=7)
        # fill the cache with one 2-page prefix (+1 tail), then demand more
        eng.submit(list(range(1, 18)), 2)   # 17 toks → 3 pages, 2 cached
        eng.run()
        assert len(eng._prefix_cache) == 1
        # a different prompt needing 3 pages: pool has 6 usable minus 2
        # cached → must evict the unused cache entry to satisfy
        eng.submit(list(range(40, 57)), 2)
        done = eng.run()
        assert len(done) == 1 and len(done[0].generated) == 2

    def test_off_by_default(self):
        params, cfg, eng = self._engines()
        eng.submit(list(range(1, 17)) + [5], 2)
        eng.run()
        assert not hasattr(eng, "_x") and eng._prefix_cache == {}


class TestMultiStepDecode:
    def test_multistep_matches_single(self):
        """k fused decode steps per call must reproduce single-step tokens,
        including eos truncation mid-window."""
        params, cfg = _model()
        prompts = [[1, 2, 3], [7, 8], [10, 11, 12, 13], [99]]
        base = dict(max_batch=2, max_seq=64, prefill_buckets=(8,))
        ref_eng = Engine(params, cfg, ServeConfig(**base))
        for p in prompts:
            ref_eng.submit(p, 7)
        refs = {r.uid: r.generated for r in ref_eng.run()}

        for k in (2, 4):
            eng = Engine(params, cfg, ServeConfig(
                **base, decode_steps_per_call=k))
            for p in prompts:
                eng.submit(p, 7)
            for r in eng.run():
                assert r.generated == refs[r.uid], (k, r.uid)

    def test_multistep_paged_with_eos(self):
        params, cfg = _model()
        prompt = [3, 17, 42, 9]
        ref = _ref_generate(params, cfg, prompt, 8)
        eos = ref[4]  # finishes mid-window for k=3
        base = dict(max_batch=2, max_seq=64, prefill_buckets=(8,),
                    kv_layout="paged", page_size=8, eos_id=eos)
        eng = Engine(params, cfg, ServeConfig(
            **base, decode_steps_per_call=3))
        eng.submit(prompt, 8)
        done = eng.run()
        assert done[0].generated == ref[:5]
        # pages released after the mid-window finish
        assert eng._slot_pages[0] == []


class TestEngineStats:
    def test_stats_counters(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,),
            kv_layout="paged", page_size=8, prefix_cache=True))
        sysp = list(range(1, 17))
        eng.submit(sysp + [50], 3)
        eng.run()
        eng.submit(sysp + [60], 3)
        eng.run()
        s = eng.stats()
        assert s["finished_requests"] == 2
        assert s["generated_tokens"] == 6
        assert s["prefills"] == 2
        assert s["prefix_cache_hits"] == 1
        assert s["prefix_cache_entries"] == 1
        assert s["pages_free"] + s["pages_cached_prefix"] == s["pages_total"]
        assert s["active_slots"] == 0 and s["queued_requests"] == 0


class TestMoEServing:
    def test_moe_llama_engine_matches_generate(self):
        """Mixtral-style routed-FFN llama through the serving engine."""
        cfg = llama.LlamaConfig(
            vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=96, tie_embeddings=True, dtype=jnp.float32,
            n_experts=4, top_k_experts=2)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 6)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,),
            decode_steps_per_call=3))
        eng.submit([3, 17, 42, 9], 6)
        assert eng.run()[0].generated == ref


class TestEngineFuzz:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_traffic_matches_reference(self, seed):
        """Random request patterns through random engine configs must
        reproduce per-request one-shot greedy decoding exactly."""
        import random

        rng = random.Random(seed)
        params, cfg = _model()
        kw = dict(max_batch=rng.choice([1, 2, 3]), max_seq=64,
                  prefill_buckets=(8,),
                  decode_steps_per_call=rng.choice([1, 2, 4]))
        if rng.random() < 0.5:
            kw.update(kv_layout="paged", page_size=8,
                      prefix_cache=rng.random() < 0.5)
        eng = Engine(params, cfg, ServeConfig(**kw))

        prompts, refs = [], []
        for i in range(rng.randrange(3, 7)):
            p = [rng.randrange(1, cfg.vocab_size) for _ in
                 range(rng.randrange(1, 12))]
            n = rng.randrange(1, 6)
            prompts.append((p, n))
            refs.append(_ref_generate(params, cfg, p, n))

        # submit in bursts with interleaved steps
        it = iter(prompts)
        outs = {}
        for p, n in prompts:
            eng.submit(p, n)
            if rng.random() < 0.4:
                eng.step()
        for r in eng.run():
            outs[r.uid] = r.generated
        for uid, (p, n) in enumerate(prompts):
            assert outs[uid] == refs[uid], (kw, uid)


class TestCancel:
    def test_cancel_queued_and_inflight(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,),
            kv_layout="paged", page_size=8))
        u1 = eng.submit([1, 2, 3], 10)
        u2 = eng.submit([4, 5, 6], 10)   # queued behind u1 (1 slot)
        eng.step()  # u1 in flight with 1+1 tokens
        assert eng.cancel(u2) is True    # queued → dropped
        assert eng.cancel(u1) is True    # in flight → slot + pages freed
        assert eng.cancel(99) is False
        done = eng.run()
        uids = {r.uid: r for r in done}
        assert set(uids) == {u1, u2}
        assert uids[u2].generated == []
        assert 1 <= len(uids[u1].generated) < 10
        assert eng._slot_pages[0] == []
        # engine still serves after cancellation
        u3 = eng.submit([7, 8], 3)
        assert len(eng.run()[0].generated) == 3


class TestSpeculativeDecoding:
    def test_spec_matches_plain_greedy(self):
        """Prompt-lookup speculation must be token-exact vs plain greedy,
        on both repetitive (high accept) and random (low accept) prompts."""
        params, cfg = _model()
        prompts = [
            [5, 9, 5, 9, 5, 9, 5],        # periodic: drafts should accept
            [3, 17, 42, 9],               # arbitrary
            [7, 7, 7, 7, 7],              # constant
        ]
        refs = [_ref_generate(params, cfg, p, 10) for p in prompts]
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,), spec_draft=4))
        for p in prompts:
            eng.submit(p, 10)
        outs = {r.uid: r.generated for r in eng.run()}
        for uid, ref in enumerate(refs):
            assert outs[uid] == ref, (uid, outs[uid], ref)
        s = eng.stats()
        assert s["spec_drafted"] > 0
        assert 0.0 <= s["spec_accept_rate"] <= 1.0

    def test_spec_accepts_on_repetitive_text(self):
        """A model generating a loop must accept most drafts (fewer device
        steps than tokens)."""
        params, cfg = _model()
        prompt = [5, 9, 5, 9, 5, 9, 5]
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), spec_draft=4))
        eng.submit(prompt, 12)
        out = eng.run()[0]
        assert len(out.generated) == 12
        s = eng.stats()
        # generated 12 tokens; if nothing accepted it would take 12 steps
        assert s["steps"] < 12 or s["spec_accepted"] > 0

    def test_model_draft_matches_plain_greedy(self):
        """Model-drafted speculation (fused on-device draft+verify) must be
        token-exact vs plain greedy decoding, any draft quality."""
        params, cfg = _model()
        dcfg = llama.LlamaConfig(
            vocab_size=128, dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
            ffn_dim=64, tie_embeddings=True, dtype=jnp.float32,
        )
        dparams = llama.init_params(jax.random.PRNGKey(3), dcfg)
        prompts = [[5, 9, 5, 9, 5], [3, 17, 42, 9]]
        refs = [_ref_generate(params, cfg, p, 10) for p in prompts]
        eng = Engine(
            params, cfg,
            ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(8,),
                        spec_draft=3),
            draft_params=dparams, draft_cfg=dcfg)
        for p in prompts:
            eng.submit(p, 10)
        outs = {r.uid: r.generated for r in eng.run()}
        for uid, ref in enumerate(refs):
            assert outs[uid] == ref, (uid, outs[uid], ref)
        assert eng.stats()["spec_drafted"] > 0

    def test_model_draft_self_speculation_accepts(self):
        """Draft == target ⇒ near-total acceptance ⇒ far fewer device
        steps than tokens."""
        params, cfg = _model()
        eng = Engine(
            params, cfg,
            ServeConfig(max_batch=1, max_seq=64, prefill_buckets=(8,),
                        spec_draft=3),
            draft_params=params, draft_cfg=cfg)
        eng.submit([3, 17, 42, 9], 12)
        out = eng.run()[0]
        assert len(out.generated) == 12
        s = eng.stats()
        assert s["spec_accept_rate"] > 0.5
        assert s["steps"] < 11

    def test_model_draft_requires_spec_draft(self):
        params, cfg = _model()
        with pytest.raises(ValueError, match="spec_draft"):
            Engine(params, cfg, ServeConfig(max_batch=1),
                   draft_params=params, draft_cfg=cfg)

    def test_spec_config_validation(self):
        params, cfg = _model()
        with pytest.raises(ValueError, match="greedy-only"):
            Engine(params, cfg, ServeConfig(spec_draft=2, temperature=1.0))
        with pytest.raises(ValueError, match="mutually exclusive"):
            Engine(params, cfg, ServeConfig(spec_draft=2,
                                            decode_steps_per_call=4))
        with pytest.raises(ValueError, match="slot layout"):
            Engine(params, cfg, ServeConfig(spec_draft=2, kv_layout="paged",
                                            page_size=8,
                                            prefill_buckets=(8,),
                                            max_seq=64))


class TestPerRequestSampling:
    def test_mixed_greedy_and_sampled_batch(self):
        """A greedy request must reproduce the all-greedy engine's tokens
        even while another slot in the SAME batch samples at temperature."""
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 8)

        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)))
        eng.submit([3, 17, 42, 9], 8)                     # greedy (default)
        eng.submit([7, 8, 9], 8, temperature=1.3, top_k=20)  # sampled
        done = {r.uid: r for r in eng.run()}
        assert done[0].generated == ref
        assert len(done[1].generated) == 8

    def test_sampled_request_deterministic_per_seed(self):
        params, cfg = _model()

        def run():
            eng = Engine(params, cfg, ServeConfig(
                max_batch=1, max_seq=64, prefill_buckets=(8,), seed=7))
            eng.submit([5, 6, 7], 8, temperature=0.9, top_p=0.95)
            return eng.run()[0].generated

        assert run() == run()

    def test_top_k_one_equals_greedy(self):
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 6)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,)))
        eng.submit([3, 17, 42, 9], 6, temperature=1.0, top_k=1)
        assert eng.run()[0].generated == ref

    def test_per_request_overrides_engine_default(self):
        """Engine configured to sample; a greedy per-request override
        reproduces the greedy reference in the same batch."""
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 6)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,), temperature=1.0))
        eng.submit([3, 17, 42, 9], 6, temperature=0.0)
        eng.submit([7, 8], 6)  # engine default: sampled
        done = {r.uid: r for r in eng.run()}
        assert done[0].generated == ref

    def test_min_p_one_equals_greedy(self):
        """min_p=1.0 keeps only the argmax token → sampled == greedy."""
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 6)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,)))
        eng.submit([3, 17, 42, 9], 6, temperature=1.0, min_p=1.0)
        assert eng.run()[0].generated == ref

    def test_multistep_mixed_sampling(self):
        """decode_steps_per_call > 1 respects per-slot sampling params."""
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 8)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,),
            decode_steps_per_call=4))
        eng.submit([3, 17, 42, 9], 8)
        eng.submit([7, 8, 9], 8, temperature=1.1)
        done = {r.uid: r for r in eng.run()}
        assert done[0].generated == ref


class TestStopAndFinishReason:
    def test_stop_token_trims_and_reports(self):
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 8)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,)))
        eng.submit([3, 17, 42, 9], 8, stop=[ref[2]])  # single token-id seq
        done = eng.run()[0]
        assert done.generated == ref[:2]  # stop token trimmed
        assert done.finish_reason == "stop"

    def test_multitoken_stop_sequence(self):
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 8)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,)))
        eng.submit([3, 17, 42, 9], 8, stop=[[ref[1], ref[2]], [999]])
        done = eng.run()[0]
        assert done.generated == ref[:1]
        assert done.finish_reason == "stop"

    def test_finish_reason_length_and_eos(self):
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 8)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)))
        eng.submit([3, 17, 42, 9], 4)
        done = {r.uid: r for r in eng.run()}
        assert done[0].finish_reason == "length"

        eng2 = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), eos_id=ref[1]))
        eng2.submit([3, 17, 42, 9], 8)
        d = eng2.run()[0]
        assert d.generated == ref[:2]  # eos token kept (existing contract)
        assert d.finish_reason == "stop"

    def test_finish_reason_cancelled(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,)))
        uid = eng.submit([3, 17], 32)
        eng.step()
        assert eng.cancel(uid)
        done = eng.run()
        assert done[0].finish_reason == "cancelled"

    def test_stop_with_multistep_decode(self):
        """decode_steps_per_call windows past the stop point must still trim
        at the match (tokens decoded after the stop are discarded)."""
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 8)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,),
            decode_steps_per_call=4))
        eng.submit([3, 17, 42, 9], 8, stop=[ref[2]])
        done = eng.run()[0]
        assert done.generated == ref[:2]
        assert done.finish_reason == "stop"


class TestPenalties:
    def test_apply_penalties_math(self):
        from ao_tpu.serving.sampling import apply_penalties

        logits = jnp.array([[2.0, -1.0, 0.5]])
        ppres = jnp.array([[1, 0, 0]], jnp.int8)
        out = jnp.array([[0, 0, 2]], jnp.int32)
        got = apply_penalties(
            logits, jnp.array([2.0]), jnp.array([0.1]), jnp.array([0.5]),
            ppres, out)
        # idx0: in prompt → 2/2; idx1: unseen → unchanged;
        # idx2: in output → 0.5/2 - 0.1*2 - 0.5
        np.testing.assert_allclose(
            np.asarray(got[0]), [1.0, -1.0, -0.45], rtol=1e-6)

    def test_enabled_defaults_match_disabled(self):
        """penalties=True with default values is an exact identity."""
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 8)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,), penalties=True))
        eng.submit([3, 17, 42, 9], 8)
        assert eng.run()[0].generated == ref

    def test_presence_penalty_forbids_output_repeats(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), penalties=True))
        eng.submit([3, 17, 42, 9], 10, presence_penalty=1e9)
        toks = eng.run()[0].generated
        assert len(set(toks)) == len(toks), toks

    def test_frequency_penalty_forbids_output_repeats(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), penalties=True))
        eng.submit([3, 17, 42, 9], 10, frequency_penalty=1e9)
        toks = eng.run()[0].generated
        assert len(set(toks)) == len(toks), toks

    def test_multistep_matches_single_step(self):
        """The scan-carried counts must equal the host-synced k=1 path."""
        params, cfg = _model()
        mk = lambda k: Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,), penalties=True,
            decode_steps_per_call=k))
        outs = []
        for k in (1, 4):
            eng = mk(k)
            eng.submit([3, 17, 42, 9], 8, repetition_penalty=1.3,
                       presence_penalty=0.2)
            outs.append(eng.run()[0].generated)
        assert outs[0] == outs[1]

    def test_paged_matches_slot(self):
        params, cfg = _model()
        mk = lambda layout: Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,), penalties=True,
            kv_layout=layout, page_size=8))
        outs = []
        for layout in ("slots", "paged"):
            eng = mk(layout)
            eng.submit([3, 17, 42, 9], 8, repetition_penalty=1.3)
            outs.append(eng.run()[0].generated)
        assert outs[0] == outs[1]

    def test_penalty_without_flag_raises(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,)))
        with pytest.raises(ValueError, match="penalties"):
            eng.submit([1, 2], 4, repetition_penalty=1.5)

    def test_slot_reuse_resets_counts(self):
        """A second request in the reused slot must not inherit the first
        request's output counts (its greedy tokens match the plain ref)."""
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 6)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), penalties=True))
        eng.submit([7, 8, 9], 6, presence_penalty=5.0)
        eng.run()
        eng.submit([3, 17, 42, 9], 6)  # defaults → must equal plain greedy
        assert eng.run()[0].generated == ref


class TestLogprobs:
    def test_greedy_logprobs_are_top1(self):
        """Greedy chosen token == top-1 id and chosen logprob == top-1
        value, for every generated token (prefill pick included)."""
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,), logprobs=3))
        eng.submit([3, 17, 42, 9], 6, logprobs=2)
        req = eng.run()[0]
        assert len(req.token_logprobs) == len(req.generated) == 6
        assert len(req.top_logprobs) == 6
        for tok, lp, top in zip(req.generated, req.token_logprobs,
                                req.top_logprobs):
            assert len(top) == 2
            assert top[0][0] == tok
            assert abs(top[0][1] - lp) < 1e-6
            assert lp <= 0.0

    def test_first_logprob_matches_plain_forward(self):
        """The prefill-picked token's logprob equals the log-softmax of a
        plain full-sequence forward at the last prompt position."""
        params, cfg = _model()
        prompt = [3, 17, 42, 9]
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), logprobs=1))
        eng.submit(prompt, 2, logprobs=0)
        req = eng.run()[0]
        logits = llama.forward(params, jnp.asarray(prompt, jnp.int32)[None],
                               cfg)[0]
        lp = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
        expect = float(lp[req.generated[0]])
        assert abs(req.token_logprobs[0] - expect) < 1e-4
        assert req.top_logprobs == []  # logprobs=0: chosen-token only

    def test_multistep_matches_single(self):
        params, cfg = _model()
        vals = []
        for k in (1, 4):
            eng = Engine(params, cfg, ServeConfig(
                max_batch=1, max_seq=64, prefill_buckets=(8,), logprobs=1,
                decode_steps_per_call=k))
            eng.submit([3, 17, 42, 9], 8, logprobs=1)
            req = eng.run()[0]
            vals.append((req.generated, req.token_logprobs))
        assert vals[0][0] == vals[1][0]
        np.testing.assert_allclose(vals[0][1], vals[1][1], atol=1e-5)

    def test_stop_trims_logprob_records(self):
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 8)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), logprobs=1))
        eng.submit([3, 17, 42, 9], 8, stop=[ref[2]], logprobs=1)
        req = eng.run()[0]
        assert req.generated == ref[:2]
        assert len(req.token_logprobs) == 2
        assert len(req.top_logprobs) == 2

    def test_exceeding_engine_budget_raises(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), logprobs=2))
        with pytest.raises(ValueError, match="logprobs"):
            eng.submit([1, 2], 4, logprobs=5)
        eng2 = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,)))
        with pytest.raises(ValueError, match="logprobs"):
            eng2.submit([1, 2], 4, logprobs=0)

    def test_mixed_batch_only_requesting_slot_records(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,), logprobs=1))
        eng.submit([3, 17, 42, 9], 6, logprobs=1)
        eng.submit([7, 8, 9], 6)  # no logprobs requested
        done = {r.uid: r for r in eng.run()}
        assert len(done[0].token_logprobs) == 6
        assert done[1].token_logprobs == []


class TestLogitBias:
    def test_bias_forces_and_bans_tokens(self):
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 6)
        # force token 7 everywhere
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), penalties=True))
        eng.submit([3, 17, 42, 9], 4, logit_bias={7: 1e9})
        assert eng.run()[0].generated == [7, 7, 7, 7]
        # ban the greedy first choice → first token differs from ref
        eng2 = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), penalties=True))
        eng2.submit([3, 17, 42, 9], 4, logit_bias={ref[0]: -1e9})
        out = eng2.run()[0].generated
        assert out[0] != ref[0]
        assert ref[0] not in out

    def test_bias_is_per_request(self):
        """A biased slot must not leak into its unbiased batchmate."""
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 6)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,), penalties=True))
        eng.submit([3, 17, 42, 9], 6)
        eng.submit([7, 8, 9], 6, logit_bias={5: 1e9})
        done = {r.uid: r for r in eng.run()}
        assert done[0].generated == ref
        assert done[1].generated == [5] * 6

    def test_bias_without_flag_raises(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,)))
        with pytest.raises(ValueError, match="penalties"):
            eng.submit([1, 2], 4, logit_bias={1: 5.0})

    def test_bias_bad_token_id_raises(self):
        params, cfg = _model()
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), penalties=True))
        with pytest.raises(ValueError, match="token ids"):
            eng.submit([1, 2], 4, logit_bias={9999: 1.0})

    def test_slot_reuse_clears_bias(self):
        params, cfg = _model()
        ref = _ref_generate(params, cfg, [3, 17, 42, 9], 6)
        eng = Engine(params, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,), penalties=True))
        eng.submit([7, 8], 4, logit_bias={5: 1e9})
        eng.run()
        eng.submit([3, 17, 42, 9], 6)
        assert eng.run()[0].generated == ref
