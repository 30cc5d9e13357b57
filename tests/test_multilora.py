"""Multi-LoRA serving: per-request adapters batched in one decode step.

(ref analog: vLLM's S-LoRA-style multi-adapter serving — the reference
ships the QLoRA dtype and delegates this layer; here it's in-framework.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.serving.engine import Engine, ServeConfig
from ao_tpu.training.qlora import apply_lora, init_lora


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())

    def mk_adapter(seed):
        lora = init_lora(jax.random.PRNGKey(seed), qp, rank=4)
        # nonzero b so the adapter actually changes the model
        return jax.tree_util.tree_map(
            lambda v: v + 0.05 * jax.random.normal(
                jax.random.PRNGKey(seed + 100), v.shape, v.dtype), lora)

    return cfg, qp, {"fr": mk_adapter(1), "de": mk_adapter(2)}


def _engine_ref(params, cfg, prompt, n):
    eng = Engine(params, cfg, ServeConfig(
        max_batch=2, max_seq=64, prefill_buckets=(8,)))
    eng.submit(prompt, n)
    return eng.run()[0].generated


class TestMultiLoRA:
    def test_adapters_change_output(self, setup):
        cfg, qp, adapters = setup
        prompt = [3, 17, 42, 9]
        base = _engine_ref(qp, cfg, prompt, 6)
        fr = _engine_ref(apply_lora(qp, adapters["fr"]), cfg, prompt, 6)
        assert base != fr  # the adapter matters

    def test_mixed_batch_matches_per_adapter_references(self, setup):
        cfg, qp, adapters = setup
        prompt = [3, 17, 42, 9]
        refs = {
            None: _engine_ref(qp, cfg, prompt, 6),
            "fr": _engine_ref(apply_lora(qp, adapters["fr"]), cfg, prompt, 6),
            "de": _engine_ref(apply_lora(qp, adapters["de"]), cfg, prompt, 6),
        }
        assert len({tuple(v) for v in refs.values()}) == 3  # all distinct

        eng = Engine(qp, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)),
            lora_adapters=adapters)
        uids = {}
        for name in (None, "fr", "de"):
            uids[eng.submit(prompt, 6, lora=name)] = name
        outs = {uids[r.uid]: r.generated for r in eng.run()}
        for name, ref in refs.items():
            assert outs[name] == ref, (name, outs[name], ref)

    def test_unknown_adapter_raises(self, setup):
        cfg, qp, adapters = setup
        eng = Engine(qp, cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,)),
            lora_adapters=adapters)
        with pytest.raises(ValueError, match="unknown adapter"):
            eng.submit([1, 2], 2, lora="es")

    def test_slot_reuse_remaps_adapter(self, setup):
        """A slot serving adapter A then adapter B must not leak A."""
        cfg, qp, adapters = setup
        prompt = [7, 8, 9]
        ref_de = _engine_ref(apply_lora(qp, adapters["de"]), cfg, prompt, 5)
        eng = Engine(qp, cfg, ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(8,)),
            lora_adapters=adapters)
        eng.submit(prompt, 5, lora="fr")
        eng.run()
        eng.submit(prompt, 5, lora="de")   # same slot, different adapter
        assert eng.run()[0].generated == ref_de
