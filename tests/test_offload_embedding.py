"""CPU-offload optimizer and embedding-quantizer tests.

(ref analog: torchao/optim CPUOffloadOptimizer tests and
test/prototype/test_embedding.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.ops.embedding import embedding
from ao_tpu.quantization.embedding_quant import (
    EmbeddingQuantizerConfig,
    quantize_embeddings,
)
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.training.offload import cpu_offload, hbm_savings_report

sqnr = ao_tpu.compute_error


class TestCpuOffload:
    def test_matches_on_device_adam(self):
        params = {"w": jax.random.normal(jax.random.PRNGKey(0), (32, 16))}
        grads = {"w": jax.random.normal(jax.random.PRNGKey(1), (32, 16))}

        ref_opt = optax.adamw(1e-2)
        ref_state = ref_opt.init(params)
        off_opt = cpu_offload(optax.adamw(1e-2))
        off_state = off_opt.init(params)

        p_ref, p_off = params, params
        for i in range(3):
            g = jax.tree.map(lambda x: x * (i + 1), grads)
            u1, ref_state = ref_opt.update(g, ref_state, p_ref)
            p_ref = optax.apply_updates(p_ref, u1)
            u2, off_state = off_opt.update(g, off_state, p_off)
            p_off = optax.apply_updates(
                p_off, jax.tree.map(lambda u: jnp.asarray(u), u2)
            )
        np.testing.assert_allclose(
            np.asarray(p_ref["w"]), np.asarray(p_off["w"]), rtol=1e-5, atol=1e-6
        )

    def test_state_lives_on_cpu(self):
        params = {"w": jnp.ones((8, 8))}
        opt = cpu_offload(optax.adam(1e-3))
        state = opt.init(params)
        leaves = [x for x in jax.tree_util.tree_leaves(state)
                  if hasattr(x, "devices")]
        assert leaves, "no array state"
        for leaf in leaves:
            assert all(d.platform == "cpu" for d in leaf.devices()), leaf.devices()

    def test_savings_report(self):
        r = hbm_savings_report({"w": jnp.ones((1024, 1024))})
        assert r["offloaded_state_bytes"] == 2 * 1024 * 1024 * 4


class TestEmbeddingQuantizer:
    def test_int8_lookup_sqnr(self):
        table = jax.random.normal(jax.random.PRNGKey(0), (256, 64), jnp.float32)
        q = quantize_embeddings({"embed": table})["embed"]
        assert isinstance(q, Int8Array)
        ids = jnp.array([[0, 5, 255, 17]])
        out = embedding(q, ids, out_dtype=jnp.float32)
        ref = jnp.take(table, ids, axis=0)
        assert sqnr(ref, out) > 25

    def test_int4_embedding(self):
        table = jax.random.normal(jax.random.PRNGKey(1), (256, 64), jnp.float32)
        q = quantize_embeddings(
            {"embed": table}, EmbeddingQuantizerConfig(bits=4)
        )["embed"]
        ids = jnp.array([[3, 200]])
        out = embedding(q, ids, out_dtype=jnp.float32)
        assert sqnr(jnp.take(table, ids, axis=0), out) > 10

    def test_name_filter_skips_linears(self):
        params = {
            "embed": jax.random.normal(jax.random.PRNGKey(0), (64, 32)),
            "layer": {"kernel": jnp.ones((32, 32))},
        }
        qp = quantize_embeddings(params)
        assert isinstance(qp["embed"], Int8Array)
        assert qp["layer"]["kernel"] is params["layer"]["kernel"]

    def test_llama_with_quantized_tied_embedding(self):
        cfg = llama.LlamaConfig(
            vocab_size=128, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
            ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
        )
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        ref, _ = llama.forward(params, tokens, cfg)
        qp = quantize_embeddings(params)
        out, _ = jax.jit(lambda p, t: llama.forward(p, t, cfg))(qp, tokens)
        assert sqnr(ref, out) > 20
