"""MoE-Llama model family tests: forward, quantized experts, generation,
and the model zoo fixtures.

(ref analog: the Mixtral/Llama4-style MoE coverage in
prototype/moe_training's torchtitan integration tests.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import llama, zoo

sqnr = ao_tpu.compute_error


def _moe_cfg():
    return llama.LlamaConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=96, tie_embeddings=True, dtype=jnp.float32,
        n_experts=4, top_k_experts=2,
    )


class TestMoELlama:
    def test_forward(self):
        cfg = _moe_cfg()
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        assert "router" in params["layers"][0]["mlp"]
        assert params["layers"][0]["mlp"]["w_gate"].shape == (4, 64, 96)
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        logits, _ = jax.jit(lambda p, t: llama.forward(p, t, cfg))(params, tokens)
        assert logits.shape == (1, 8, 128)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_quantized_experts_end_to_end(self):
        cfg = _moe_cfg()
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        ref, _ = llama.forward(params, tokens, cfg)
        # quantize BOTH dense attention weights (2-D) and experts (3-D)
        qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())
        from ao_tpu.quantization.qarrays.int8 import Int8Array

        assert isinstance(qp["layers"][0]["mlp"]["w_gate"], Int8Array)
        assert isinstance(qp["layers"][0]["attn"]["wq"], Int8Array)
        out, _ = jax.jit(lambda p, t: llama.forward(p, t, cfg))(qp, tokens)
        assert sqnr(ref, out) > 20

    def test_generation_with_kv_cache(self):
        from ao_tpu.serving.decode import generate

        cfg = _moe_cfg()
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        toks = generate(
            params, jnp.asarray([[5, 9, 3]], jnp.int32), cfg, 6, max_seq=32
        )
        assert toks.shape == (1, 6)

    def test_training_grads_flow_through_router(self):
        cfg = _moe_cfg()
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.arange(9, dtype=jnp.int32)[None]

        def loss(p):
            logits, _ = llama.forward(p, tokens[:, :-1], cfg)
            import optax

            return optax.softmax_cross_entropy_with_integer_labels(
                logits, tokens[:, 1:]
            ).mean()

        grads = jax.grad(loss)(params)
        g_router = grads["layers"][0]["mlp"]["router"]
        g_exp = grads["layers"][0]["mlp"]["w_gate"]
        assert float(jnp.abs(g_router).sum()) > 0
        assert float(jnp.abs(g_exp).sum()) > 0


class TestZoo:
    def test_toy_linear_quantizes(self):
        params = zoo.init_toy_linear(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        ref = zoo.toy_linear_forward(params, x)
        qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())
        assert sqnr(ref, zoo.toy_linear_forward(qp, x)) > 20

    def test_mlp_with_bias(self):
        params = zoo.init_mlp(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        out = zoo.mlp_forward(params, x)
        assert out.shape == (4, 10)
        qp = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(group_size=32))
        assert sqnr(out, zoo.mlp_forward(qp, x)) > 10
