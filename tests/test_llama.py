"""Llama model tests: forward shapes, decode-vs-prefill equivalence,
quantized model e2e. (ref analog: test/integration e2e tests.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.quantization.primitives import compute_error

CFG = llama.LLAMA_TINY
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(KEY, CFG)


def test_forward_shapes(params):
    tokens = jax.random.randint(KEY, (2, 16), 0, CFG.vocab_size)
    logits, _ = llama.forward(params, tokens, CFG)
    assert logits.shape == (2, 16, CFG.vocab_size)
    assert logits.dtype == jnp.float32


def test_decode_matches_prefill(params):
    b, s = 1, 8
    tokens = jax.random.randint(KEY, (b, s), 0, CFG.vocab_size)
    full_logits, _ = llama.forward(params, tokens, CFG)

    caches = llama.init_kv_caches(CFG, b, max_seq=16)
    outs = []
    for t in range(s):
        pos = jnp.full((b, 1), t, jnp.int32)
        logits, caches = llama.forward(
            params, tokens[:, t : t + 1], CFG, positions=pos,
            kv_caches=caches, cache_index=t,
        )
        outs.append(logits[:, 0])
    step_logits = jnp.stack(outs, axis=1)
    err = compute_error(full_logits, step_logits)
    assert err > 30.0, f"decode/prefill mismatch: SQNR {err}"


@pytest.mark.parametrize(
    "config",
    [
        ao_tpu.Int8WeightOnlyConfig(),
        ao_tpu.Int4WeightOnlyConfig(group_size=32),
        ao_tpu.Int8DynamicActivationInt8WeightConfig(),
        ao_tpu.Float8DynamicActivationFloat8WeightConfig(),
    ],
)
def test_quantized_model_close_to_bf16(params, config):
    tokens = jax.random.randint(KEY, (1, 8), 0, CFG.vocab_size)
    ref, _ = llama.forward(params, tokens, CFG)
    qp = ao_tpu.quantize_(params, config)
    out, _ = llama.forward(qp, tokens, CFG)
    err = compute_error(ref, out)
    assert err > 10.0, f"{type(config).__name__}: logits SQNR {err}"


def test_quantized_jit_forward(params):
    qp = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(group_size=32))
    tokens = jax.random.randint(KEY, (1, 8), 0, CFG.vocab_size)

    fwd = jax.jit(lambda p, t: llama.forward(p, t, CFG)[0])
    y1 = fwd(qp, tokens)
    y2, _ = llama.forward(qp, tokens, CFG)
    assert compute_error(y2, y1) > 40.0


def test_quantized_decode(params):
    qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())
    b = 1
    tokens = jax.random.randint(KEY, (b, 4), 0, CFG.vocab_size)
    ref, _ = llama.forward(qp, tokens, CFG)
    caches = llama.init_kv_caches(CFG, b, max_seq=8)
    outs = []
    for t in range(4):
        pos = jnp.full((b, 1), t, jnp.int32)
        logits, caches = llama.forward(
            qp, tokens[:, t : t + 1], CFG, positions=pos,
            kv_caches=caches, cache_index=t,
        )
        outs.append(logits[:, 0])
    step = jnp.stack(outs, axis=1)
    assert compute_error(ref, step) > 30.0


class TestQwenStyleBias:
    def test_qkv_bias_forward_and_quantize(self):
        import numpy as np

        cfg = llama.LlamaConfig(
            vocab_size=64, dim=64, n_layers=1, n_heads=4, n_kv_heads=2,
            ffn_dim=96, tie_embeddings=True, dtype=jnp.float32, qkv_bias=True,
        )
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        attn = params["layers"][0]["attn"]
        assert "bq" in attn and attn["bq"].shape == (64,)
        # a nonzero bias must change the output
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        ref, _ = llama.forward(params, tokens, cfg)
        attn2 = dict(attn)
        attn2["bq"] = jnp.ones_like(attn["bq"])
        p2 = dict(params)
        p2["layers"] = [dict(params["layers"][0], attn=attn2)]
        out, _ = llama.forward(p2, tokens, cfg)
        assert not np.allclose(np.asarray(ref), np.asarray(out))
        # quantize_ must skip 1-D biases but quantize the weights
        import ao_tpu as ao
        from ao_tpu.quantization.qarrays.int8 import Int8Array

        qp = ao.quantize_(params, ao.Int8WeightOnlyConfig())
        qattn = qp["layers"][0]["attn"]
        assert isinstance(qattn["wq"], Int8Array)
        assert qattn["bq"] is attn["bq"]
        out, _ = llama.forward(qp, tokens, cfg)
        assert ao.compute_error(ref, out) > 20
