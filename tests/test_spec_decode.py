"""Draft-model speculative decoding (`generate_speculative`): lossless
greedy equivalence, self-speculation acceptance, quantized target/draft,
quantized KV cache."""

import jax
import jax.numpy as jnp
import numpy as np

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.serving.decode import generate, generate_speculative

KEY = jax.random.PRNGKey(0)
CFG = llama.LlamaConfig(
    vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
    ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
)
DCFG = llama.LlamaConfig(
    vocab_size=256, dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
    ffn_dim=64, tie_embeddings=True, dtype=jnp.float32,
)


def _compact(tokens, n_valid):
    """Strip the -1 padding: per-row list of the real tokens, in order."""
    out = []
    for row, n in zip(np.asarray(tokens), np.asarray(n_valid)):
        real = [int(t) for t in row if t >= 0]
        assert len(real) == int(n)
        out.append(real)
    return out


class TestSpecDecode:
    def test_greedy_equivalence(self):
        """Speculative decoding is lossless: the emitted stream equals
        plain greedy decoding of the target model, whatever the draft."""
        params = llama.init_params(KEY, CFG)
        dparams = llama.init_params(jax.random.PRNGKey(9), DCFG)
        prompt = jax.random.randint(KEY, (2, 5), 0, CFG.vocab_size)
        rounds, k = 6, 3
        toks, n_valid = generate_speculative(
            params, dparams, prompt, CFG, DCFG, rounds, 64, k=k)
        spec = _compact(toks, n_valid)
        ref = np.asarray(generate(params, prompt, CFG, 24, 64))
        for row in range(2):
            n = min(len(spec[row]), ref.shape[1])
            assert spec[row][:n] == list(ref[row][:n]), (
                f"row {row}: {spec[row][:n]} != {list(ref[row][:n])}")

    def test_self_speculation_accepts_all(self):
        """Draft == target ⇒ every draft token verifies ⇒ k+1 tokens per
        round, no padding."""
        params = llama.init_params(KEY, CFG)
        prompt = jax.random.randint(KEY, (2, 4), 0, CFG.vocab_size)
        rounds, k = 4, 3
        toks, n_valid = generate_speculative(
            params, params, prompt, CFG, CFG, rounds, 64, k=k)
        assert np.asarray(n_valid).tolist() == [1 + rounds * (k + 1)] * 2
        assert int(jnp.min(toks)) >= 0  # no rejected slots at all

    def test_quantized_target_and_draft(self):
        params = ao_tpu.quantize_(
            llama.init_params(KEY, CFG),
            ao_tpu.Int8WeightOnlyConfig())
        dparams = ao_tpu.quantize_(
            llama.init_params(jax.random.PRNGKey(9), DCFG),
            ao_tpu.Int4WeightOnlyConfig(group_size=32))
        prompt = jax.random.randint(KEY, (2, 4), 0, CFG.vocab_size)
        toks, n_valid = generate_speculative(
            params, dparams, prompt, CFG, DCFG, 3, 64, k=2)
        assert toks.shape == (2, 10)
        assert np.all(np.asarray(n_valid) >= 4)  # prefill + ≥1/round

    def test_quantized_kv_cache(self):
        params = llama.init_params(KEY, CFG)
        dparams = llama.init_params(jax.random.PRNGKey(9), DCFG)
        prompt = jax.random.randint(KEY, (1, 4), 0, CFG.vocab_size)
        toks, n_valid = generate_speculative(
            params, dparams, prompt, CFG, DCFG, 3, 64, k=2,
            kv_quant="int8")
        assert toks.shape == (1, 10)
        assert int(n_valid[0]) >= 4
