"""torch → ao_tpu checkpoint import tests (torch CPU is available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.integrations.torch_import import import_hf_llama, import_linear
from ao_tpu.models import llama

torch = pytest.importorskip("torch")


def _hf_llama_sd(cfg: llama.LlamaConfig, seed=0):
    g = torch.Generator().manual_seed(seed)
    d, hd = cfg.dim, cfg.head_dim

    def lin(fan_out, fan_in):
        return torch.randn(fan_out, fan_in, generator=g) * fan_in ** -0.5

    sd = {"model.embed_tokens.weight":
          torch.randn(cfg.vocab_size, d, generator=g) * 0.02,
          "model.norm.weight": torch.ones(d)}
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = lin(cfg.n_heads * hd, d)
        sd[p + "self_attn.k_proj.weight"] = lin(cfg.n_kv_heads * hd, d)
        sd[p + "self_attn.v_proj.weight"] = lin(cfg.n_kv_heads * hd, d)
        sd[p + "self_attn.o_proj.weight"] = lin(d, cfg.n_heads * hd)
        sd[p + "mlp.gate_proj.weight"] = lin(cfg.ffn_dim, d)
        sd[p + "mlp.up_proj.weight"] = lin(cfg.ffn_dim, d)
        sd[p + "mlp.down_proj.weight"] = lin(d, cfg.ffn_dim)
        sd[p + "input_layernorm.weight"] = torch.ones(d)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(d)
    return sd


class TestTorchImport:
    def test_linear_transpose(self):
        w = torch.randn(8, 16)
        out = import_linear(w, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), w.numpy().T, rtol=1e-6)

    def test_bf16_tensor(self):
        w = torch.randn(8, 16).to(torch.bfloat16)
        out = import_linear(w, jnp.bfloat16)
        assert out.shape == (16, 8) and out.dtype == jnp.bfloat16

    def test_hf_llama_roundtrip_and_quantize(self):
        cfg = llama.LlamaConfig(
            vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=96, tie_embeddings=True, dtype=jnp.float32,
        )
        sd = _hf_llama_sd(cfg)
        params = import_hf_llama(sd, cfg.n_layers, dtype=jnp.float32)
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        logits, _ = llama.forward(params, tokens, cfg)
        assert logits.shape == (1, 8, 128)
        assert bool(jnp.all(jnp.isfinite(logits)))

        # the imported linear must compute EXACTLY what torch computes
        x = torch.randn(4, 64)
        ref = (x @ sd["model.layers.0.self_attn.q_proj.weight"].T).numpy()
        got = np.asarray(jnp.asarray(x.numpy()) @ params["layers"][0]["attn"]["wq"])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

        qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())
        ql, _ = llama.forward(qp, tokens, cfg)
        assert ao_tpu.compute_error(logits, ql) > 20

    def test_untied_lm_head(self):
        cfg = llama.LlamaConfig(
            vocab_size=64, dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
            ffn_dim=48, tie_embeddings=False, dtype=jnp.float32,
        )
        sd = _hf_llama_sd(cfg)
        sd["lm_head.weight"] = torch.randn(cfg.vocab_size, cfg.dim) * 0.02
        params = import_hf_llama(sd, cfg.n_layers, dtype=jnp.float32)
        assert params["lm_head"].shape == (32, 64)
