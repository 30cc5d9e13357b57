"""GGUF v3 file format tests: roundtrip, Q8_0 numerics, llama export."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ao_tpu
from ao_tpu.integrations.gguf_file import (
    dequantize_q8_0,
    quantize_q8_0,
    read_gguf,
    write_gguf,
)

sqnr = ao_tpu.compute_error


class TestQ8_0:
    def test_roundtrip_sqnr(self):
        a = np.random.default_rng(0).standard_normal(1024).astype(np.float32)
        raw = quantize_q8_0(a)
        assert len(raw) == 1024 // 32 * 34
        back = dequantize_q8_0(raw, 1024)
        assert float(sqnr(jnp.asarray(a), jnp.asarray(back))) > 35

    def test_zero_block(self):
        a = np.zeros(32, np.float32)
        back = dequantize_q8_0(quantize_q8_0(a), 32)
        np.testing.assert_array_equal(back, 0.0)


class TestGGUFFile:
    def test_file_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        tensors = {
            "blk.0.attn_q.weight": rng.standard_normal((64, 32)).astype(np.float32),
            "blk.0.norm.weight": rng.standard_normal(64).astype(np.float32),
            "small": rng.standard_normal((3, 5)).astype(np.float32),  # not /32
        }
        meta = {"general.name": "test-model", "ao_tpu.group_size": 32,
                "ao_tpu.pi": 3.5, "ao_tpu.flag": True}
        path = str(tmp_path / "m.gguf")
        write_gguf(path, tensors, meta)

        back, meta2 = read_gguf(path)
        assert meta2["general.name"] == "test-model"
        assert meta2["ao_tpu.group_size"] == 32
        assert meta2["ao_tpu.flag"] is True
        assert meta2["general.architecture"] == "ao_tpu"
        # 2-D /32 → q8_0 (lossy but tight); others f32 exact
        assert float(sqnr(jnp.asarray(tensors["blk.0.attn_q.weight"]),
                          jnp.asarray(back["blk.0.attn_q.weight"]))) > 35
        np.testing.assert_array_equal(back["blk.0.norm.weight"],
                                      tensors["blk.0.norm.weight"])
        np.testing.assert_array_equal(back["small"], tensors["small"])

    def test_magic_and_alignment(self, tmp_path):
        path = str(tmp_path / "m.gguf")
        write_gguf(path, {"t": np.ones((32,), np.float32)})
        raw = open(path, "rb").read()
        assert raw[:4] == b"GGUF"
        assert int.from_bytes(raw[4:8], "little") == 3

    def test_llama_export(self, tmp_path):
        """Export a whole llama params pytree through the torch-side naming."""
        from ao_tpu.models import llama
        from ao_tpu.quantization.quantize import path_to_fqn

        cfg = llama.LlamaConfig(vocab_size=64, dim=32, n_layers=1, n_heads=2,
                                n_kv_heads=1, ffn_dim=64, tie_embeddings=True,
                                dtype=jnp.float32)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        flat = {}

        def visit(path, leaf):
            flat[path_to_fqn(path)] = np.asarray(leaf)
            return leaf

        jax.tree_util.tree_map_with_path(visit, params)
        path = str(tmp_path / "llama.gguf")
        write_gguf(path, flat, {"general.name": "tiny-llama"})
        back, _ = read_gguf(path)
        assert set(back) == set(flat)
        assert float(sqnr(jnp.asarray(flat["layers.0.attn.wq"]),
                          jnp.asarray(back["layers.0.attn.wq"]))) > 35


def test_export_quantized_params(tmp_path):
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
    qp = ao_tpu.quantize_({"kernel": w}, ao_tpu.Int4WeightOnlyConfig(group_size=32))
    from ao_tpu.integrations.gguf_file import export_params_gguf

    path = str(tmp_path / "q.gguf")
    export_params_gguf(path, qp, {"general.name": "int4-export"})
    back, meta = read_gguf(path)
    assert meta["general.name"] == "int4-export"
    # gguf tensor ≈ int4-dequantized weight (q8_0 re-code is near-lossless)
    assert float(sqnr(qp["kernel"].dequantize(jnp.float32),
                      jnp.asarray(back["kernel"]))) > 30


class TestQ4K:
    def test_q4k_roundtrip_sqnr(self):
        from ao_tpu.integrations.gguf_file import (
            dequantize_q4_k, quantize_q4_k)

        rng = np.random.default_rng(0)
        a = rng.normal(size=(8, 512)).astype(np.float32)
        blob = quantize_q4_k(a)
        assert len(blob) == a.size // 256 * 144  # 4.5 bits/value
        back = dequantize_q4_k(blob, a.size).reshape(a.shape)
        err = 10 * np.log10((a ** 2).mean() / ((a - back) ** 2).mean())
        assert err > 13.0, err

    def test_q4k_file_roundtrip(self, tmp_path):
        from ao_tpu.integrations.gguf_file import (
            GGML_Q4_K, read_gguf, write_gguf)

        rng = np.random.default_rng(1)
        tensors = {
            "w": rng.normal(size=(16, 256)).astype(np.float32),
            "odd": rng.normal(size=(4, 48)).astype(np.float32),  # → Q8_0
            "vec": rng.normal(size=(100,)).astype(np.float32),   # → F32
        }
        path = str(tmp_path / "m.gguf")
        write_gguf(path, tensors, {"general.name": "q4k"},
                   quantize_2d="q4_k")
        back, meta = read_gguf(path)
        assert meta["general.name"] == "q4k"
        for name, a in tensors.items():
            assert back[name].shape == a.shape
            err = 10 * np.log10(
                (a ** 2).mean() / max(((a - back[name]) ** 2).mean(), 1e-30))
            assert err > 13.0, (name, err)
