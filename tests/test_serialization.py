"""Checkpoint serialization tests: flatten/unflatten roundtrips, safetensors
and npz formats, embedded configs, trust boundary.

(ref analog: test/prototype/test_safetensors_support.py and
test/core/test_config.py.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.ops import linear
from ao_tpu.quantization.qarrays.int4 import Int4Array

sqnr = ao_tpu.compute_error


def _qparams():
    cfg = llama.LlamaConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qcfg = ao_tpu.Int4WeightOnlyConfig(group_size=32)
    return ao_tpu.quantize_(params, qcfg), qcfg, cfg


def _trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, (ta, tb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestFlattenUnflatten:
    def test_roundtrip_llama_int4(self):
        qp, _, _ = _qparams()
        tensors, meta = ao_tpu.flatten_quantized_state_dict(qp)
        # every tensor is a plain array with a serializable dtype
        for v in tensors.values():
            assert isinstance(v, jax.Array) and not hasattr(v, "qdata")
        back = ao_tpu.unflatten_quantized_state_dict(tensors, meta)
        _trees_equal(qp, back)
        # lists restored as lists
        assert isinstance(back["layers"], list)
        assert isinstance(back["layers"][0]["attn"]["wq"], Int4Array)

    def test_fp8_dtype_shim(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (32, 16), jnp.float32)
        qp = ao_tpu.quantize_(
            {"kernel": w}, ao_tpu.Float8WeightOnlyConfig()
        )
        tensors, meta = ao_tpu.flatten_quantized_state_dict(qp)
        # fp8 payload shipped as uint8
        assert tensors["kernel:qdata"].dtype == jnp.uint8
        back = ao_tpu.unflatten_quantized_state_dict(tensors, meta)
        assert back["kernel"].qdata.dtype == jnp.float8_e4m3fn
        _trees_equal(qp, back)

    def test_rejects_unregistered_class(self):
        qp, _, _ = _qparams()
        tensors, meta = ao_tpu.flatten_quantized_state_dict(qp)
        fqn = next(k for k, v in meta["entries"].items() if v["kind"] == "qarray")
        meta["entries"][fqn]["class"] = "os.system"
        with pytest.raises(ValueError, match="unregistered"):
            ao_tpu.unflatten_quantized_state_dict(tensors, meta)


class TestFileIO:
    @pytest.mark.parametrize("suffix", [".safetensors", ".npz"])
    def test_save_load_with_config(self, tmp_path, suffix):
        qp, qcfg, cfg = _qparams()
        path = str(tmp_path / f"ckpt{suffix}")
        ao_tpu.save_quantized(path, qp, config=qcfg)
        back, loaded_cfg = ao_tpu.load_quantized(path)
        assert loaded_cfg == qcfg
        _trees_equal(qp, back)

        # loaded checkpoint actually serves
        tokens = jnp.zeros((1, 4), jnp.int32)
        ref, _ = llama.forward(qp, tokens, cfg)
        out, _ = llama.forward(back, tokens, cfg)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    def test_checkpoint_smaller_than_bf16(self, tmp_path):
        qp, qcfg, _ = _qparams()
        hp = llama.init_params(jax.random.PRNGKey(0), llama.LlamaConfig(
            vocab_size=64, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=128, tie_embeddings=True, dtype=jnp.bfloat16,
        ))
        pq = str(tmp_path / "q.safetensors")
        ph = str(tmp_path / "hp.safetensors")
        ao_tpu.save_quantized(pq, qp)
        ao_tpu.save_quantized(ph, hp)
        # embed table dominates at this size; just require a real reduction
        assert os.path.getsize(pq) < os.path.getsize(ph)

    def test_mixed_plain_and_quantized(self, tmp_path):
        w = jax.random.normal(jax.random.PRNGKey(1), (64, 32), jnp.float32)
        params = {
            "a": {"kernel": w, "bias": jnp.zeros((32,), jnp.float32)},
            "scalars": jnp.arange(4, dtype=jnp.int32),
        }
        qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())
        path = str(tmp_path / "m.npz")
        ao_tpu.save_quantized(path, qp)
        back, cfg = ao_tpu.load_quantized(path)
        assert cfg is None
        _trees_equal(qp, back)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 64), jnp.float32)
        assert sqnr(x @ w, linear(x, back["a"]["kernel"])) > 25
