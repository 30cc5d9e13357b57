"""Orbax checkpoint roundtrip for quantized pytrees.

(ref analog: the reference's state_dict + add_safe_globals checkpoint path
(torchao/utils.py:639) — here QuantizedArray pytrees must survive the
standard JAX checkpointing stack unchanged, which is the design claim of
the pytree container architecture.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.ops import linear


@pytest.fixture(scope="module")
def qtree():
    w1 = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
    w2 = jax.random.normal(jax.random.PRNGKey(1), (64, 48), jnp.float32)
    return ao_tpu.quantize_(
        {"a": {"kernel": w1}, "b": {"kernel": w2},
         "bias": jnp.zeros((32,), jnp.float32)},
        ao_tpu.Int4WeightOnlyConfig(group_size=32),
    )


class TestOrbax:
    def test_roundtrip_preserves_linear(self, qtree, tmp_path):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        path = tmp_path / "ckpt"
        ckpt.save(path, qtree)
        ckpt.wait_until_finished()
        # restore with the tree itself as abstract structure
        restored = ckpt.restore(path, qtree)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 64), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(linear(x, qtree["a"]["kernel"])),
            np.asarray(linear(x, restored["a"]["kernel"])))
        assert type(restored["a"]["kernel"]) is type(qtree["a"]["kernel"])
        assert restored["a"]["kernel"].block_size == \
            qtree["a"]["kernel"].block_size

    def test_model_checkpoint(self, tmp_path):
        import orbax.checkpoint as ocp

        cfg = llama.LlamaConfig(vocab_size=64, dim=32, n_layers=1, n_heads=2,
                                n_kv_heads=1, ffn_dim=64,
                                tie_embeddings=True, dtype=jnp.float32)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(tmp_path / "model", qp)
        ckpt.wait_until_finished()
        restored = ckpt.restore(tmp_path / "model", qp)
        toks = jnp.arange(4, dtype=jnp.int32)[None]
        a, _ = llama.forward(qp, toks, cfg)
        b, _ = llama.forward(restored, toks, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
