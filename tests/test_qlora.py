"""QLoRA: low-rank adapters over frozen quantized bases.

(ref analog: NF4Tensor's QLoRA role — nf4_tensor.py LinearNF4 + the
torchtune adapter recipes it feeds.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.ops import linear
from ao_tpu.training.qlora import (
    LoRAWeight, apply_lora, init_lora, merge_lora,
)


@pytest.fixture(scope="module")
def base():
    cfg = llama.LlamaConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=128, tie_embeddings=True, dtype=jnp.float32,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qp = ao_tpu.quantize_(params, ao_tpu.NF4WeightOnlyConfig(block_size=32))
    return cfg, qp


class TestLoRAWeight:
    def test_zero_init_matches_base(self, base):
        cfg, qp = base
        lora = init_lora(jax.random.PRNGKey(1), qp, rank=4)
        assert len(lora) > 0
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        ref, _ = llama.forward(qp, tokens, cfg)
        out, _ = llama.forward(apply_lora(qp, lora), tokens, cfg)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_linear_dispatch_and_grads(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
        qw = ao_tpu.quantize_({"kernel": w},
                              ao_tpu.Int8WeightOnlyConfig())["kernel"]
        lora = init_lora(jax.random.PRNGKey(1), {"kernel": qw}, rank=4)
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 64), jnp.float32)

        def loss(ad):
            lw = apply_lora({"kernel": qw}, ad)["kernel"]
            assert isinstance(lw, LoRAWeight)
            return jnp.sum(linear(x, lw) ** 2)

        g = jax.grad(loss)(lora)
        # b starts at zero so dL/da == 0 on the first step, but dL/db != 0
        assert float(jnp.abs(g["kernel"]["b"]).max()) > 0.0
        assert g["kernel"]["a"].shape == (64, 4)

    def test_training_reduces_loss(self, base):
        cfg, qp = base
        lora = init_lora(jax.random.PRNGKey(1), qp, rank=4)
        tokens = jnp.asarray([[5, 9, 3, 77, 21, 40, 8, 2]], jnp.int32)
        targets = jnp.asarray([[9, 3, 77, 21, 40, 8, 2, 100]], jnp.int32)

        def loss_fn(ad):
            logits, _ = llama.forward(apply_lora(qp, ad), tokens, cfg)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32))
            return -jnp.take_along_axis(lp, targets[..., None], -1).mean()

        opt = optax.adam(3e-2)
        state = opt.init(lora)
        step = jax.jit(lambda ad, st: _step(loss_fn, opt, ad, st))
        l0 = None
        for i in range(8):
            lora, state, l = step(lora, state)
            if l0 is None:
                l0 = float(l)
        assert float(l) < l0

    def test_merge_matches_adapted_forward(self, base):
        cfg, qp = base
        lora = init_lora(jax.random.PRNGKey(1), qp, rank=4)
        # random nonzero b so the delta actually matters
        lora = jax.tree_util.tree_map(
            lambda v: v + 0.02 * jax.random.normal(
                jax.random.PRNGKey(7), v.shape, v.dtype), lora)
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        adapted, _ = llama.forward(apply_lora(qp, lora), tokens, cfg)
        merged, _ = llama.forward(merge_lora(qp, lora), tokens, cfg)
        assert float(ao_tpu.compute_error(adapted, merged)) > 30.0

    def test_base_stays_frozen(self, base):
        cfg, qp = base
        lora = init_lora(jax.random.PRNGKey(1), qp, rank=4)
        tokens = jnp.arange(8, dtype=jnp.int32)[None]

        def loss_fn(ad):
            logits, _ = llama.forward(apply_lora(qp, ad), tokens, cfg)
            return jnp.sum(logits.astype(jnp.float32) ** 2)

        jax.grad(loss_fn)(lora)  # must not demand tangents for int qdata


def _step(loss_fn, opt, ad, st):
    l, g = jax.value_and_grad(loss_fn)(ad)
    up, st = opt.update(g, st, ad)
    return optax.apply_updates(ad, up), st, l
