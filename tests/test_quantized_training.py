"""Quantized-training prototype tests: int8 SR master weights, int8
mixed-precision matmul grads, BitNet ternary training.

(ref analog: test/prototype/test_quantized_training.py — SR unbiasedness,
compile parity, and small-model convergence checks.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import ao_tpu
from ao_tpu.ops import linear
from ao_tpu.training.quantized_training import (
    Int8TrainingWeight,
    apply_updates_int8_sr,
    bitnet_linear,
    int8_mixed_precision_matmul,
    int8_sr_quantize,
)

sqnr = ao_tpu.compute_error


class TestInt8SR:
    def test_stochastic_rounding_unbiased(self):
        w = jnp.full((64, 8), 0.3, jnp.float32)
        # value exactly between grid points accumulates correctly in mean
        keys = jax.random.split(jax.random.PRNGKey(0), 200)
        deq = jnp.stack([
            Int8TrainingWeight.from_hp(w, k).dequantize(jnp.float32)
            for k in keys[:50]
        ])
        est = jnp.mean(deq, axis=0)
        np.testing.assert_allclose(np.asarray(est), 0.3, atol=5e-3)

    def test_training_tracks_fp32(self):
        """Train y = x @ w on a quadratic; int8-SR weights must follow the
        fp32 trajectory closely (the whole point of SR)."""
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        w_true = jax.random.normal(k1, (16, 4), jnp.float32)
        x = jax.random.normal(k2, (256, 16), jnp.float32)
        y = x @ w_true

        def loss_fn(w_dq):
            return jnp.mean((x @ w_dq - y) ** 2)

        w_fp = jnp.zeros((16, 4), jnp.float32)
        w_q = Int8TrainingWeight.from_hp(w_fp, k3)
        lr = 0.05
        for i in range(120):
            g_fp = jax.grad(loss_fn)(w_fp)
            w_fp = w_fp - lr * g_fp
            g_q = jax.grad(loss_fn)(w_q.dequantize(jnp.float32))
            w_q = apply_updates_int8_sr(
                w_q, -lr * g_q, jax.random.fold_in(k3, i)
            )
        l_fp = float(loss_fn(w_fp))
        l_q = float(loss_fn(w_q.dequantize(jnp.float32)))
        l_init = float(loss_fn(jnp.zeros((16, 4))))
        assert l_fp < l_init * 0.01  # fp32 converged
        assert l_q < l_fp * 1.5, (l_fp, l_q)  # int8-SR tracks fp32

    def test_linear_dispatch(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16), jnp.float32)
        qw = Int8TrainingWeight.from_hp(w)
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 32), jnp.float32)
        assert sqnr(x @ w, linear(x, qw)) > 25


class TestInt8MixedPrecision:
    def test_forward_sqnr(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (128, 96), jnp.float32)
        y = int8_mixed_precision_matmul(x, w)
        assert sqnr(x @ w, y) > 25

    def test_grads_close_to_hp(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (64, 128), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(3), (128, 96), jnp.float32)
        gx_q, gw_q = jax.grad(
            lambda x, w: jnp.sum(int8_mixed_precision_matmul(x, w) ** 2),
            argnums=(0, 1),
        )(x, w)
        gx, gw = jax.grad(
            lambda x, w: jnp.sum((x @ w) ** 2), argnums=(0, 1)
        )(x, w)
        assert sqnr(gx, gx_q) > 18
        assert sqnr(gw, gw_q) > 18


class TestBitNet:
    def test_forward_is_ternary_scaled(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 32), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16), jnp.float32)
        y = bitnet_linear(x, w)
        assert y.shape == (8, 16)
        # sanity: correlated with hp output even at 1.58 bits
        assert sqnr(x @ w, y) > 2

    def test_ste_gradients_match_hp(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 32), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(3), (32, 16), jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(4), (8, 16), jnp.float32)
        gx, gw = jax.vjp(lambda x, w: bitnet_linear(x, w), x, w)[1](g)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(g @ w.T),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(x.T @ g),
                                   rtol=1e-4)

    def test_tiny_model_trains(self):
        """2-layer BitNet MLP learns XOR-ish separation."""
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (128, 8), jnp.float32)
        y = (jnp.sum(x[:, :4], axis=1) > jnp.sum(x[:, 4:], axis=1)).astype(
            jnp.float32
        )

        def model(ws, x):
            h = jax.nn.relu(bitnet_linear(x, ws["w1"]))
            return bitnet_linear(h, ws["w2"])[:, 0]

        ws = {
            "w1": jax.random.normal(jax.random.PRNGKey(1), (8, 32)) * 0.3,
            "w2": jax.random.normal(jax.random.PRNGKey(2), (32, 1)) * 0.3,
        }

        def loss(ws):
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(model(ws, x), y)
            )

        opt = optax.adam(3e-2)
        st = opt.init(ws)
        l0 = float(loss(ws))
        step = jax.jit(
            lambda ws, st: (lambda g: opt.update(g, st, ws))(jax.grad(loss)(ws))
        )
        for _ in range(60):
            upd, st = step(ws, st)
            ws = optax.apply_updates(ws, upd)
        assert float(loss(ws)) < l0 * 0.7
