"""fp8 training composed with data/tensor parallelism on the CPU mesh —
distributed numerics must match the single-device fp8 model.

(ref analog: test/float8/test_fsdp2/test_fsdp2.py and test_dtensor.sh —
FSDP2/TP fp8 training checked against a single-device reference; SURVEY
§3.4 call stack.)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import ao_tpu
from ao_tpu.training.float8 import (
    Float8TrainingRecipe,
    convert_to_float8_training,
    fp8_matmul,
    unwrap_float8_training,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _data(key, n=64, din=32, dout=16):
    x = jax.random.normal(key, (n, din), jnp.float32)
    w_true = jax.random.normal(jax.random.fold_in(key, 1), (din, dout))
    y = x @ w_true
    return x, y


class TestFp8TrainingDistributed:
    def test_dp_matches_single_device(self):
        """fp8 training step under dp sharding == single-device step."""
        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        key = jax.random.PRNGKey(0)
        x, y = _data(key)
        params = {"linear": {"kernel": jax.random.normal(
            jax.random.PRNGKey(2), (32, 16)) * 0.1}}
        recipe = Float8TrainingRecipe("rowwise")
        fp8p = convert_to_float8_training(params, recipe)

        def loss_fn(p, x, y):
            from ao_tpu.ops import linear

            return jnp.mean((linear(x, p["linear"]["kernel"]) - y) ** 2)

        g_single = jax.grad(loss_fn)(fp8p, x, y)

        xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
        ys = jax.device_put(y, NamedSharding(mesh, P("dp", None)))
        g_dp = jax.jit(jax.grad(loss_fn))(fp8p, xs, ys)

        np.testing.assert_allclose(
            np.asarray(g_dp["linear"]["kernel"].weight),
            np.asarray(g_single["linear"]["kernel"].weight),
            rtol=2e-2, atol=2e-3,
        )

    def test_tp_colwise_fp8_matmul(self):
        """fp8 custom-vjp matmul with the weight column-sharded under
        shard_map: forward and weight grads match the unsharded run."""
        mesh = Mesh(np.array(jax.devices()[:8]), ("tp",))
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 32), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 64), jnp.float32) * 0.1
        recipe = Float8TrainingRecipe("rowwise")

        def loss(x, w):
            return jnp.sum(fp8_matmul(x, w, recipe) ** 2)

        ref_y = fp8_matmul(x, w, recipe)
        ref_gw = jax.grad(loss, argnums=1)(x, w)

        ws = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(P(None), P(None, "tp")),
            out_specs=(P(None, "tp"), P(None, "tp")), check_vma=False,
        )
        def tp_fwd_bwd(x, wl):
            y = fp8_matmul(x, wl, recipe)
            gw = jax.grad(lambda w_: jnp.sum(fp8_matmul(x, w_, recipe) ** 2))(wl)
            return y, gw

        y_tp, gw_tp = tp_fwd_bwd(x, ws)
        # per-shard rowwise casts == unsharded rowwise casts (scales are
        # per-row along the contraction dim, unaffected by the N split)
        np.testing.assert_allclose(np.asarray(y_tp), np.asarray(ref_y),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(gw_tp), np.asarray(ref_gw),
                                   rtol=2e-2, atol=2e-1)

    def test_fp8_training_then_ptq_roundtrip(self):
        """train fp8 → unwrap → PTQ int8: the reference's train-then-serve
        flow (§3.4 + §3.1 composed)."""
        key = jax.random.PRNGKey(0)
        x, y = _data(key)
        params = {"linear": {"kernel": jnp.zeros((32, 16))}}
        fp8p = convert_to_float8_training(params, Float8TrainingRecipe("rowwise"))
        opt = optax.adam(5e-2)
        st = opt.init(fp8p)

        def loss_fn(p):
            from ao_tpu.ops import linear

            return jnp.mean((linear(x, p["linear"]["kernel"]) - y) ** 2)

        @jax.jit
        def step(p, st):
            g = jax.grad(loss_fn)(p)
            u, st = opt.update(g, st, p)
            return optax.apply_updates(p, u), st

        l0 = float(loss_fn(fp8p))
        for _ in range(60):
            fp8p, st = step(fp8p, st)
        assert float(loss_fn(fp8p)) < l0 * 0.1

        hp = unwrap_float8_training(fp8p)
        qp = ao_tpu.quantize_(hp, ao_tpu.Int8WeightOnlyConfig())
        from ao_tpu.quantization.qarrays.int8 import Int8Array

        assert isinstance(qp["linear"]["kernel"], Int8Array)
        assert float(loss_fn(qp)) < l0 * 0.2
