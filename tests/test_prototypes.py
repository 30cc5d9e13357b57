"""Tests for the remaining prototype components: supermask, weight-norm
sparsifier, tensor conversion, mixed-precision search, PARQ.

(ref analog: test/sparsity/test_supermask.py, test/prototype/test_parq.py,
test/prototype/test_mixed_precision.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import ao_tpu
from ao_tpu.algorithms.mixed_precision import assign_greedy, sensitivity_search
from ao_tpu.integrations.convert import convert_params, convert_qarray
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.sparsity.supermask import (
    apply_supermask,
    binarize_topk,
    init_supermask_scores,
    supermask_linear,
    weight_norm_sparsify_2to4,
)
from ao_tpu.training.parq import (
    make_fake_quant_int,
    make_fake_quant_ternary,
    parq_optimizer,
)

sqnr = ao_tpu.compute_error


class TestSupermask:
    def test_mask_keeps_fraction(self):
        s = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
        m = binarize_topk(s, 0.75)
        assert abs(float(m.mean()) - 0.25) < 0.01

    def test_ste_grads_flow_to_scores(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
        scores = init_supermask_scores(jax.random.PRNGKey(3), w)

        def loss(scores):
            return jnp.sum(supermask_linear(x, w, scores, 0.5) ** 2)

        g = jax.grad(loss)(scores)
        assert float(jnp.abs(g).sum()) > 0

    def test_training_learns_useful_mask(self):
        """Scores should learn to keep the columns that matter."""
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (16, 8))
        x = jax.random.normal(jax.random.PRNGKey(1), (128, 16))
        y = x @ w  # target uses the full weight

        scores = init_supermask_scores(jax.random.PRNGKey(2), w)
        opt = optax.adam(1e-2)
        st = opt.init(scores)

        def loss(s):
            return jnp.mean((supermask_linear(x, w, s, 0.5) - y) ** 2)

        l0 = float(loss(scores))
        for _ in range(100):
            g = jax.grad(loss)(scores)
            upd, st = opt.update(g, st)
            scores = optax.apply_updates(scores, upd)
        assert float(loss(scores)) < l0
        baked = apply_supermask(w, scores, 0.5)
        assert float((baked != 0).mean()) == pytest.approx(0.5, abs=0.02)

    def test_weight_norm_2to4(self):
        w = jax.random.normal(jax.random.PRNGKey(4), (64, 32))
        wm, mask = weight_norm_sparsify_2to4(w)
        mg = np.asarray(mask).reshape(16, 4, 32)
        np.testing.assert_array_equal(mg.sum(1), 2)
        # kept entries are the 2 largest |w| of each group
        wg = np.abs(np.asarray(w)).reshape(16, 4, 32)
        kept = np.take_along_axis(wg, np.argsort(~mg.astype(bool), axis=1)[:, :2], 1)
        assert (np.asarray(wm) == np.where(np.asarray(mask), np.asarray(w), 0)).all()


class TestConvert:
    def test_int8_to_int4(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
        q8 = Int8Array.from_hp(w, block_size=(64, 1))
        q4 = convert_qarray(q8, ao_tpu.Int4WeightOnlyConfig(group_size=32))
        assert isinstance(q4, Int4Array)
        assert sqnr(w, q4.dequantize(jnp.float32)) > 12

    def test_tree_convert(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (64, 32), jnp.float32)
        qp = ao_tpu.quantize_({"kernel": w}, ao_tpu.Int4WeightOnlyConfig(group_size=32))
        out = convert_params(qp, ao_tpu.Int8WeightOnlyConfig())
        assert isinstance(out["kernel"], Int8Array)


class TestMixedPrecision:
    def test_search_and_assign(self):
        key = jax.random.PRNGKey(0)
        params = {
            "a": {"kernel": jax.random.normal(key, (32, 32))},
            # layer b has outliers → more sensitive to low bits
            "b": {"kernel": jax.random.normal(jax.random.PRNGKey(1), (32, 32))
                  * (1 + 30 * (jnp.arange(32) % 9 == 0))},
        }
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 32))

        def run(p):
            from ao_tpu.ops import linear
            return linear(linear(x, p["a"]["kernel"]), p["b"]["kernel"])

        configs = {
            "int4": ao_tpu.Int4WeightOnlyConfig(group_size=32),
            "int8": ao_tpu.Int8WeightOnlyConfig(),
        }
        table = sensitivity_search(params, run, configs)
        assert set(table) == {"a.kernel", "b.kernel"}
        assert all(set(r) == {"int4", "int8"} for r in table.values())
        # int8 always at least as good as int4
        for r in table.values():
            assert r["int8"] > r["int4"]

        routing = assign_greedy(
            table, configs, {"int4": 4.0, "int8": 8.0},
            budget_bits_per_weight=6.0,
        )
        picked = {f: type(c).__name__ for f, c in routing.fqn_to_config.items()}
        # budget of 6 bits avg over 2 equal layers → exactly one upgrades,
        # and it must be the more sensitive one (lower int4 sqnr)
        worse = min(table, key=lambda f: table[f]["int4"])
        assert picked[worse] == "Int8WeightOnlyConfig"
        assert sum(v == "Int8WeightOnlyConfig" for v in picked.values()) == 1

        qp = ao_tpu.quantize_(params, routing)
        out = run(qp)
        assert sqnr(run(params), out) > 10


class TestPARQ:
    def test_lambda_one_lands_on_grid(self):
        w = {"kernel": jax.random.normal(jax.random.PRNGKey(0), (16, 8))}
        fq = make_fake_quant_int(4)
        opt = parq_optimizer(
            optax.sgd(0.0), lambda_schedule=lambda s: 1.0, quant_fn=fq
        )
        st = opt.init(w)
        upd, st = opt.update(jax.tree.map(jnp.zeros_like, w), st, w)
        w2 = optax.apply_updates(w, upd)
        np.testing.assert_allclose(
            np.asarray(w2["kernel"]), np.asarray(fq(w["kernel"])), rtol=1e-6
        )

    def test_lambda_zero_is_inner_optimizer(self):
        w = {"kernel": jnp.ones((8, 4))}
        g = {"kernel": jnp.full((8, 4), 0.5)}
        opt = parq_optimizer(optax.sgd(0.1), lambda_schedule=lambda s: 0.0)
        st = opt.init(w)
        upd, _ = opt.update(g, st, w)
        np.testing.assert_allclose(np.asarray(upd["kernel"]), -0.05, rtol=1e-6)

    def test_ramp_trains_to_quantized_solution(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (256, 16))
        w_true = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
        y = x @ make_fake_quant_int(4)(w_true)  # target on the grid

        params = {"w": jnp.zeros((16, 4))}
        sched = optax.linear_schedule(0.0, 1.0, 150)
        opt = parq_optimizer(optax.adam(2e-2), sched,
                             quant_fn=make_fake_quant_int(4))
        st = opt.init(params)

        def loss(p):
            return jnp.mean((x @ p["w"] - y) ** 2)

        @jax.jit
        def step(p, st):
            g = jax.grad(loss)(p)
            upd, st = opt.update(g, st, p)
            return optax.apply_updates(p, upd), st

        for _ in range(250):
            params, st = step(params, st)
        # final weights sit exactly on their own int4 grid
        fq = make_fake_quant_int(4)
        np.testing.assert_allclose(
            np.asarray(params["w"]), np.asarray(fq(params["w"])), atol=1e-6
        )
        # converged near the quantized solution (initial loss ≈ 19)
        assert float(loss(params)) < 0.3

    def test_ternary_grid(self):
        w = jax.random.normal(jax.random.PRNGKey(5), (32, 8))
        t = make_fake_quant_ternary()(w)
        vals = np.unique(np.round(np.asarray(t), 6))
        assert len(vals) <= 3


class TestParetoQ:
    def test_ternary_recipe_lands_on_ternary_grid(self):
        from ao_tpu.training.parq import paretoq_optimizer

        x = jax.random.normal(jax.random.PRNGKey(0), (128, 16))
        w_true = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
        y = x @ w_true
        params = {"w": jnp.zeros((16, 4))}
        opt = paretoq_optimizer(optax.adam(2e-2), bits=2, total_steps=100)
        st = opt.init(params)

        def loss(p):
            return jnp.mean((x @ p["w"] - y) ** 2)

        @jax.jit
        def step(p, st):
            g = jax.grad(loss)(p)
            u, st = opt.update(g, st, p)
            return optax.apply_updates(p, u), st

        for _ in range(120):
            params, st = step(params, st)
        w = np.asarray(params["w"])
        vals = np.unique(np.round(w, 5))
        assert len(vals) <= 3, vals  # ternary grid
