"""PAT (pruning-aware training) tests.

(ref test model: reference prototype/pat — proximal sparsity/low-rank
induction during training, warmup / healing phases, hard constraints.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ao_tpu.training.pat import (
    PruneRule,
    prune_optimizer,
    sparsity_summary,
    to_low_rank,
)

KEY = jax.random.PRNGKey(0)


def _train(params, opt, loss_fn, steps, jit=True):
    state = opt.init(params)

    def step(params, state):
        g = jax.grad(loss_fn)(params)
        upd, state = opt.update(g, state, params)
        return optax.apply_updates(params, upd), state

    if jit:
        step = jax.jit(step)
    for _ in range(steps):
        params, state = step(params, state)
    return params, state


def _noisy_feature_problem():
    """Linear regression where only the first 8 of 32 input features carry
    signal — group lasso over input rows should zero the noise rows."""
    k1, k2 = jax.random.split(KEY)
    x = jax.random.normal(k1, (256, 32))
    w_true = jnp.zeros((32, 4)).at[:8].set(
        jax.random.normal(k2, (8, 4)))
    y = x @ w_true
    params = {"lin": {"kernel": jnp.ones((32, 4)) * 0.1}}

    def loss(p):
        return jnp.mean((x @ p["lin"]["kernel"] - y) ** 2)

    return params, loss


class TestProxSparsity:
    def test_group_lasso_dim0_prunes_noise_rows(self):
        params, loss = _noisy_feature_problem()
        opt = prune_optimizer(
            optax.sgd(0.05),
            PruneRule(prox="group_lasso", group="dim0", reg_lambda=2e-3),
            learning_rate=0.05,
        )
        trained, _ = _train(params, opt, loss, 400)
        w = np.asarray(trained["lin"]["kernel"])
        row_norms = np.linalg.norm(w, axis=1)
        assert (row_norms[8:] == 0).mean() > 0.75  # noise rows pruned
        assert (row_norms[:8] > 0).all()           # signal rows kept
        assert loss(trained) < 0.05

    def test_lasso_elementwise_sparsifies(self):
        params, loss = _noisy_feature_problem()
        opt = prune_optimizer(
            optax.sgd(0.05),
            PruneRule(prox="lasso", group="elem", reg_lambda=5e-3),
            learning_rate=0.05,
        )
        trained, _ = _train(params, opt, loss, 400)
        w = np.asarray(trained["lin"]["kernel"])
        assert (w == 0).mean() > 0.4

    def test_warmup_no_pruning(self):
        params, loss = _noisy_feature_problem()
        opt = prune_optimizer(
            optax.sgd(0.05),
            PruneRule(prox="lasso", group="elem", reg_lambda=1e6),
            learning_rate=0.05, warmup_steps=10,
        )
        trained, _ = _train(params, opt, loss, 5)
        assert (np.asarray(trained["lin"]["kernel"]) != 0).all()

    def test_healing_freezes_mask(self):
        params, loss = _noisy_feature_problem()
        opt = prune_optimizer(
            optax.sgd(0.05),
            PruneRule(prox="group_lasso", group="dim0", reg_lambda=2e-3),
            learning_rate=0.05, healing_start_step=200,
        )
        trained, state = _train(params, opt, loss, 200)
        mask_at_heal = np.asarray(trained["lin"]["kernel"]) != 0
        # 100 more steps of healing FROM THE SAME STATE (phases line up):
        # zeros stay zero, survivors keep moving
        st = state
        p = trained

        def step(p, st):
            g = jax.grad(loss)(p)
            u, st = opt.update(g, st, p)
            return optax.apply_updates(p, u), st

        stepj = jax.jit(step)
        for _ in range(100):
            p, st = stepj(p, st)
        w2 = np.asarray(p["lin"]["kernel"])
        assert (w2[~mask_at_heal] == 0).all()
        assert not np.allclose(w2[mask_at_heal],
                               np.asarray(trained["lin"]["kernel"])[mask_at_heal])

    def test_nm_sparse_pattern(self):
        params, loss = _noisy_feature_problem()
        opt = prune_optimizer(
            optax.sgd(0.02),
            PruneRule(prox="nm_sparse", n_nonzero=2, block_m=4),
            learning_rate=0.02,
        )
        trained, _ = _train(params, opt, loss, 50)
        w = np.asarray(trained["lin"]["kernel"])
        blocks = (w != 0).reshape(-1, 4, w.shape[1]).sum(axis=1)
        assert (blocks <= 2).all()

    def test_min_sparsity_ramp_hits_target(self):
        params, loss = _noisy_feature_problem()
        opt = prune_optimizer(
            optax.sgd(0.02),
            PruneRule(prox="min_sparsity", group="dim0", min_sparsity=0.5,
                      min_sparsity_schedule=True),
            learning_rate=0.02, healing_start_step=100,
        )
        trained, _ = _train(params, opt, loss, 120)
        row_norms = np.linalg.norm(np.asarray(trained["lin"]["kernel"]),
                                   axis=1)
        assert (row_norms == 0).mean() >= 0.45


class TestLowRank:
    def test_nuclear_norm_reduces_rank(self):
        k1, k2 = jax.random.split(KEY)
        # rank-2 ground truth observed through random projections
        w_true = (jax.random.normal(k1, (16, 2))
                  @ jax.random.normal(k2, (2, 16)))
        x = jax.random.normal(KEY, (128, 16))
        y = x @ w_true
        params = {"w": jnp.zeros((16, 16))}
        opt = prune_optimizer(
            optax.sgd(0.05), PruneRule(prox="nuclear_norm", reg_lambda=5e-3),
            learning_rate=0.05)
        trained, _ = _train(
            params, opt, lambda p: jnp.mean((x @ p["w"] - y) ** 2), 400)
        s = np.linalg.svd(np.asarray(trained["w"]), compute_uv=False)
        assert (s > 1e-4 * s[0]).sum() <= 6  # far below full rank 16
        rel = float(jnp.mean((x @ trained["w"] - y) ** 2)
                    / jnp.mean(y ** 2))
        assert rel < 0.05

    def test_min_rank_holds_through_healing(self):
        """min_rank reapplies its projection during healing (dense low-rank
        weights have no zeros for an elementwise mask to freeze)."""
        k1, k2 = jax.random.split(KEY)
        w_true = (jax.random.normal(k1, (16, 2))
                  @ jax.random.normal(k2, (2, 16)))
        x = jax.random.normal(KEY, (128, 16))
        y = x @ w_true
        params = {"w": jnp.zeros((16, 16))}
        opt = prune_optimizer(
            optax.sgd(0.05),
            PruneRule(prox="min_rank", min_sparsity=0.75,
                      min_sparsity_schedule=True),
            learning_rate=0.05, healing_start_step=100)
        trained, _ = _train(
            params, opt, lambda p: jnp.mean((x @ p["w"] - y) ** 2), 200)
        s = np.linalg.svd(np.asarray(trained["w"]), compute_uv=False)
        assert (s > 1e-6 * s[0]).sum() <= 4  # 25% of 16 kept, after healing

    def test_to_low_rank_roundtrip(self):
        k1, k2 = jax.random.split(KEY)
        w = (jax.random.normal(k1, (32, 3))
             @ jax.random.normal(k2, (3, 24))).astype(jnp.float32)
        a, b = to_low_rank(w, rank=3)
        assert a.shape == (32, 3) and b.shape == (3, 24)
        assert np.allclose(np.asarray(a @ b), np.asarray(w), atol=1e-4)
        a2, b2 = to_low_rank(w)  # auto rank from spectrum
        assert a2.shape[1] == 3


class TestRouting:
    def test_regex_rules_route_by_fqn(self):
        params = {
            "mlp": {"kernel": jnp.ones((16, 8))},
            "attn": {"kernel": jnp.ones((16, 8))},
            "norm": {"scale": jnp.ones((16,))},
        }
        opt = prune_optimizer(
            optax.sgd(0.1),
            {"mlp": PruneRule(prox="lasso", group="elem", reg_lambda=1e3)},
            learning_rate=0.1,
        )
        g = jax.tree_util.tree_map(jnp.zeros_like, params)
        state = opt.init(params)
        upd, state = opt.update(g, state, params)
        p2 = optax.apply_updates(params, upd)
        assert (np.asarray(p2["mlp"]["kernel"]) == 0).all()
        assert (np.asarray(p2["attn"]["kernel"]) == 1).all()  # unmatched
        assert (np.asarray(p2["norm"]["scale"]) == 1).all()   # 1-D skipped

    def test_sparsity_summary(self):
        params = {"a": jnp.zeros((8, 4)).at[:2].set(1.0)}
        s = sparsity_summary(params, PruneRule(prox="group_lasso",
                                               group="dim0"))
        assert abs(s["a"] - 0.75) < 1e-6

    def test_invalid_rule_raises(self):
        with pytest.raises(ValueError):
            PruneRule(prox="nope")
        with pytest.raises(ValueError):
            PruneRule(prox="min_sparsity")  # missing min_sparsity
