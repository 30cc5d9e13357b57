"""PAT: prune structure INTO a model during training, then deploy it.

Trains a small MLP with (a) column group-Lasso on the hidden layers and
(b) a nuclear-norm prox on the first layer, then shows the two deploy
paths: zeroed-column sparsity stats and low-rank (A @ B) factorization.

python examples/pat_pruning.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# tiny sequential-step demo: CPU avoids 500 device roundtrips
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from ao_tpu.models import zoo
from ao_tpu.training.pat import (
    PruneRule, prune_optimizer, sparsity_summary, to_low_rank,
)


def main():
    key = jax.random.PRNGKey(0)
    params = zoo.init_mlp(key, dims=(64, 128, 128, 10))
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 64))
    # teacher task with redundant capacity: labels come from a NARROW
    # teacher (rank-8 first layer, 32 hidden units), so the 128-wide
    # student has structure worth pruning away
    tk = jax.random.split(jax.random.PRNGKey(2), 3)
    t0 = (jax.random.normal(tk[0], (64, 8)) @
          jax.random.normal(tk[1], (8, 32))) * 64 ** -0.5
    t1 = jax.random.normal(tk[2], (32, 10)) * 32 ** -0.5
    y = jax.nn.one_hot(jnp.argmax(jnp.tanh(x @ t0) @ t1, -1), 10)

    rules = {
        r"layer0": PruneRule(prox="min_rank", min_sparsity=0.75,
                             min_sparsity_schedule=True),
        "layer[12]": PruneRule(prox="min_sparsity", group="dim1",
                               min_sparsity=0.5,
                               min_sparsity_schedule=True),
    }
    lr = 0.05
    opt = prune_optimizer(optax.sgd(lr), rules, learning_rate=lr,
                          warmup_steps=50, healing_start_step=400)

    def loss(p):
        logits = zoo.mlp_forward(p, x)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * y, -1))

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    state = opt.init(params)
    for i in range(500):
        params, state = step(params, state)
        if i % 100 == 99:
            print(f"step {i + 1}: loss {float(loss(params)):.4f}  "
                  f"sparsity {sparsity_summary(params, rules)}")

    # deploy path 1: column sparsity — whole output channels are exactly 0
    w1 = params["layer1"]["kernel"]
    dead = int(jnp.sum(jnp.all(w1 == 0, axis=0)))
    print(f"layer 1: {dead}/{w1.shape[1]} columns pruned to exact zero")

    # deploy path 2: low-rank factorization of the nuclear-norm layer
    a, b = to_low_rank(params["layer0"]["kernel"])
    full = params["layer0"]["kernel"].size
    print(f"layer 0: rank {a.shape[1]}/{min(*params['layer0']['kernel'].shape)}"
          f" -> A@B params {a.size + b.size} vs {full} dense")


if __name__ == "__main__":
    main()
