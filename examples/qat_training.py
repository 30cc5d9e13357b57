"""QAT: prepare (fake-quant) → train → convert to the real PTQ config.

python examples/qat_training.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import ao_tpu
from ao_tpu.models import zoo
from ao_tpu.training.qat import QATConfig


def main():
    key = jax.random.PRNGKey(0)
    params = zoo.init_mlp(key, dims=(64, 128, 128, 10))
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 64))
    y = jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(2), (512,), 0, 10), 10)

    base = ao_tpu.Int4WeightOnlyConfig(group_size=32)
    prep = ao_tpu.quantize_(params, QATConfig(base_config=base, step="prepare"))

    def loss(p):
        return optax.softmax_cross_entropy(zoo.mlp_forward(p, x), y).mean()

    opt = optax.adam(1e-3)
    st = opt.init(prep)

    @jax.jit
    def step(p, st):
        g = jax.grad(loss)(p)
        u, st = opt.update(g, st)
        return optax.apply_updates(p, u), st

    print("initial loss:", float(loss(prep)))
    for _ in range(100):
        prep, st = step(prep, st)
    print("trained loss:", float(loss(prep)))

    final = ao_tpu.quantize_(prep, QATConfig(base_config=base, step="convert"))
    print("converted loss (real int4):", float(loss(final)))


if __name__ == "__main__":
    main()
