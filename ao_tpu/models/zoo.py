"""Small model zoo for tests and benchmarks.

(ref: torchao/testing/model_architectures.py — ToyLinearModel and friends,
the canonical fixtures every workflow test quantizes.)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ao_tpu.ops import linear


def init_toy_linear(key, k: int = 64, n: int = 32, dtype=jnp.float32):
    """The reference's ToyLinearModel: two linears, no bias."""
    k1, k2 = jax.random.split(key)
    return {
        "linear1": {"kernel": jax.random.normal(k1, (k, n), dtype) * k ** -0.5},
        "linear2": {"kernel": jax.random.normal(k2, (n, k), dtype) * n ** -0.5},
    }


def toy_linear_forward(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    h = linear(x, params["linear1"]["kernel"])
    return linear(h, params["linear2"]["kernel"])


def init_mlp(key, dims=(64, 128, 128, 10), dtype=jnp.float32):
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"layer{i}": {
            "kernel": jax.random.normal(keys[i], (dims[i], dims[i + 1]), dtype)
            * dims[i] ** -0.5,
            "bias": jnp.zeros((dims[i + 1],), dtype),
        }
        for i in range(len(dims) - 1)
    }


def mlp_forward(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    n = len(params)
    for i in range(n):
        layer = params[f"layer{i}"]
        x = linear(x, layer["kernel"], layer["bias"])
        if i < n - 1:
            x = jax.nn.relu(x)
    return x
