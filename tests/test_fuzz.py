"""Shape/config fuzz: random weight shapes through quantize_ + linear must
never crash — they either quantize (finite outputs) or skip cleanly.

(ref analog: the reference's parametrized shape sweeps in its generated
kernel tests; SURVEY §4.5.)
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.ops import linear
from ao_tpu.quantization.qarrays.base import QuantizedArray

CONFIG_MAKERS = [
    lambda rng: ao_tpu.Int4WeightOnlyConfig(
        group_size=rng.choice([32, 64, 128])),
    lambda rng: ao_tpu.Int8WeightOnlyConfig(),
    lambda rng: ao_tpu.Int8DynamicActivationInt4WeightConfig(
        group_size=int(rng.choice([32, 64, 128]))),
    lambda rng: ao_tpu.Int8DynamicActivationInt8WeightConfig(),
    lambda rng: ao_tpu.Float8DynamicActivationFloat8WeightConfig(),
    lambda rng: ao_tpu.SINQConfig(group_size=rng.choice([16, 32, 64])),
    lambda rng: ao_tpu.CodebookWeightOnlyConfig(
        bits=rng.choice([3, 4]), scale_block=rng.choice([16, 32])),
    lambda rng: ao_tpu.GGUFWeightOnlyConfig(),
]


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_quantize_and_linear(seed):
    rng = random.Random(seed)
    k = rng.choice([16, 32, 48, 96, 100, 128, 256, 384])
    n = rng.choice([8, 16, 48, 64, 100, 256])
    m = rng.choice([1, 3, 8, 33])
    cfg = rng.choice(CONFIG_MAKERS)(rng)

    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (k, n), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (m, k), jnp.float32)

    qp = ao_tpu.quantize_({"kernel": w}, cfg)  # must never raise
    qk = qp["kernel"]
    y = linear(x, qk)
    assert y.shape == (m, n)
    assert bool(jnp.all(jnp.isfinite(y))), (k, n, m, type(cfg).__name__)
    if isinstance(qk, QuantizedArray):
        # quantized path must also survive jit and checkpoint flattening
        y2 = jax.jit(linear)(x, qk)
        assert bool(jnp.all(jnp.isfinite(y2)))
        tensors, meta = ao_tpu.flatten_quantized_state_dict(qp)
        back = ao_tpu.unflatten_quantized_state_dict(tensors, meta)
        np.testing.assert_array_equal(
            np.asarray(linear(x, back["kernel"])), np.asarray(y))


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_batched_inputs(seed):
    """3-D/4-D activations through quantized linears."""
    rng = random.Random(100 + seed)
    k, n = 64, 32
    lead = rng.choice([(2, 3), (4,), (1, 2, 2)])
    cfg = rng.choice(CONFIG_MAKERS[:4])(rng)
    w = jax.random.normal(jax.random.PRNGKey(seed), (k, n), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (*lead, k), jnp.float32)
    qp = ao_tpu.quantize_({"kernel": w}, cfg)
    y = linear(x, qp["kernel"])
    assert y.shape == (*lead, n)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_interpret_kernel_vs_emulated(seed):
    """Random shapes through the fused kernels (interpret mode) must match
    the emulated dispatch — covers the magic/magic8/LUT layouts the chip
    suite exercises on hardware."""
    from jax.experimental.pallas import tpu as pltpu

    from ao_tpu.ops import kernels

    rng = random.Random(300 + seed)
    k = rng.choice([128, 256, 384])
    n = rng.choice([128, 256])
    m = rng.choice([1, 3, 8, 17])
    maker = rng.choice([
        lambda: ao_tpu.Int4WeightOnlyConfig(group_size=rng.choice([32, 64])),
        lambda: ao_tpu.Int8DynamicActivationInt4WeightConfig(
            group_size=rng.choice([32, 64])),
        lambda: ao_tpu.NF4WeightOnlyConfig(block_size=32),
        lambda: ao_tpu.CodebookWeightOnlyConfig(bits=4, scale_block=32),
        lambda: ao_tpu.Int8WeightOnlyConfig(),
    ])
    cfg = maker()
    w = jax.random.normal(jax.random.PRNGKey(seed), (k, n), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (m, k), jnp.bfloat16)
    qp = ao_tpu.quantize_({"kernel": w}, cfg)
    if not isinstance(qp["kernel"], QuantizedArray):
        return  # skipped (indivisible) — fine
    ref = linear(x, qp["kernel"]).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        with kernels.backend("pallas"):
            y = linear(x, qp["kernel"]).astype(jnp.float32)
    err = ao_tpu.compute_error(ref, y)
    assert err > 35, (type(cfg).__name__, m, k, n, float(err))
