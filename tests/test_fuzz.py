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


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_int4_kv_scatter(seed):
    """Random update windows (scalar + per-slot starts, word-straddling,
    end-clamped) into the word-packed int4 KV cache must reproduce a naive
    unpacked simulation nibble-for-nibble."""
    from ao_tpu.serving.kvcache import QuantKVCache, _unpack_tok_int4

    rng = random.Random(seed)
    B = rng.choice([1, 2, 3])
    T = rng.choice([16, 32, 64])
    H, D = rng.choice([1, 2]), rng.choice([4, 8])
    cache = QuantKVCache.create(B, T, H, D, "int4")
    # shadow state: unpacked nibbles + scales in plain numpy
    shadow_u = np.zeros((B, T, H, D), np.int64)
    shadow_s = np.zeros((B, T, H, 1), np.float32)

    key = jax.random.PRNGKey(seed)
    for step in range(6):
        key, sub = jax.random.split(key)
        S = rng.choice([1, 2, 5, 8, 11])
        x = jax.random.normal(sub, (B, S, H, D), jnp.float32)
        q, s = cache.quantize_values(x)
        qn, sn = np.asarray(q), np.asarray(s)
        if rng.random() < 0.5:
            start = rng.randrange(0, T)  # scalar (may clamp at the end)
            starts = np.full((B,), start)
            cache = cache.update(x, start)
        else:
            starts = np.asarray([rng.randrange(0, T) for _ in range(B)])
            cache = cache.update(x, jnp.asarray(starts, jnp.int32))
        for b in range(B):
            for i in range(S):
                pos = min(starts[b] + i, T - 1)  # clamp-at-last-row rule
                shadow_u[b, pos] = qn[b, i]
                shadow_s[b, pos] = sn[b, i]

    got_u = np.asarray(jax.vmap(_unpack_tok_int4)(cache.qdata))
    np.testing.assert_array_equal(got_u, shadow_u)
    # cache scales are head-major (B, Hkv, T)
    got_s = np.asarray(cache.scale).transpose(0, 2, 1)[..., None]
    np.testing.assert_allclose(got_s, shadow_s, atol=0)
    # and dequantize agrees with the shadow reconstruction
    dq = np.asarray(cache.dequantize(jnp.float32))
    np.testing.assert_allclose(dq, (shadow_u - 8) * shadow_s, atol=1e-6)
