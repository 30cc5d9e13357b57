"""Reusable contract tests for quantization configs.

(ref: torchao/testing/utils.py — ``TorchAOBasicTestCase`` (roundtrip,
linear SQNR), ``TorchAOCompileTestCase`` (compile parity),
``TorchAOIntegrationTestCase`` (serialization/sharding contract). Here one
function runs the whole ladder for a config; the test suite sweeps it over
every registered config so a new format cannot merge half-wired.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import ao_tpu
from ao_tpu.ops import linear
from ao_tpu.quantization.qarrays.base import QuantizedArray


def run_config_contract(
    config,
    k: int = 128,
    n: int = 64,
    min_sqnr: float = 10.0,
    check_serde: bool = True,
    check_checkpoint: bool = True,
    two_step: bool = False,
    calib_batches: int = 2,
) -> QuantizedArray:
    """Quantize → dequant-roundtrip → eager/jit linear parity → config serde
    → checkpoint flatten/unflatten. Returns the quantized leaf."""
    import dataclasses

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (k, n), jnp.float32) * 0.1
    params = {"kernel": w}
    x = jax.random.normal(jax.random.PRNGKey(1), (8, k), jnp.float32)

    if two_step:
        obs = ao_tpu.quantize_(params, dataclasses.replace(config, step="observe"))
        for i in range(calib_batches):
            _ = linear(jax.random.normal(jax.random.PRNGKey(2 + i), (8, k)),
                       obs["kernel"])
        qp = ao_tpu.quantize_(obs, dataclasses.replace(config, step="convert"))
    else:
        qp = ao_tpu.quantize_(params, config)
    qk = qp["kernel"]
    assert isinstance(qk, QuantizedArray), (
        f"{type(config).__name__} did not quantize (got {type(qk).__name__})"
    )

    # 1. dequant roundtrip — skipped for act_pre_scale schemes (AWQ/
    # SmoothQuant fold a scale into the weight; only the linear output is
    # comparable to the original)
    dq = qk.dequantize(jnp.float32)
    assert dq.shape == w.shape
    if getattr(qk, "act_pre_scale", None) is None:
        s = float(ao_tpu.compute_error(w, dq))
        assert s > min_sqnr, f"{type(config).__name__}: roundtrip sqnr {s}"

    # 2. linear, eager vs jit — identical results
    y_eager = linear(x, qk)
    y_jit = jax.jit(linear)(x, qk)
    np.testing.assert_allclose(
        np.asarray(y_eager, np.float32), np.asarray(y_jit, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    s_lin = float(ao_tpu.compute_error(x @ w, y_eager.astype(jnp.float32)))
    assert s_lin > min_sqnr - 3, f"{type(config).__name__}: linear sqnr {s_lin}"

    # 3. double-quantize is a no-op (idempotence)
    if not two_step:
        qp2 = ao_tpu.quantize_(qp, config)
        assert qp2["kernel"] is qk, "double quantize must leave leaves alone"

    # 4. config serde roundtrip
    if check_serde:
        back = ao_tpu.config_from_dict(ao_tpu.config_to_dict(config))
        assert back == config, f"{type(config).__name__} serde mismatch"

    # 5. checkpoint flatten/unflatten roundtrip
    if check_checkpoint:
        tensors, meta = ao_tpu.flatten_quantized_state_dict(qp)
        rp = ao_tpu.unflatten_quantized_state_dict(tensors, meta)
        y2 = linear(x, rp["kernel"])
        np.testing.assert_array_equal(
            np.asarray(y_eager), np.asarray(y2)
        )
    return qk
