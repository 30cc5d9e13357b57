"""Static activation calibration tests: observe→convert flow, minmax vs MSE
observers, fp8 and int8 static paths.

(ref analog: test_observer.py + the static config rows of test_quant_api.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.algorithms.static_quant import StaticQuantConfig, mse_optimal_amax
from ao_tpu.ops import linear
from ao_tpu.quantization.configs import (
    Float8StaticActivationFloat8WeightConfig,
    Int8StaticActivationInt8WeightConfig,
)

sqnr = ao_tpu.compute_error


def _calibrated(base, observer="minmax", outlier=False):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (64, 32), jnp.float32)
    params = {"kernel": w}
    cfg = StaticQuantConfig(base_config=base, observer=observer)
    obs = ao_tpu.quantize_(params, dataclasses.replace(cfg, step="observe"))
    for i in range(4):
        x = jax.random.normal(jax.random.PRNGKey(i + 1), (16, 64))
        if outlier and i == 2:
            x = x.at[0, 0].set(80.0)  # one wild outlier
        _ = linear(x, obs["kernel"])
    qp = ao_tpu.quantize_(obs, dataclasses.replace(cfg, step="convert"))
    return w, qp["kernel"]


class TestStaticCalibration:
    def test_int8_static_flow(self):
        w, qk = _calibrated(Int8StaticActivationInt8WeightConfig())
        assert qk.act_scale is not None
        x = jax.random.normal(jax.random.PRNGKey(9), (8, 64))
        assert sqnr(x @ w, linear(x, qk)) > 18

    def test_fp8_static_flow(self):
        w, qk = _calibrated(Float8StaticActivationFloat8WeightConfig())
        assert qk.act_scale is not None
        x = jax.random.normal(jax.random.PRNGKey(9), (8, 64))
        assert sqnr(x @ w, linear(x, qk)) > 18

    def test_mse_beats_minmax_with_outliers(self):
        w, qk_mm = _calibrated(
            Int8StaticActivationInt8WeightConfig(), "minmax", outlier=True
        )
        _, qk_mse = _calibrated(
            Int8StaticActivationInt8WeightConfig(), "mse", outlier=True
        )
        # MSE clips the outlier → smaller scale
        assert float(qk_mse.act_scale) < float(qk_mm.act_scale)
        x = jax.random.normal(jax.random.PRNGKey(9), (32, 64))
        s_mm = sqnr(x @ w, linear(x, qk_mm))
        s_mse = sqnr(x @ w, linear(x, qk_mse))
        assert s_mse > s_mm, (float(s_mm), float(s_mse))

    def test_convert_without_calibration_raises(self):
        params = {"kernel": jnp.ones((8, 8))}
        cfg = StaticQuantConfig(Int8StaticActivationInt8WeightConfig())
        obs = ao_tpu.quantize_(params, cfg)
        with pytest.raises(ValueError, match="before any calibration"):
            ao_tpu.quantize_(obs, dataclasses.replace(cfg, step="convert"))

    def test_mse_optimal_amax_clips_outlier(self):
        x = jnp.concatenate([jax.random.normal(jax.random.PRNGKey(0), (4096,)),
                             jnp.array([100.0])])
        best = mse_optimal_amax(x, jnp.max(jnp.abs(x)), 127.0)
        assert float(best) < 100.0
