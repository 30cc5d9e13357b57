"""PTQ algorithm tests: GPTQ, AWQ, SmoothQuant, HQQ.

The key assertion idiom (matching the reference's test strategy): the
calibrated algorithm must BEAT plain minmax quantization on data with the
structure the algorithm exploits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.algorithms.awq import AWQConfig
from ao_tpu.algorithms.gptq import GPTQConfig, gptq_quantize
from ao_tpu.algorithms.observe import ObservedArray
from ao_tpu.algorithms.smoothquant import SmoothQuantConfig
from ao_tpu.ops import linear
from ao_tpu.quantization.primitives import compute_error
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.int8 import Int8Array

KEY = jax.random.PRNGKey(0)
K, N = 256, 128


def make_data(outlier_channels=True):
    kw, kx = jax.random.split(KEY)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
    x = jax.random.normal(kx, (64, K), jnp.float32)
    if outlier_channels:
        # a few high-magnitude activation channels (the AWQ/SmoothQuant case)
        idx = jax.random.permutation(kx, K)[:8]
        x = x.at[:, idx].mul(20.0)
    return w, x


class TestGPTQ:
    def test_gptq_beats_minmax_int4(self):
        w, x = make_data()
        h = 2.0 * (x.T @ x) / x.shape[0]
        q, s, z = gptq_quantize(w, h, group_size=64, quant_max=15)
        w_dq = jnp.repeat(s, 64, axis=0) * q + jnp.repeat(z, 64, axis=0)
        y_ref = x @ w
        err_gptq = float(compute_error(y_ref, x @ w_dq))

        qmm = Int4Array.from_hp(w, 64)
        err_mm = float(compute_error(y_ref, x @ qmm.dequantize(jnp.float32)))
        assert err_gptq > err_mm, (err_gptq, err_mm)

    def test_observe_convert_flow(self):
        w, x = make_data()
        params = {"layer": {"wq": w}}
        cfg_o = GPTQConfig(ao_tpu.Int4WeightOnlyConfig(group_size=64), step="observe")
        obs = ao_tpu.quantize_(params, cfg_o)
        assert isinstance(obs["layer"]["wq"], ObservedArray)
        for i in range(4):
            _ = linear(x[i * 16 : (i + 1) * 16], obs["layer"]["wq"])
        cfg_c = GPTQConfig(ao_tpu.Int4WeightOnlyConfig(group_size=64), step="convert")
        qp = ao_tpu.quantize_(obs, cfg_c)
        assert isinstance(qp["layer"]["wq"], Int4Array)
        y = linear(x, qp["layer"]["wq"])
        assert float(compute_error(x @ w, y)) > 15.0

    def test_gptq_int8_base(self):
        w, x = make_data()
        params = {"wq": w}
        obs = ao_tpu.quantize_(params, GPTQConfig(ao_tpu.Int8WeightOnlyConfig(), step="observe"))
        _ = linear(x, obs["wq"])
        qp = ao_tpu.quantize_(obs, GPTQConfig(ao_tpu.Int8WeightOnlyConfig(), step="convert"))
        assert isinstance(qp["wq"], Int8Array)
        assert float(compute_error(x @ w, linear(x, qp["wq"]))) > 30.0

    def test_gptq_nvfp4_base(self):
        from ao_tpu.prototype.mx import NVFP4WeightOnlyConfig
        from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array

        w, x = make_data()
        params = {"wq": w}
        obs = ao_tpu.quantize_(
            params, GPTQConfig(NVFP4WeightOnlyConfig(), step="observe"))
        _ = linear(x, obs["wq"])
        qp = ao_tpu.quantize_(
            obs, GPTQConfig(NVFP4WeightOnlyConfig(), step="convert"))
        qw = qp["wq"]
        assert isinstance(qw, NVFP4Array)
        assert qw.scale.dtype == jnp.float8_e4m3fn
        assert qw.per_tensor_scale is not None
        err_gptq = float(compute_error(x @ w, linear(x, qw)))
        assert err_gptq > 10.0, err_gptq
        # Hessian-aware should not lose to plain rounding on the output
        q_rtn = NVFP4Array.from_hp(w)
        err_rtn = float(compute_error(x @ w, linear(x, q_rtn)))
        assert err_gptq > err_rtn - 0.5, (err_gptq, err_rtn)

    def test_gptq_fp8_base(self):
        from ao_tpu.quantization.qarrays.float8 import Float8Array

        w, x = make_data()
        params = {"wq": w}
        obs = ao_tpu.quantize_(
            params,
            GPTQConfig(ao_tpu.Float8WeightOnlyConfig(), step="observe"))
        _ = linear(x, obs["wq"])
        qp = ao_tpu.quantize_(
            obs, GPTQConfig(ao_tpu.Float8WeightOnlyConfig(), step="convert"))
        qw = qp["wq"]
        assert isinstance(qw, Float8Array)
        assert qw.qdata.dtype == jnp.float8_e4m3fn
        assert float(compute_error(x @ w, linear(x, qw))) > 25.0

    def test_gptq_intx_base(self):
        from ao_tpu.quantization.configs import IntxWeightOnlyConfig
        from ao_tpu.quantization.qarrays.intx import IntxArray

        w, x = make_data()
        for bits in (3, 5):
            params = {"wq": w}
            cfg = IntxWeightOnlyConfig(bit_width=bits, group_size=32)
            obs = ao_tpu.quantize_(params, GPTQConfig(cfg, step="observe"))
            _ = linear(x, obs["wq"])
            qp = ao_tpu.quantize_(obs, GPTQConfig(cfg, step="convert"))
            qw = qp["wq"]
            assert isinstance(qw, IntxArray) and qw.bits == bits
            err_gptq = float(compute_error(x @ w, linear(x, qw)))
            qmm = IntxArray.from_hp(w, bits, 32)
            err_mm = float(compute_error(x @ w, linear(x, qmm)))
            assert err_gptq > err_mm - 0.5, (bits, err_gptq, err_mm)

    def test_observer_rejects_jit(self):
        w, _ = make_data()
        obs = ObservedArray.wrap(w, "gptq")
        with pytest.raises(Exception):
            jax.jit(lambda x: linear(x, obs))(jnp.ones((4, K), jnp.bfloat16))


class TestAWQ:
    def test_awq_beats_minmax(self):
        w, x = make_data(outlier_channels=True)
        base = ao_tpu.Int4WeightOnlyConfig(group_size=64)
        params = {"wq": w}
        obs = ao_tpu.quantize_(params, AWQConfig(base, step="observe"))
        for i in range(4):
            _ = linear(x[i * 16 : (i + 1) * 16], obs["wq"])
        qp = ao_tpu.quantize_(obs, AWQConfig(base, step="convert"))
        assert isinstance(qp["wq"], Int4Array)
        assert qp["wq"].act_pre_scale is not None

        y_ref = x @ w
        err_awq = float(compute_error(y_ref, linear(x, qp["wq"])))
        qmm = Int4Array.from_hp(w, 64)
        err_mm = float(compute_error(y_ref, linear(x, qmm)))
        assert err_awq >= err_mm - 0.1, (err_awq, err_mm)


class TestSmoothQuant:
    def test_smoothquant_beats_plain_w8a8(self):
        w, x = make_data(outlier_channels=True)
        base = ao_tpu.Int8DynamicActivationInt8WeightConfig()
        params = {"wq": w}
        obs = ao_tpu.quantize_(params, SmoothQuantConfig(base, step="observe"))
        for i in range(4):
            _ = linear(x[i * 16 : (i + 1) * 16], obs["wq"])
        qp = ao_tpu.quantize_(obs, SmoothQuantConfig(base, step="convert"))
        assert isinstance(qp["wq"], Int8Array)
        assert qp["wq"].act_pre_scale is not None

        y_ref = x @ w
        err_sq = float(compute_error(y_ref, linear(x.astype(jnp.bfloat16), qp["wq"])))
        plain = ao_tpu.quantize_(params, base)
        err_plain = float(compute_error(y_ref, linear(x.astype(jnp.bfloat16), plain["wq"])))
        assert err_sq > err_plain, (err_sq, err_plain)

    def test_config_serde(self):
        cfg = SmoothQuantConfig(ao_tpu.Int8DynamicActivationInt8WeightConfig(), step="convert", alpha=0.6)
        back = ao_tpu.config_from_json(ao_tpu.config_to_json(cfg))
        assert back == cfg
        g = GPTQConfig(ao_tpu.Int4WeightOnlyConfig(group_size=32))
        assert ao_tpu.config_from_json(ao_tpu.config_to_json(g)) == g
