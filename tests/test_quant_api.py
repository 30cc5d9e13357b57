"""quantize_ API + config serde tests.

(ref test model: test/quantization/test_quant_api.py, test/core/test_config.py)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu import (
    Float8DynamicActivationFloat8WeightConfig,
    Float8WeightOnlyConfig,
    FqnToConfig,
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt8WeightConfig,
    Int8WeightOnlyConfig,
    PerBlock,
    PerGroup,
    PerRow,
    PerTensor,
    quantize_,
)
from ao_tpu.ops import linear
from ao_tpu.quantization.primitives import compute_error
from ao_tpu.quantization.qarrays.float8 import Float8Array
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.int8 import Int8Array

KEY = jax.random.PRNGKey(0)


def make_params():
    k1, k2, k3 = jax.random.split(KEY, 3)
    return {
        "layers": [
            {
                "attn": {"wq": jax.random.normal(k1, (256, 128), jnp.float32) * 0.05},
                "mlp": {"kernel": jax.random.normal(k2, (256, 512), jnp.float32) * 0.05},
            }
        ],
        "norm": {"scale": jnp.ones((256,), jnp.float32)},
        "embed": jax.random.normal(k3, (1000, 256), jnp.float32) * 0.05,
    }


class TestQuantizeAPI:
    def test_default_filter_targets_linears(self):
        params = make_params()
        qp = quantize_(params, Int8WeightOnlyConfig())
        assert isinstance(qp["layers"][0]["attn"]["wq"], Int8Array)
        assert isinstance(qp["layers"][0]["mlp"]["kernel"], Int8Array)
        # norm scale (1-D) and embed (not a linear-ish name) untouched
        assert isinstance(qp["norm"]["scale"], jax.Array)
        assert isinstance(qp["embed"], jax.Array)

    def test_custom_filter(self):
        params = make_params()
        qp = quantize_(
            params, Int8WeightOnlyConfig(), filter_fn=lambda fqn, x: "mlp" in fqn
        )
        assert isinstance(qp["layers"][0]["attn"]["wq"], jax.Array)
        assert isinstance(qp["layers"][0]["mlp"]["kernel"], Int8Array)

    @pytest.mark.parametrize(
        "config,cls",
        [
            (Int4WeightOnlyConfig(group_size=64), Int4Array),
            (Int4WeightOnlyConfig(group_size=64, int4_choose_qparams_algorithm="hqq"), Int4Array),
            (Int8WeightOnlyConfig(), Int8Array),
            (Int8DynamicActivationInt8WeightConfig(), Int8Array),
            (ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=64), Int4Array),
            (Float8WeightOnlyConfig(), Float8Array),
            (Float8DynamicActivationFloat8WeightConfig(), Float8Array),
            (Float8DynamicActivationFloat8WeightConfig(granularity=PerTensor()), Float8Array),
            (Float8DynamicActivationFloat8WeightConfig(granularity=PerBlock((128, 128))), Float8Array),
        ],
    )
    def test_all_configs_e2e(self, config, cls):
        params = make_params()
        qp = quantize_(params, config)
        w = qp["layers"][0]["attn"]["wq"]
        assert isinstance(w, cls)
        x = jax.random.normal(KEY, (4, 256), jnp.bfloat16)
        y_ref = x.astype(jnp.float32) @ params["layers"][0]["attn"]["wq"]
        y = linear(x, w)
        assert compute_error(y_ref, y) > 10.0

    def test_fqn_to_config_routing(self):
        params = make_params()
        cfg = FqnToConfig(
            {
                "layers.0.attn.wq": Int4WeightOnlyConfig(group_size=64),
                "re:.*mlp.*": Int8WeightOnlyConfig(),
            }
        )
        qp = quantize_(params, cfg)
        assert isinstance(qp["layers"][0]["attn"]["wq"], Int4Array)
        assert isinstance(qp["layers"][0]["mlp"]["kernel"], Int8Array)

    def test_fqn_default(self):
        params = make_params()
        cfg = FqnToConfig({"_default": Int8WeightOnlyConfig()})
        qp = quantize_(params, cfg)
        assert isinstance(qp["layers"][0]["attn"]["wq"], Int8Array)

    def test_quantized_params_jit_through(self):
        params = make_params()
        qp = quantize_(params, Int4WeightOnlyConfig(group_size=64))

        @jax.jit
        def fwd(qp, x):
            h = linear(x, qp["layers"][0]["attn"]["wq"])
            return h

        x = jax.random.normal(KEY, (4, 256), jnp.bfloat16)
        y = fwd(qp, x)
        assert y.shape == (4, 128)


class TestConfigSerde:
    @pytest.mark.parametrize(
        "config",
        [
            Int4WeightOnlyConfig(group_size=32, int4_choose_qparams_algorithm="hqq"),
            Int8WeightOnlyConfig(granularity=PerGroup(64)),
            Int8DynamicActivationInt8WeightConfig(act_symmetric=False),
            ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=32),
            Float8WeightOnlyConfig(float8_dtype="float8_e5m2"),
            Float8DynamicActivationFloat8WeightConfig(
                granularity=PerBlock((128, 128)), activation_value_ub=1200.0
            ),
        ],
    )
    def test_json_roundtrip(self, config):
        s = ao_tpu.config_to_json(config)
        back = ao_tpu.config_from_json(s)
        assert back == config

    def test_fqn_to_config_roundtrip(self):
        cfg = FqnToConfig(
            {
                "a.b": Int8WeightOnlyConfig(),
                "_default": Int4WeightOnlyConfig(group_size=64),
            }
        )
        back = ao_tpu.config_from_json(ao_tpu.config_to_json(cfg))
        assert back == cfg

    def test_disallowed_module_rejected(self):
        s = ao_tpu.config_to_json(Int8WeightOnlyConfig())
        bad = s.replace("ao_tpu.quantization.configs", "os.path")
        with pytest.raises(Exception):
            ao_tpu.config_from_json(bad)

    def test_version_mismatch_warns(self):
        import json
        import warnings

        d = ao_tpu.config_to_dict(Int8WeightOnlyConfig())
        d["config"]["_version"] = 99
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ao_tpu.config_from_dict(d)
        assert any("version" in str(x.message) for x in w)
