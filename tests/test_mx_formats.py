"""MX (MXFP8/MXFP6/MXFP4) and NVFP4 format tests.

(ref test model: test/prototype/mx_formats/test_mx_tensor.py — roundtrip
SQNR bounds per element dtype, scale-mode behavior, linear correctness.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.ops import linear
from ao_tpu.prototype.mx import (
    MXDynamicActivationMXWeightConfig,
    MXWeightOnlyConfig,
    NVFP4DynamicActivationNVFP4WeightConfig,
    NVFP4WeightOnlyConfig,
)
from ao_tpu.quantization.primitives import compute_error
from ao_tpu.quantization.qarrays.fp4 import decode_fp4_e2m1, encode_fp4_e2m1
from ao_tpu.quantization.qarrays.mx import MXArray, to_mx
from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array

KEY = jax.random.PRNGKey(3)


def weights(k=256, n=128):
    return jax.random.normal(KEY, (k, n), jnp.float32) * 0.05


class TestFP4Codec:
    def test_all_codes_roundtrip(self):
        codes = jnp.arange(16, dtype=jnp.uint8).reshape(4, 4)
        vals = decode_fp4_e2m1(codes)
        back = encode_fp4_e2m1(vals)
        # note: -0.0 encodes to 0x8, 0.0 to 0x0 — both decode to 0
        np.testing.assert_array_equal(
            np.asarray(decode_fp4_e2m1(back)), np.asarray(vals)
        )

    def test_grid_values(self):
        vals = decode_fp4_e2m1(jnp.arange(8, dtype=jnp.uint8))
        np.testing.assert_allclose(
            np.asarray(vals), [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]
        )

    def test_rounding_matches_native_cast(self):
        x = jax.random.normal(KEY, (128,), jnp.float32) * 3
        codes = encode_fp4_e2m1(x)
        ours = decode_fp4_e2m1(codes)
        native = jnp.clip(x, -6, 6).astype(jnp.float4_e2m1fn).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(native))


class TestMX:
    @pytest.mark.parametrize(
        "elem,thresh",
        [
            ("float8_e4m3fn", 20.0),
            ("float8_e5m2", 15.0),
            ("float6_e2m3", 16.0),
            ("float6_e3m2", 12.0),
            ("float4_e2m1fn", 7.0),
        ],
    )
    def test_roundtrip_sqnr(self, elem, thresh):
        w = weights()
        qw = MXArray.from_hp(w, elem_dtype=elem)
        assert qw.scale.dtype == jnp.uint8  # e8m0 byte (biased exponent)
        err = float(compute_error(w, qw.dequantize(jnp.float32)))
        assert err > thresh, f"{elem}: {err}"

    @pytest.mark.parametrize("elem", ["float6_e2m3", "float6_e3m2"])
    def test_fp6_pack_roundtrip_and_bytes(self, elem):
        from ao_tpu.quantization.qarrays.fp6 import (
            decode_fp6,
            encode_fp6,
            pack_fp6,
            unpack_fp6,
        )
        from ao_tpu.quantization.qarrays.mx import _snap_fp6

        w = weights(256, 128)
        snapped = np.asarray(_snap_fp6(w * 40.0, elem))  # exercise full range
        codes = encode_fp6(jnp.asarray(snapped), elem)
        # encode/decode reproduces every snapped value exactly
        np.testing.assert_array_equal(
            np.asarray(decode_fp6(codes, elem)), snapped)
        packed = pack_fp6(codes, axis=0)
        assert packed.shape == (192, 128)  # 3/4 of 256 rows
        np.testing.assert_array_equal(
            np.asarray(unpack_fp6(packed, axis=0)), np.asarray(codes))

        # container: packed fp6 bytes = 0.75x the fp8 container
        q8 = MXArray.from_hp(w, elem_dtype="float8_e4m3fn")
        q6 = MXArray.from_hp(w, elem_dtype=elem)
        assert q6.qdata.dtype == jnp.uint8
        assert q6.qdata.size * 4 == q8.qdata.size * 3
        err = float(compute_error(w, q6.dequantize(jnp.float32)))
        assert err > (26.0 if elem == "float6_e2m3" else 23.0), err

    def test_fp4_magic_pack_roundtrip(self):
        from ao_tpu.quantization.qarrays.fp4 import (
            pack_fp4_magic,
            unpack_fp4_magic,
        )

        codes = jnp.asarray(
            np.random.default_rng(0).integers(0, 16, (256, 128)), jnp.uint8)
        word = pack_fp4_magic(codes)
        assert word.shape == (32, 128) and word.dtype == jnp.int32
        back = unpack_fp4_magic(word)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))

    def test_fp4_magic_layout_dequant_matches_halves(self):
        w = weights(256, 128)
        qm = MXArray.from_hp(w, elem_dtype="float4_e2m1fn")
        assert qm.layout == "magic"
        # 3-D weights fall back to the split-half byte layout
        q3 = MXArray.from_hp(w[None], elem_dtype="float4_e2m1fn")
        assert q3.layout == "halves"
        np.testing.assert_array_equal(
            np.asarray(qm.dequantize(jnp.float32)),
            np.asarray(q3.dequantize(jnp.float32))[0],
        )

    def test_scale_is_power_of_two(self):
        from ao_tpu.quantization.qarrays.mx import e8m0_decode

        w = weights()
        qw = MXArray.from_hp(w)
        s = np.asarray(e8m0_decode(qw.scale))
        exp = np.log2(s)
        np.testing.assert_allclose(exp, np.round(exp))

    def test_rceil_never_overflows(self):
        from ao_tpu.quantization.qarrays.mx import e8m0_decode

        w = weights() * 100
        _, scale = to_mx(w, (32, 1), "float8_e4m3fn", "rceil")
        q = w / np.asarray(e8m0_decode(scale)).repeat(32, axis=0)
        assert float(jnp.max(jnp.abs(q))) <= 448.0 + 1e-3

    def test_fp4_packing_halves_bytes(self):
        w = weights(256, 128)
        q8 = MXArray.from_hp(w, elem_dtype="float8_e4m3fn")
        q4 = MXArray.from_hp(w, elem_dtype="float4_e2m1fn")
        assert q4.qdata.nbytes == q8.qdata.nbytes // 2

    def test_linear_weight_only(self):
        w, x = weights(), jax.random.normal(KEY, (8, 256), jnp.bfloat16)
        qw = MXArray.from_hp(w)
        y = linear(x, qw)
        assert float(compute_error(x.astype(jnp.float32) @ w, y)) > 18.0

    def test_linear_dynamic_act(self):
        w, x = weights(), jax.random.normal(KEY, (8, 256), jnp.bfloat16)
        params = ao_tpu.quantize_({"wq": w}, MXDynamicActivationMXWeightConfig())
        y = linear(x, params["wq"])
        assert float(compute_error(x.astype(jnp.float32) @ w, y)) > 15.0

    def test_config_serde(self):
        cfg = MXDynamicActivationMXWeightConfig(weight_dtype="float4_e2m1fn")
        assert ao_tpu.config_from_json(ao_tpu.config_to_json(cfg)) == cfg


class TestNVFP4:
    def test_roundtrip_beats_mxfp4(self):
        w = weights()
        q_nv = NVFP4Array.from_hp(w)
        q_mx = MXArray.from_hp(w, elem_dtype="float4_e2m1fn")
        e_nv = float(compute_error(w, q_nv.dequantize(jnp.float32)))
        e_mx = float(compute_error(w, q_mx.dequantize(jnp.float32)))
        # finer blocks (16 vs 32) + e4m3 scales should beat e8m0@32
        assert e_nv > e_mx, (e_nv, e_mx)

    def test_two_level_scale(self):
        w = weights() * 1000.0  # force large per-tensor scale
        qw = NVFP4Array.from_hp(w, per_tensor=True)
        assert qw.per_tensor_scale is not None
        err = float(compute_error(w, qw.dequantize(jnp.float32)))
        assert err > 7.0

    def test_linear_dynamic(self):
        w, x = weights(), jax.random.normal(KEY, (8, 256), jnp.bfloat16)
        params = ao_tpu.quantize_({"wq": w}, NVFP4DynamicActivationNVFP4WeightConfig())
        y = linear(x, params["wq"])
        assert float(compute_error(x.astype(jnp.float32) @ w, y)) > 6.0

    def test_weight_only_config(self):
        w = weights()
        params = ao_tpu.quantize_({"wq": w}, NVFP4WeightOnlyConfig())
        assert isinstance(params["wq"], NVFP4Array)
