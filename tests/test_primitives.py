"""Core quant-primitive tests — SQNR-bound idiom.

(ref test model: test/quantization/test_quant_primitives.py; assertions use
SQNR thresholds like the reference's compute_error gates.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.granularity import (
    PerAxis,
    PerBlock,
    PerGroup,
    PerRow,
    PerTensor,
    PerToken,
    get_block_size,
)


KEY = jax.random.PRNGKey(0)


def rand(shape, key=KEY, scale=2.0):
    return jax.random.normal(key, shape, dtype=jnp.float32) * scale


class TestGranularity:
    def test_block_sizes(self):
        shape = (64, 128)
        assert get_block_size(shape, PerTensor()) == (64, 128)
        assert get_block_size(shape, PerAxis(0)) == (1, 128)
        assert get_block_size(shape, PerAxis(1)) == (64, 1)
        assert get_block_size(shape, PerGroup(32)) == (1, 32)
        assert get_block_size(shape, PerRow()) == (1, 128)
        assert get_block_size(shape, PerToken()) == (1, 128)
        assert get_block_size(shape, PerBlock((32, 64))) == (32, 64)

    def test_perblock_rank_promote(self):
        assert get_block_size((4, 64, 128), PerBlock((1, 128))) == (1, 1, 128)

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            get_block_size((64, 100), PerGroup(32))


class TestAffine:
    @pytest.mark.parametrize("mapping", [P.MappingType.SYMMETRIC, P.MappingType.ASYMMETRIC])
    @pytest.mark.parametrize("block", [(1, 32), (1, 128), (64, 1), (64, 128)])
    def test_roundtrip_sqnr_int8(self, mapping, block):
        x = rand((64, 128))
        s, zp = P.choose_qparams_affine(x, mapping, block, "int8")
        q = P.quantize_affine(x, block, s, zp, -128, 127)
        dq = P.dequantize_affine(q, block, s, zp)
        assert q.dtype == jnp.int8
        err = P.compute_error(x, dq)
        assert err > 35.0, f"SQNR {err} too low for int8 {mapping} {block}"

    def test_roundtrip_int4(self):
        x = rand((64, 128))
        block = (1, 32)
        s, zp = P.choose_qparams_affine(x, P.MappingType.ASYMMETRIC, block, "int4")
        q = P.quantize_affine(x, block, s, zp, -8, 7)
        dq = P.dequantize_affine(q, block, s, zp)
        err = P.compute_error(x, dq)
        assert err > 15.0

    def test_symmetric_zero_point_is_mid(self):
        x = rand((8, 32))
        s, zp = P.choose_qparams_affine(
            x, P.MappingType.SYMMETRIC, (1, 32), "int8"
        )
        assert np.all(np.asarray(zp) == 0)

    def test_quantize_range_clamped(self):
        x = rand((8, 32), scale=100.0)
        s, zp = P.choose_qparams_affine(x, P.MappingType.ASYMMETRIC, (1, 32), "int4")
        q = P.quantize_affine(x, (1, 32), s, zp, -8, 7)
        assert int(jnp.max(q)) <= 7 and int(jnp.min(q)) >= -8


class TestTinygemm:
    def test_roundtrip(self):
        x = rand((128, 64))
        block = (32, 1)
        s, zp = P.choose_qparams_affine_tinygemm(x, block, "int4")
        q = P.quantize_affine_tinygemm(x, block, s, zp, -8, 7)
        dq = P.dequantize_affine_tinygemm(q, block, s, zp, -8, 7)
        err = P.compute_error(x, dq)
        assert err > 15.0, f"tinygemm SQNR {err}"

    def test_zero_point_float_dtype(self):
        x = rand((64, 8))
        s, zp = P.choose_qparams_affine_tinygemm(x, (32, 1), "int4")
        assert s.dtype == jnp.bfloat16
        assert zp.dtype == jnp.bfloat16


class TestFloat8:
    @pytest.mark.parametrize("dt", [jnp.float8_e4m3fn, jnp.float8_e5m2])
    def test_roundtrip(self, dt):
        x = rand((32, 64))
        block = (1, 64)
        s = P.choose_scale_float8(x, block, dt)
        q = P.quantize_float8(x, block, s, dt)
        dq = P.dequantize_float8(q, block, s)
        err = P.compute_error(x, dq)
        thresh = 25.0 if dt == jnp.float8_e4m3fn else 15.0
        assert err > thresh
        assert q.dtype == dt

    def test_amax_clamps(self):
        x = rand((8, 16))
        s_raw = P.choose_scale_float8(x, (8, 16), jnp.float8_e4m3fn)
        s_ub = P.choose_scale_float8(x, (8, 16), jnp.float8_e4m3fn, value_ub=0.5)
        assert float(s_ub[0, 0]) <= float(s_raw[0, 0])
        assert np.isclose(float(s_ub[0, 0]), 0.5 / 448.0)


class TestFakeQuant:
    def test_ste_gradient(self):
        x = rand((16, 32))
        block = (1, 32)
        s, zp = P.choose_qparams_affine(x, P.MappingType.SYMMETRIC, block, "int8")

        def loss(x_):
            return jnp.sum(P.fake_quantize_affine(x_, block, s, None, -128, 127) ** 2)

        g = jax.grad(loss)(x)
        # STE: grad should be close to 2*dq (not zero everywhere)
        assert float(jnp.linalg.norm(g)) > 0.0

    def test_fq_matches_qdq(self):
        x = rand((16, 32))
        block = (1, 32)
        s, zp = P.choose_qparams_affine(x, P.MappingType.ASYMMETRIC, block, "int8")
        fq = P.fake_quantize_affine(x, block, s, zp, -128, 127)
        q = P.quantize_affine(x, block, s, zp, -128, 127)
        dq = P.dequantize_affine(q, block, s, zp)
        np.testing.assert_allclose(np.asarray(fq), np.asarray(dq), atol=1e-5)

    def test_fq_tinygemm_domain(self):
        x = rand((64, 16))
        block = (32, 1)
        s, zp = P.choose_qparams_affine_tinygemm(x, block, "int4")
        fq = P.fake_quantize_affine(
            x, block, s, zp, -8, 7, zero_point_domain=P.ZeroPointDomain.FLOAT
        )
        q = P.quantize_affine_tinygemm(x, block, s, zp, -8, 7)
        dq = P.dequantize_affine_tinygemm(q, block, s, zp, -8, 7)
        np.testing.assert_allclose(np.asarray(fq), np.asarray(dq), atol=1e-2)


class TestJit:
    def test_all_primitives_jit(self):
        x = rand((64, 128))

        @jax.jit
        def roundtrip(x):
            s, zp = P.choose_qparams_affine(
                x, P.MappingType.SYMMETRIC, (1, 32), "int8"
            )
            q = P.quantize_affine(x, (1, 32), s, zp)
            return P.dequantize_affine(q, (1, 32), s, zp)

        dq = roundtrip(x)
        assert P.compute_error(x, dq) > 35.0
