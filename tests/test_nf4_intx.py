"""NF4, Intx bitpacking, and quantized-embedding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.ops import linear
from ao_tpu.ops.embedding import embedding
from ao_tpu.quantization.configs import (
    Int8DynamicActivationIntxWeightConfig,
    IntxWeightOnlyConfig,
    NF4WeightOnlyConfig,
)
from ao_tpu.quantization.primitives import compute_error
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.quantization.qarrays.intx import (
    IntxArray,
    pack_bitplanes,
    unpack_bitplanes,
)
from ao_tpu.quantization.qarrays.nf4 import NF4Array

KEY = jax.random.PRNGKey(11)


def weights(k=256, n=128):
    return jax.random.normal(KEY, (k, n), jnp.float32) * 0.05


class TestBitplanes:
    @pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7, 8])
    def test_roundtrip(self, bits):
        u = jax.random.randint(KEY, (64, 16), 0, 2**bits, jnp.int32).astype(jnp.uint8)
        p = pack_bitplanes(u, bits, axis=-2)
        assert p.shape == (64 // 8 * bits, 16)
        np.testing.assert_array_equal(
            np.asarray(unpack_bitplanes(p, bits, axis=-2)), np.asarray(u)
        )

    def test_bytes_scale_with_bits(self):
        u = jnp.zeros((64, 16), jnp.uint8)
        assert pack_bitplanes(u, 2, -2).nbytes == 2 * 64 * 16 // 8
        assert pack_bitplanes(u, 6, -2).nbytes == 6 * 64 * 16 // 8


class TestIntx:
    @pytest.mark.parametrize("bits,thresh", [(2, 2.0), (3, 8.0), (4, 14.0),
                                             (5, 20.0), (6, 26.0), (8, 38.0)])
    @pytest.mark.parametrize("packed", [False, True])
    def test_roundtrip(self, bits, thresh, packed):
        w = weights()
        qw = IntxArray.from_hp(w, bits, 32, packed=packed)
        err = float(compute_error(w, qw.dequantize(jnp.float32)))
        assert err > thresh, f"int{bits} packed={packed}: {err}"

    def test_packed_unpacked_identical(self):
        w = weights()
        q1 = IntxArray.from_hp(w, 3, 32, packed=False)
        q2 = IntxArray.from_hp(w, 3, 32, packed=True)
        np.testing.assert_array_equal(
            np.asarray(q1.dequantize(jnp.float32)),
            np.asarray(q2.dequantize(jnp.float32)),
        )

    def test_configs_e2e(self):
        w = weights()
        x = jax.random.normal(KEY, (8, 256), jnp.bfloat16)
        for cfg in (IntxWeightOnlyConfig(bit_width=4, packed=True),
                    Int8DynamicActivationIntxWeightConfig(bit_width=4)):
            p = ao_tpu.quantize_({"wq": w}, cfg)
            assert isinstance(p["wq"], IntxArray)
            y = linear(x, p["wq"])
            assert float(compute_error(x.astype(jnp.float32) @ w, y)) > 10.0


class TestNF4:
    def test_roundtrip_beats_plain_int4_on_gaussian(self):
        w = weights()
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        q_nf4 = NF4Array.from_hp(w, 64)
        q_i4 = Int4Array.from_hp(w, 64, zero_point_domain=ao_tpu.ZeroPointDomain.INT,
                                 mapping_type=ao_tpu.MappingType.SYMMETRIC)
        e_nf4 = float(compute_error(w, q_nf4.dequantize(jnp.float32)))
        e_i4 = float(compute_error(w, q_i4.dequantize(jnp.float32)))
        # NF4's codebook is tuned for gaussian weights
        assert e_nf4 > e_i4, (e_nf4, e_i4)

    def test_double_quant_memory(self):
        w = weights(1024, 1024)
        qw = NF4Array.from_hp(w, 64)
        # packed codes + int8 scalers + small factors << fp32
        assert qw.nbytes < w.nbytes * 0.16

    def test_linear_and_config(self):
        w = weights()
        x = jax.random.normal(KEY, (8, 256), jnp.bfloat16)
        p = ao_tpu.quantize_({"wq": w}, NF4WeightOnlyConfig())
        y = linear(x, p["wq"])
        assert float(compute_error(x.astype(jnp.float32) @ w, y)) > 14.0


class TestQuantizedEmbedding:
    def test_int8_embedding(self):
        table = jax.random.normal(KEY, (1000, 64), jnp.float32) * 0.02
        qt = Int8Array.from_hp(table, (1, 64))
        ids = jax.random.randint(KEY, (4, 7), 0, 1000)
        out = embedding(qt, ids)
        ref = jnp.take(table, ids, axis=0)
        assert out.shape == (4, 7, 64)
        assert float(compute_error(ref, out)) > 30.0

    def test_per_axis_config_for_embedding(self):
        table = jax.random.normal(KEY, (1000, 64), jnp.float32) * 0.02
        p = ao_tpu.quantize_(
            {"embed": table},
            ao_tpu.Int8WeightOnlyConfig(granularity=ao_tpu.PerAxis(0)),
            filter_fn=lambda fqn, x: fqn == "embed",
        )
        assert p["embed"].scale.shape == (1000, 1)
        out = embedding(p["embed"], jnp.array([1, 2, 3]))
        assert out.shape == (3, 64)


class TestIntxToInt4:
    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_exact_collapse(self, bits):
        """u = q + 8, zp' = -(8+zp)*scale reproduces the affine dequant to
        one f32 ulp (op-order rounding); lands in the magic layout."""
        from ao_tpu.quantization.qarrays.intx import IntxArray

        w = jax.random.normal(jax.random.PRNGKey(bits), (256, 64),
                              jnp.float32) * 0.02
        qa = IntxArray.from_hp(w, bits=bits, group_size=32)
        i4 = qa.to_int4(scale_dtype=jnp.float32)
        assert i4.layout == "magic"
        np.testing.assert_allclose(
            np.asarray(qa.dequantize(jnp.float32)),
            np.asarray(i4.dequantize(jnp.float32)), rtol=2e-6, atol=1e-7,
        )

    def test_asymmetric_and_linear(self):
        from ao_tpu.quantization import primitives as P
        from ao_tpu.quantization.qarrays.intx import IntxArray
        from ao_tpu.ops import linear

        w = jax.random.normal(jax.random.PRNGKey(9), (256, 64), jnp.float32)
        qa = IntxArray.from_hp(w, bits=3, group_size=32,
                               mapping_type=P.MappingType.ASYMMETRIC)
        i4 = qa.to_int4(scale_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(qa.dequantize(jnp.float32)),
            np.asarray(i4.dequantize(jnp.float32)), rtol=2e-6, atol=1e-6,
        )
        x = jax.random.normal(jax.random.PRNGKey(10), (4, 256), jnp.float32)
        import ao_tpu

        assert ao_tpu.compute_error(linear(x, qa), linear(x, i4)) > 40
