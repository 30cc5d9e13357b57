"""Quantized convolution tests (fp8/int8/intx conv weights).

(ref analog: the fp8 conv2d/3d coverage in test_quant_api / float8 tests.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.ops.conv import conv2d, conv3d, quantize_conv_weight
from ao_tpu.quantization.configs import IntxWeightOnlyConfig

sqnr = ao_tpu.compute_error


class TestConv:
    def _data2d(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16), jnp.float32)
        return x, w

    @pytest.mark.parametrize("config,bound", [
        (ao_tpu.Float8WeightOnlyConfig(), 25),
        (ao_tpu.Int8WeightOnlyConfig(), 28),
        (IntxWeightOnlyConfig(bit_width=4), 13),
        (ao_tpu.Int4WeightOnlyConfig(), 13),
    ])
    def test_conv2d_quantized(self, config, bound):
        x, w = self._data2d()
        ref = conv2d(x, w)
        qw = quantize_conv_weight(w, config)
        assert qw.shape == w.shape
        out = jax.jit(lambda x, q: conv2d(x, q))(x, qw)
        assert sqnr(ref, out) > bound, type(config).__name__

    def test_conv2d_stride_padding_bias(self):
        x, w = self._data2d()
        b = jnp.arange(16, dtype=jnp.float32) * 0.1
        ref = conv2d(x, w, stride=2, padding="VALID", bias=b)
        qw = quantize_conv_weight(w, ao_tpu.Int8WeightOnlyConfig())
        out = conv2d(x, qw, stride=2, padding="VALID", bias=b)
        assert out.shape == ref.shape == (2, 7, 7, 16)
        assert sqnr(ref, out) > 25

    def test_conv3d_fp8(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8, 4), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 4, 8), jnp.float32)
        ref = conv3d(x, w)
        qw = quantize_conv_weight(w, ao_tpu.Float8WeightOnlyConfig())
        out = conv3d(x, qw)
        assert sqnr(ref, out) > 25
