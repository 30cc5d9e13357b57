"""Codebook (k-means LUT) and GGUF Q4_K double-quant tests.

(ref analog: test/prototype/test_codebook_quant.py, test/prototype/test_gguf.py)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.algorithms.codebook import (
    CodebookArray,
    dequantize_codebook,
    fit_kmeans,
    quantize_codebook,
)
from ao_tpu.integrations.gguf import GGUFQuantizedArray, choose_qparams_gguf
from ao_tpu.ops import linear

sqnr = ao_tpu.compute_error


class TestCodebook:
    def test_kmeans_recovers_clusters(self):
        key = jax.random.PRNGKey(0)
        centers_true = jnp.array([-2.0, 0.0, 3.0, 7.0])
        pts = centers_true[jax.random.randint(key, (4096,), 0, 4)]
        pts = pts + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (4096,))
        c = fit_kmeans(pts, 4, iters=20)
        np.testing.assert_allclose(np.asarray(c), np.asarray(centers_true),
                                   atol=0.05)

    def test_quantize_nearest(self):
        cb = jnp.array([-1.0, 0.0, 0.5, 2.0])
        x = jnp.array([-0.9, 0.2, 0.3, 1.0, 5.0, -5.0])
        codes = quantize_codebook(x, cb)
        np.testing.assert_array_equal(
            np.asarray(codes), [0, 1, 2, 2, 3, 0]
        )
        v = dequantize_codebook(codes, cb, jnp.float32)
        assert v.shape == x.shape

    def test_array_roundtrip_sqnr(self):
        w = jax.random.normal(jax.random.PRNGKey(2), (128, 96), jnp.float32)
        qa = CodebookArray.from_hp(w, bits=4, scale_block=32)
        assert sqnr(w, qa.dequantize(jnp.float32)) > 16
        # 4-bit codebook should beat... at least be close to uniform int4
        qa8 = CodebookArray.from_hp(w, bits=8, scale_block=32)
        assert sqnr(w, qa8.dequantize(jnp.float32)) > 30

    def test_groupwise_luts_beat_shared_on_heterogeneous_weights(self):
        # two K-halves with very different distributions: per-group LUTs
        # must beat a single shared codebook
        k1 = jax.random.normal(jax.random.PRNGKey(5), (64, 96), jnp.float32)
        k2 = jax.random.laplace(jax.random.PRNGKey(6), (64, 96)) * 0.2
        w = jnp.concatenate([k1, k2], axis=0)
        q_shared = CodebookArray.from_hp(w, bits=3, scale_block=32)
        q_group = CodebookArray.from_hp(w, bits=3, scale_block=32,
                                        lut_block=64)
        assert q_group.codebook.shape == (2, 8)
        e_shared = sqnr(w, q_shared.dequantize(jnp.float32))
        e_group = sqnr(w, q_group.dequantize(jnp.float32))
        assert e_group > e_shared, (e_group, e_shared)

    def test_groupwise_lut_config_and_linear(self):
        w = jax.random.normal(jax.random.PRNGKey(3), (64, 48), jnp.float32)
        qp = ao_tpu.quantize_({"kernel": w}, ao_tpu.CodebookWeightOnlyConfig(
            bits=4, scale_block=16, lut_block=16))
        assert isinstance(qp["kernel"], CodebookArray)
        assert qp["kernel"].codebook.shape == (4, 16)
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 64), jnp.float32)
        y = jax.jit(linear)(x, qp["kernel"])
        assert sqnr(x @ w, y) > 14

    def test_config_api_and_linear(self):
        w = jax.random.normal(jax.random.PRNGKey(3), (64, 48), jnp.float32)
        params = {"kernel": w}
        qp = ao_tpu.quantize_(params, ao_tpu.CodebookWeightOnlyConfig(
            bits=4, scale_block=16))
        assert isinstance(qp["kernel"], CodebookArray)
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 64), jnp.float32)
        y = jax.jit(linear)(x, qp["kernel"])
        assert sqnr(x @ w, y) > 14

    def test_serde(self):
        c = ao_tpu.CodebookWeightOnlyConfig(bits=3)
        assert ao_tpu.config_from_dict(ao_tpu.config_to_dict(c)) == c


class TestGGUF:
    def test_qparams_ranges(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (512, 64), jnp.float32)
        q, sc, mc, d, dmin = choose_qparams_gguf(w)
        assert q.shape == (512, 64) and q.dtype == jnp.uint8
        assert sc.shape == (16, 64) and mc.shape == (16, 64)
        assert d.shape == (2, 64) and dmin.shape == (2, 64)
        assert int(jnp.max(q)) <= 15 and int(jnp.min(q)) >= 0
        assert int(jnp.max(sc)) <= 63 and int(jnp.max(mc)) <= 63

    def test_roundtrip_sqnr(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (512, 96), jnp.float32)
        qa = GGUFQuantizedArray.from_hp(w)
        s = sqnr(w, qa.dequantize(jnp.float32))
        assert s > 18, float(s)

    def test_memory_footprint(self):
        """Q4_K ≈ 4.5 bits/weight: packed nibbles + 6-bit metadata."""
        w = jnp.zeros((2048, 512), jnp.float32)
        qa = GGUFQuantizedArray.from_hp(w)
        bits_per_weight = qa.nbytes * 8 / w.size
        assert bits_per_weight < 6.0, bits_per_weight

    def test_config_api_and_linear(self):
        w = jax.random.normal(jax.random.PRNGKey(2), (256, 64), jnp.float32)
        qp = ao_tpu.quantize_({"kernel": w}, ao_tpu.GGUFWeightOnlyConfig())
        assert isinstance(qp["kernel"], GGUFQuantizedArray)
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 256), jnp.float32)
        y = jax.jit(linear)(x, qp["kernel"])
        assert sqnr(x @ w, y) > 16

    def test_skips_indivisible(self):
        w = jnp.zeros((100, 64), jnp.float32)  # K not /256
        qp = ao_tpu.quantize_({"kernel": w}, ao_tpu.GGUFWeightOnlyConfig())
        assert qp["kernel"] is w

    def test_to_int4_exact(self):
        """The double-quant collapse is bit-exact with fp32 scales: the
        effective per-32-group affine params ARE d*sc / -dmin*m."""
        w = jax.random.normal(jax.random.PRNGKey(4), (512, 64), jnp.float32)
        qa = GGUFQuantizedArray.from_hp(w)
        i4 = qa.to_int4(scale_dtype=jnp.float32)
        assert i4.layout == "magic"
        np.testing.assert_array_equal(
            np.asarray(qa.dequantize(jnp.float32)),
            np.asarray(i4.dequantize(jnp.float32)),
        )

    def test_fuse_tree_and_linear(self):
        from ao_tpu.integrations.gguf import fuse_gguf_int4
        from ao_tpu.quantization.qarrays.common import ActQuantSpec
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        w = jax.random.normal(jax.random.PRNGKey(5), (256, 64), jnp.float32)
        qp = ao_tpu.quantize_({"kernel": w, "bias": jnp.zeros((64,))},
                              ao_tpu.GGUFWeightOnlyConfig())
        fused = fuse_gguf_int4(qp)
        assert isinstance(fused["kernel"], Int4Array)
        x = jax.random.normal(jax.random.PRNGKey(6), (4, 256), jnp.float32)
        y_gguf = linear(x, qp["kernel"])
        y_int4 = linear(x, fused["kernel"])
        # bf16 scale cast only: paths agree far above the scheme's noise
        assert sqnr(y_gguf, y_int4) > 35
        w4a8 = fuse_gguf_int4(qp, act_quant=ActQuantSpec(
            dtype="int8", granularity="per_token", symmetric=True))
        assert w4a8["kernel"].layout == "magic8"
        assert sqnr(y_gguf, linear(x, w4a8["kernel"])) > 25
