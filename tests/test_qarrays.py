"""QuantizedArray container tests: roundtrip, pytree contract, linear SQNR.

(ref test model: torchao/testing/utils.py:210 TorchAOBasicTestCase —
flatten/unflatten roundtrip + linear SQNR bounds; jit in/out is the analog
of the compile tests :288.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ao_tpu.ops import linear
from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.common import ActQuantSpec
from ao_tpu.quantization.qarrays.float8 import Float8Array
from ao_tpu.quantization.qarrays.int4 import Int4Array, pack_int4, unpack_int4
from ao_tpu.quantization.qarrays.int8 import Int8Array

KEY = jax.random.PRNGKey(42)


def weights(k=256, n=128, key=KEY):
    return jax.random.normal(key, (k, n), jnp.float32) * 0.05


def acts(m=8, k=256):
    return jax.random.normal(jax.random.PRNGKey(7), (m, k), jnp.bfloat16)


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        u = jax.random.randint(KEY, (64, 32), 0, 16, dtype=jnp.int32).astype(jnp.uint8)
        p = pack_int4(u, 32, axis=-2)
        assert p.shape == (32, 32)
        np.testing.assert_array_equal(np.asarray(unpack_int4(p, 32, -2)), np.asarray(u))

    def test_pack_3d(self):
        u = jax.random.randint(KEY, (4, 64, 32), 0, 16, dtype=jnp.int32).astype(jnp.uint8)
        p = pack_int4(u, 16, axis=-2)
        assert p.shape == (4, 32, 32)
        np.testing.assert_array_equal(np.asarray(unpack_int4(p, 16, -2)), np.asarray(u))

    def test_group_locality(self):
        # shard-friendliness: packing then slicing at group boundaries equals
        # slicing then packing (the property K-sharding relies on)
        u = jax.random.randint(KEY, (128, 16), 0, 16, dtype=jnp.int32).astype(jnp.uint8)
        g = 32
        p = pack_int4(u, g, axis=-2)
        np.testing.assert_array_equal(
            np.asarray(p[: 64 // 2]), np.asarray(pack_int4(u[:64], g, axis=-2))
        )


class TestInt8Array:
    def test_roundtrip(self):
        w = weights()
        qw = Int8Array.from_hp(w, (256, 1))
        assert qw.qdata.dtype == jnp.int8
        assert qw.shape == (256, 128)
        err = P.compute_error(w, qw.dequantize(jnp.float32))
        assert err > 35.0

    def test_pytree(self):
        w = weights()
        qw = Int8Array.from_hp(w, (256, 1))
        leaves, treedef = jax.tree_util.tree_flatten(qw)
        qw2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert isinstance(qw2, Int8Array)
        assert qw2.block_size == qw.block_size
        np.testing.assert_array_equal(np.asarray(qw2.qdata), np.asarray(qw.qdata))

    def test_linear_sqnr(self):
        w, x = weights(), acts()
        qw = Int8Array.from_hp(w, (256, 1))
        y_ref = x.astype(jnp.float32) @ w
        y = linear(x, qw)
        assert P.compute_error(y_ref, y) > 25.0

    def test_linear_dynamic_act(self):
        w, x = weights(), acts()
        qw = Int8Array.from_hp(w, (256, 1), act_quant=ActQuantSpec())
        y_ref = x.astype(jnp.float32) @ w
        y = linear(x, qw)
        assert P.compute_error(y_ref, y) > 20.0

    def test_linear_jit(self):
        w, x = weights(), acts()
        qw = Int8Array.from_hp(w, (256, 1), act_quant=ActQuantSpec())
        y_eager = linear(x, qw)
        y_jit = jax.jit(linear)(x, qw)
        assert P.compute_error(y_eager, y_jit) > 40.0

    def test_bias(self):
        w, x = weights(), acts()
        b = jnp.ones((128,), jnp.float32)
        qw = Int8Array.from_hp(w, (256, 1))
        y = linear(x, qw, b)
        y_nob = linear(x, qw)
        np.testing.assert_allclose(
            np.asarray(y - y_nob, dtype=np.float32), 1.0, rtol=2e-2
        )


class TestInt4Array:
    @pytest.mark.parametrize("algo", ["tinygemm", "hqq", "minmax_int"])
    def test_roundtrip(self, algo):
        w = weights()
        if algo == "minmax_int":
            qw = Int4Array.from_hp(
                w, 64, zero_point_domain=P.ZeroPointDomain.INT, algorithm="minmax"
            )
        else:
            qw = Int4Array.from_hp(w, 64, algorithm="hqq" if algo == "hqq" else "minmax")
        # 2-D K=256 g=64 -> K/g=4 groups -> auto picks the magic layout
        assert qw.layout == "magic"
        assert qw.qdata.shape == (32, 128)  # K/8 int32 words
        assert qw.qdata.dtype == jnp.int32
        assert qw.scale.shape == (4, 128)  # K/g
        err = P.compute_error(w, qw.dequantize(jnp.float32))
        assert err > 15.0, f"{algo}: {err}"
        # layout conversion roundtrips exactly
        qh = qw.to_layout("halves")
        assert qh.qdata.shape == (128, 128) and qh.qdata.dtype == jnp.uint8
        np.testing.assert_array_equal(
            np.asarray(qh.unpack()), np.asarray(qw.unpack())
        )
        qm = qh.to_layout("magic")
        np.testing.assert_array_equal(
            np.asarray(qm.qdata), np.asarray(qw.qdata)
        )
        np.testing.assert_array_equal(
            np.asarray(qh.dequantize(jnp.float32)),
            np.asarray(qw.dequantize(jnp.float32)),
        )

    def test_magic8_layout(self):
        """magic8 (2-plane i8-MXU layout) roundtrips and is auto-picked for
        int8-activation weights."""
        from ao_tpu.quantization.qarrays.common import ActQuantSpec
        from ao_tpu.quantization.qarrays.int4 import (
            pack_int4_magic8, unpack_int4_magic8,
        )

        u = jax.random.randint(KEY, (256, 128), 0, 16, jnp.uint8)
        for g in (32, 64, 128):
            word = pack_int4_magic8(u, g)
            assert word.shape == (32, 128) and word.dtype == jnp.int32
            np.testing.assert_array_equal(
                np.asarray(unpack_int4_magic8(word, g)), np.asarray(u))

        w = weights()
        spec = ActQuantSpec(dtype="int8", symmetric=True,
                            granularity="per_token")
        qw = Int4Array.from_hp(w, 64, act_quant=spec)
        assert qw.layout == "magic8"
        # all three layouts dequantize identically
        qm = qw.to_layout("magic")
        qh = qw.to_layout("halves")
        assert qm.layout == "magic" and qh.layout == "halves"
        np.testing.assert_array_equal(
            np.asarray(qm.unpack()), np.asarray(qw.unpack()))
        np.testing.assert_array_equal(
            np.asarray(qh.unpack()), np.asarray(qw.unpack()))
        # K/g odd -> magic8 impossible, auto falls back
        qo = Int4Array.from_hp(weights()[:192], 64, act_quant=spec)
        assert qo.layout != "magic8"

    def test_hqq_beats_or_matches_minmax(self):
        # HQQ should not be (much) worse than minmax on outlier-heavy weights
        w = weights() + (jax.random.uniform(KEY, (256, 128)) > 0.99) * 0.5
        q_mm = Int4Array.from_hp(w, 64)
        q_hqq = Int4Array.from_hp(w, 64, algorithm="hqq")
        e_mm = float(P.compute_error(w, q_mm.dequantize(jnp.float32)))
        e_hqq = float(P.compute_error(w, q_hqq.dequantize(jnp.float32)))
        assert e_hqq > e_mm - 0.5, (e_mm, e_hqq)

    def test_linear_sqnr(self):
        w, x = weights(), acts()
        qw = Int4Array.from_hp(w, 64)
        y_ref = x.astype(jnp.float32) @ w
        y = linear(x, qw)
        assert P.compute_error(y_ref, y) > 12.0

    def test_linear_jit_matches_eager(self):
        w, x = weights(), acts()
        qw = Int4Array.from_hp(w, 128)
        y1 = linear(x, qw)
        y2 = jax.jit(linear)(x, qw)
        assert P.compute_error(y1, y2) > 40.0

    def test_act_pre_scale(self):
        w, x = weights(), acts()
        pre = jnp.full((1, 256), 2.0, jnp.float32)
        qw = Int4Array.from_hp(w, 64, act_pre_scale=pre)
        y = linear(x, qw)
        qw_no = qw.replace(act_pre_scale=None)
        y_no = linear(x, qw_no)
        assert P.compute_error(2.0 * y_no, y) > 30.0


class TestFloat8Array:
    def test_roundtrip(self):
        w = weights()
        qw = Float8Array.from_hp(w, (1, 128))  # per-out-channel... (K,1)? use rowwise
        err = P.compute_error(w, qw.dequantize(jnp.float32))
        assert err > 20.0

    def test_linear_dynamic(self):
        w, x = weights(), acts()
        qw = Float8Array.from_hp(
            w, (256, 1), act_quant=ActQuantSpec(dtype="float8_e4m3fn")
        )
        y_ref = x.astype(jnp.float32) @ w
        y = linear(x, qw)
        assert P.compute_error(y_ref, y) > 20.0

    def test_blockwise(self):
        w, x = weights(), acts()
        qw = Float8Array.from_hp(
            w,
            (128, 128),
            act_quant=ActQuantSpec(dtype="float8_e4m3fn", granularity="per_group:128"),
        )
        y_ref = x.astype(jnp.float32) @ w
        y = linear(x, qw)
        assert P.compute_error(y_ref, y) > 20.0


class TestMagicLargeMFallback:
    """The M>1024 magic-layout XLA fallback permutes x's in-group columns
    to plane-major storage order instead of reconstructing natural weight
    order (kernels._int4_wo_magic_xla_permuted) — pin exact agreement with
    the dequantize+matmul reference across zp domains and group sizes."""

    @pytest.mark.parametrize("g,zp_domain", [
        (64, P.ZeroPointDomain.FLOAT),
        (64, P.ZeroPointDomain.INT),
        (128, P.ZeroPointDomain.FLOAT),
    ])
    def test_matches_dequant_reference(self, g, zp_domain):
        from ao_tpu.ops import kernels

        k, n, m = 8 * g, 256, 48
        w = jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.float32)
        qw = Int4Array.from_hp(
            w, g, zero_point_domain=zp_domain,
            algorithm="minmax" if zp_domain is P.ZeroPointDomain.INT
            else "tinygemm")
        assert qw.layout == "magic"
        ref = x @ qw.dequantize(jnp.float32)
        got = kernels._int4_wo_magic_xla_permuted(
            x, qw.qdata, qw.scale, qw.zero_point, g, qw.zero_point_domain)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-3)
