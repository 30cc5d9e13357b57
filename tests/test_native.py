"""Native host kernel tests: C++ vs pure-python parity, packing roundtrips,
quantize-on-load numerics vs the device path.

(ref analog: csrc/cpu gtest suites — bitpacking roundtrip and
NEON-vs-fallback compatibility, test_bitpack_fallback_compatibility.cpp.)
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ao_tpu
from ao_tpu.utils import native


requires_native = pytest.mark.skipif(
    not native.native_available(), reason="native lib unavailable (no g++?)"
)


class TestPacking:
    @pytest.mark.parametrize("g", [2, 32, 64])
    def test_int4_pack_roundtrip(self, g):
        rng = np.random.default_rng(0)
        u = rng.integers(0, 16, (128, 48), dtype=np.uint8)
        packed = native.pack_int4_host(u, g)
        assert packed.shape == (64, 48)
        np.testing.assert_array_equal(native.unpack_int4_host(packed, g), u)

    def test_int4_matches_jax_layout(self):
        from ao_tpu.quantization.qarrays.int4 import pack_int4

        rng = np.random.default_rng(1)
        u = rng.integers(0, 16, (64, 32), dtype=np.uint8)
        host = native.pack_int4_host(u, 32)
        dev = np.asarray(pack_int4(jnp.asarray(u), 32, axis=-2))
        np.testing.assert_array_equal(host, dev)

    @pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7])
    def test_bitstream_roundtrip(self, bits):
        rng = np.random.default_rng(bits)
        vals = rng.integers(0, 2 ** bits, 1000, dtype=np.uint8)
        packed = native.pack_bits_host(vals, bits)
        assert packed.size == (1000 * bits + 7) // 8
        np.testing.assert_array_equal(
            native.unpack_bits_host(packed, 1000, bits), vals
        )

    @requires_native
    def test_native_matches_fallback(self):
        """C++ and numpy fallbacks must agree bit-for-bit."""
        rng = np.random.default_rng(2)
        u = rng.integers(0, 16, (256, 64), dtype=np.uint8)
        w = rng.standard_normal((256, 64), dtype=np.float32)
        lib = native._LIB
        try:
            a1 = native.pack_int4_host(u, 64)
            q1, s1 = native.quantize_int8_symmetric_host(w, 64)
            p1, sc1, z1 = native.quantize_int4_tinygemm_host(w, 64)
            b1 = native.pack_bits_host(u.reshape(-1) & 7, 3)
            native._LIB = None
            a2 = native.pack_int4_host(u, 64)
            q2, s2 = native.quantize_int8_symmetric_host(w, 64)
            p2, sc2, z2 = native.quantize_int4_tinygemm_host(w, 64)
            b2 = native.pack_bits_host(u.reshape(-1) & 7, 3)
        finally:
            native._LIB = lib
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(q1, q2)
        np.testing.assert_allclose(s1, s2, rtol=1e-6)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_allclose(sc1, sc2, rtol=1e-6)
        np.testing.assert_allclose(z1, z2, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(b1, b2)

    @pytest.mark.parametrize("g", [32, 64])
    def test_repack_magic_matches_device(self, g):
        from ao_tpu.quantization.qarrays.int4 import (
            pack_int4_magic,
            pack_int4_magic8,
        )

        rng = np.random.default_rng(7)
        u = rng.integers(0, 16, (256, 40), dtype=np.uint8)
        ph = native.pack_int4_host(u, g)
        np.testing.assert_array_equal(
            native.repack_int4_magic_host(ph, g),
            np.asarray(pack_int4_magic(jnp.asarray(u), g)),
        )
        np.testing.assert_array_equal(
            native.repack_int4_magic8_host(ph, g),
            np.asarray(pack_int4_magic8(jnp.asarray(u), g)),
        )

    @requires_native
    def test_repack_native_matches_fallback(self):
        rng = np.random.default_rng(8)
        u = rng.integers(0, 16, (512, 24), dtype=np.uint8)
        ph = native.pack_int4_host(u, 64)
        lib = native._LIB
        try:
            a1 = native.repack_int4_magic_host(ph, 64)
            b1 = native.repack_int4_magic8_host(ph, 64)
            native._LIB = None
            a2 = native.repack_int4_magic_host(ph, 64)
            b2 = native.repack_int4_magic8_host(ph, 64)
        finally:
            native._LIB = lib
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)

    def test_nf4_codes(self):
        cb = np.sort(np.random.default_rng(3).standard_normal(16)).astype(
            np.float32
        )
        w = np.random.default_rng(4).standard_normal((64, 32)).astype(np.float32)
        codes = native.quantize_nf4_host(w, cb)
        ref = np.argmin(np.abs(w[..., None] - cb), axis=-1)
        np.testing.assert_array_equal(codes, ref.astype(np.uint8))


class TestQuantizeOnLoad:
    def test_int4_matches_device_quantize(self):
        from ao_tpu.integrations.loader import quantize_on_load
        from ao_tpu.ops import linear

        w = jax.random.normal(jax.random.PRNGKey(0), (128, 64), jnp.float32)
        params = {"kernel": w}
        cfg = ao_tpu.Int4WeightOnlyConfig(group_size=32)
        host_q = quantize_on_load(params, cfg)
        dev_q = ao_tpu.quantize_(params, cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 128), jnp.float32)
        y_host = linear(x, host_q["kernel"])
        y_dev = linear(x, dev_q["kernel"])
        # same scheme: outputs agree tightly (not bit-identical: host f32
        # rounding vs device)
        assert ao_tpu.compute_error(y_dev, y_host) > 35

    def test_int4_load_ships_fast_layouts(self):
        """quantize_on_load must produce the same qdata layout from_hp's
        AUTO would pick, so loaded checkpoints hit the fused kernels."""
        from ao_tpu.integrations.loader import quantize_on_load
        from ao_tpu.ops import linear

        w = jax.random.normal(jax.random.PRNGKey(5), (256, 64), jnp.float32)
        wo = quantize_on_load({"kernel": w}, ao_tpu.Int4WeightOnlyConfig(group_size=32))
        assert wo["kernel"].layout == "magic"
        da = quantize_on_load(
            {"kernel": w},
            ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=32),
        )
        assert da["kernel"].layout == "magic8"
        assert da["kernel"].act_quant is not None
        # numerics survive the repack: both within tinygemm error of fp32
        x = jax.random.normal(jax.random.PRNGKey(6), (4, 256), jnp.float32)
        ref = x @ w
        assert ao_tpu.compute_error(ref, linear(x, wo["kernel"])) > 20
        assert ao_tpu.compute_error(ref, linear(x, da["kernel"])) > 20
        # odd group-count falls back to split-half, still correct
        w3 = jax.random.normal(jax.random.PRNGKey(7), (96, 64), jnp.float32)
        h = quantize_on_load({"kernel": w3}, ao_tpu.Int4WeightOnlyConfig(group_size=32))
        assert h["kernel"].layout == "halves"

    def test_int8_matches_device_quantize(self):
        from ao_tpu.integrations.loader import quantize_on_load
        from ao_tpu.ops import linear

        w = jax.random.normal(jax.random.PRNGKey(2), (64, 48), jnp.float32)
        cfg = ao_tpu.Int8WeightOnlyConfig()
        host_q = quantize_on_load({"kernel": w}, cfg)
        dev_q = ao_tpu.quantize_({"kernel": w}, cfg)
        qa = np.asarray(host_q["kernel"].qdata, np.int32)
        qb = np.asarray(dev_q["kernel"].qdata, np.int32)
        # XLA may compute x/s as x * (1/s): round-to-nearest ties can flip
        # by one ulp of the integer grid — allow a <0.5% off-by-one tail
        diff = np.abs(qa - qb)
        assert diff.max() <= 1
        assert (diff != 0).mean() < 0.005
        np.testing.assert_allclose(
            np.asarray(host_q["kernel"].scale).reshape(-1),
            np.asarray(dev_q["kernel"].scale).reshape(-1),
            rtol=1e-6,
        )

    def test_fallback_config_delegates(self):
        from ao_tpu.integrations.loader import quantize_on_load

        w = jax.random.normal(jax.random.PRNGKey(3), (64, 48), jnp.float32)
        out = quantize_on_load({"kernel": w}, ao_tpu.Float8WeightOnlyConfig())
        from ao_tpu.quantization.qarrays.float8 import Float8Array

        assert isinstance(out["kernel"], Float8Array)


class TestCppUnitTests:
    def test_cpp_unit_tests(self, tmp_path):
        """Build and run the native C++ test binary (csrc/test_ao_tpu_host.cpp)
        — the gtest-analog suite: bitpack roundtrips, quantize kernels vs
        device-parity semantics."""
        import shutil
        import subprocess

        if shutil.which("g++") is None:
            pytest.skip("no C++ toolchain")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        exe = str(tmp_path / "test_ao_tpu_host")
        subprocess.run(
            ["g++", "-O2", "-std=c++17",
             os.path.join(root, "csrc", "test_ao_tpu_host.cpp"),
             os.path.join(root, "csrc", "ao_tpu_host.cpp"),
             "-o", exe],
            check=True, capture_output=True, text=True,
        )
        out = subprocess.run([exe], capture_output=True, text=True)
        assert out.returncode == 0, out.stderr
        assert "all native tests passed" in out.stdout
