"""Pallas kernel logic tests on CPU via TPU-interpret mode.

``pltpu.force_tpu_interpret_mode()`` executes the TPU kernels' dataflow on
CPU, so the fused GEMMs' bit-surgery (magic/magic8/fp4-magic layouts) is
guarded by the normal CPU suite even when no chip is attached. Numerics
must match the emulated (dequant+dot) dispatch within each scheme's
rounding level — the same contract the real-TPU suite
(tests/test_pallas_tpu.py) enforces on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import ao_tpu
from ao_tpu.ops import kernels, linear
from ao_tpu.quantization.primitives import compute_error


M, K, N = 8, 256, 128


@pytest.fixture(scope="module")
def xw():
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32) * 0.02
    return x, w


def _pallas_vs_emulated(x, qa, min_db):
    ref = linear(x, qa).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        with kernels.backend("pallas"):
            y = linear(x, qa).astype(jnp.float32)
    err = compute_error(ref, y)
    assert err > min_db, float(err)
    return err


class TestInterpretKernels:
    def test_int4_wo_magic(self, xw):
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        x, w = xw
        qa = Int4Array.from_hp(w, group_size=32)
        assert qa.layout == "magic"
        # bf16 in-kernel weight construction: ~50dB vs the f32 emulated path
        _pallas_vs_emulated(x, qa, 45)

    def test_int4_w4a8_magic8(self, xw):
        from ao_tpu.quantization.qarrays.common import ActQuantSpec
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        x, w = xw
        qa = Int4Array.from_hp(
            w, group_size=32,
            act_quant=ActQuantSpec(dtype="int8", granularity="per_token",
                                   symmetric=True))
        assert qa.layout == "magic8"
        # agreement at the bf16 scale-rounding level (the kernel's int8
        # dots are exact; the emulated path rounds through bf16)
        _pallas_vs_emulated(x, qa, 45)

    def test_int4_wo_halves(self, xw):
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        x, w = xw
        qa = Int4Array.from_hp(w, group_size=32, layout="halves")
        _pallas_vs_emulated(x, qa, 45)

    def test_int8_wo(self, xw):
        from ao_tpu.quantization.qarrays.int8 import Int8Array

        x, w = xw
        qa = Int8Array.from_hp(w, (K, 1))
        _pallas_vs_emulated(x, qa, 45)

    def test_mxfp4(self, xw):
        from ao_tpu.quantization.qarrays.mx import MXArray

        x, w = xw
        qa = MXArray.from_hp(w, elem_dtype="float4_e2m1fn")
        if qa.layout != "magic":
            pytest.skip("mx fp4 did not pick the magic layout")
        # integer exponent-add construction is bit-exact vs emulated
        _pallas_vs_emulated(x, qa, 60)

    def test_nvfp4(self, xw):
        from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array

        x, w = xw
        qa = NVFP4Array.from_hp(w)
        if getattr(qa, "layout", None) != "magic":
            pytest.skip("nvfp4 did not pick the magic layout")
        _pallas_vs_emulated(x, qa, 35)

    def test_magic8_requant_int8(self):
        """The prefill-W4A8 feeder: packed magic8 → per-channel int8 must
        match the XLA unpack→dequant→requant chain (1 LSB rounding-boundary
        wobble allowed — kernel rounds a'·u+b' in one f32 FMA)."""
        import numpy as np

        from ao_tpu.ops.pallas.int4_matmul import (
            int4_magic8_requant_int8_pallas,
        )
        from ao_tpu.quantization import primitives as P
        from ao_tpu.quantization.qarrays.common import ActQuantSpec
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        k, n, g = 512, 256, 64
        w = jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.float32)
        q = Int4Array.from_hp(
            w * 0.02, group_size=g,
            act_quant=ActQuantSpec("int8", granularity="per_token"))
        assert q.layout == "magic8"
        sg = q.scale.astype(jnp.float32)
        if q.zero_point_domain is P.ZeroPointDomain.FLOAT:
            bg = q.zero_point.astype(jnp.float32)
        elif q.zero_point is None:
            bg = -8.0 * sg
        else:
            bg = -(8.0 + q.zero_point.astype(jnp.float32)) * sg
        bound = jnp.maximum(jnp.abs(bg), jnp.abs(15.0 * sg + bg))
        s8 = jnp.maximum(jnp.max(bound, 0, keepdims=True) / 127.0, 1e-12)
        ref = jnp.clip(jnp.round(q.dequantize(jnp.float32) / s8),
                       -127, 127).astype(jnp.int8)
        with pltpu.force_tpu_interpret_mode():
            got = int4_magic8_requant_int8_pallas(q.qdata, sg, bg, s8, g)
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01

    def test_requant_tile_selection(self):
        """Interpret mode skips Mosaic's block-shape lowering checks, so pin
        the tile picker directly: every block's sublane dim must be a
        multiple of 8 or cover the full array (the K=14336 w2 weight picked
        pp=14 → a (28, 512) scale-row block and failed TPU lowering), and
        the word+out blocks must stay under the scoped-VMEM budget."""
        from ao_tpu.ops.pallas.int4_matmul import _requant_tiles

        for k, g, n in [(14336, 128, 4096), (4096, 128, 14336),
                        (4096, 128, 4096), (4096, 64, 4096), (512, 64, 256),
                        (14336, 64, 4096), (4096, 128, 11008),
                        (256, 128, 128), (8192, 32, 1280)]:
            npairs = k // (2 * g)
            pp, tn = _requant_tiles(npairs, g, n)
            assert npairs % pp == 0 and n % tn == 0, (k, g, n, pp, tn)
            # scale-row block (2*pp, tn): sublane multiple of 8 or full
            assert (2 * pp) % 8 == 0 or pp == npairs, (k, g, n, pp)
            # word block (pp*g//4, tn) and out block (2*pp*g, tn)
            assert (pp * g // 4) % 8 == 0 or pp == npairs, (k, g, n, pp)
            assert 2 * pp * g * tn + pp * g // 2 * tn * 4 <= 4 << 20, (
                k, g, n, pp, tn)


class TestInterpretDecodeAttention:
    def _reference(self, q, k, v, lengths, sm_scale):
        b, h, d = q.shape
        t, hkv = k.shape[1], k.shape[2]
        rep = h // hkv
        kf = jnp.repeat(k.astype(jnp.float32), rep, axis=2)  # (B, T, H, D)
        vf = jnp.repeat(v.astype(jnp.float32), rep, axis=2)
        s = jnp.einsum("bhd,bthd->bht", q.astype(jnp.float32), kf) * sm_scale
        mask = jnp.arange(t)[None, None, :] < lengths[:, None, None]
        s = jnp.where(mask, s, -1e30)
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bht,bthd->bhd", a, vf)

    def test_bf16_cache(self):
        from ao_tpu.ops.pallas.decode_attention import decode_attention

        b, t, h, hkv, d = 2, 128, 4, 2, 128
        kq = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(kq[0], (b, h, d), jnp.bfloat16)
        k = jax.random.normal(kq[1], (b, t, hkv, d), jnp.bfloat16)
        v = jax.random.normal(kq[2], (b, t, hkv, d), jnp.bfloat16)
        lengths = jnp.array([100, 37], jnp.int32)
        ref = self._reference(q, k, v, lengths, d ** -0.5)
        with pltpu.force_tpu_interpret_mode():
            y = decode_attention(q, k, v, lengths, sm_scale=d ** -0.5,
                                 block_t=128)
        assert compute_error(ref, y.astype(jnp.float32)) > 30

    def test_int8_cache(self):
        from ao_tpu.ops.pallas.decode_attention import decode_attention

        b, t, h, hkv, d = 2, 128, 4, 2, 128
        kq = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(kq[0], (b, h, d), jnp.bfloat16)
        k = jax.random.normal(kq[1], (b, t, hkv, d), jnp.float32)
        v = jax.random.normal(kq[2], (b, t, hkv, d), jnp.float32)
        ks = jnp.max(jnp.abs(k), axis=-1, keepdims=True) / 127.0
        vs = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0
        kq8 = jnp.clip(jnp.round(k / ks), -127, 127).astype(jnp.int8)
        vq8 = jnp.clip(jnp.round(v / vs), -127, 127).astype(jnp.int8)
        lengths = jnp.array([128, 64], jnp.int32)
        ref = self._reference(q, (kq8 * ks).astype(jnp.bfloat16),
                              (vq8 * vs).astype(jnp.bfloat16), lengths,
                              d ** -0.5)
        with pltpu.force_tpu_interpret_mode():
            y = decode_attention(q, kq8, vq8, lengths,
                                 k_scale=ks.astype(jnp.float32),
                                 v_scale=vs.astype(jnp.float32),
                                 sm_scale=d ** -0.5, block_t=128)
        assert compute_error(ref, y.astype(jnp.float32)) > 25

    def test_int4_cache(self):
        """Word-packed int4 cache: the kernel's plane-major magic decode
        must match attention over the dequantized cache exactly (same
        quantized values, same f32 softmax structure)."""
        from ao_tpu.ops.pallas.decode_attention import decode_attention
        from ao_tpu.serving.kvcache import QuantKVCache

        b, t, h, hkv, d = 2, 128, 4, 2, 128
        kq = jax.random.split(jax.random.PRNGKey(5), 3)
        q = jax.random.normal(kq[0], (b, h, d), jnp.bfloat16)
        k = jax.random.normal(kq[1], (b, t, hkv, d), jnp.float32)
        v = jax.random.normal(kq[2], (b, t, hkv, d), jnp.float32)
        ck = QuantKVCache.create(b, t, hkv, d, "int4").update(k, 0)
        cv = QuantKVCache.create(b, t, hkv, d, "int4").update(v, 0)
        lengths = jnp.array([128, 77], jnp.int32)
        ref = self._reference(q, ck.dequantize(jnp.bfloat16),
                              cv.dequantize(jnp.bfloat16), lengths, d ** -0.5)
        with pltpu.force_tpu_interpret_mode():
            y = decode_attention(q, ck.qdata, cv.qdata, lengths,
                                 k_scale=ck.scale, v_scale=cv.scale,
                                 sm_scale=d ** -0.5, block_t=128)
        err = compute_error(ref, y.astype(jnp.float32))
        assert err > 25, float(err)

    def test_fp8_ktp_cache(self):
        """fp8 parity layouts (ktp K + ptok V): the byte-splice decode +
        write-time parity permutation must match attention over the
        dequantized cache (near-exact — the splice is exact for e4m3
        normals and the 2^120 rescale folds into the scales)."""
        from ao_tpu.ops.pallas.decode_attention import decode_attention
        from ao_tpu.serving.kvcache import QuantKVCache

        b, t, h, hkv, d = 2, 128, 4, 2, 128
        kq = jax.random.split(jax.random.PRNGKey(6), 3)
        q = jax.random.normal(kq[0], (b, h, d), jnp.bfloat16)
        k = jax.random.normal(kq[1], (b, t, hkv, d), jnp.float32)
        v = jax.random.normal(kq[2], (b, t, hkv, d), jnp.float32)
        ck = QuantKVCache.create(b, t, hkv, d, "float8_e4m3fn",
                                 layout="ktp").update(k, 0)
        cv = QuantKVCache.create(b, t, hkv, d, "float8_e4m3fn",
                                 layout="ptok").update(v, 0)
        lengths = jnp.array([128, 77], jnp.int32)
        ref = self._reference(q, ck.dequantize(jnp.bfloat16),
                              cv.dequantize(jnp.bfloat16), lengths, d ** -0.5)
        with pltpu.force_tpu_interpret_mode():
            y = decode_attention(q, ck.qdata, cv.qdata, lengths,
                                 k_scale=ck.scale, v_scale=cv.scale,
                                 sm_scale=d ** -0.5, k_layout="ktp")
        err = compute_error(ref, y.astype(jnp.float32))
        assert err > 30, float(err)

    def test_int4_ck4_cache(self):
        """int4 plane layouts (ck4 channel-packed K + ptok4 flat V): the
        MXU-native kt-form decode must match attention over the
        dequantized cache exactly (same quantized values)."""
        from ao_tpu.ops.pallas.decode_attention import decode_attention
        from ao_tpu.serving.kvcache import QuantKVCache

        b, t, h, hkv, d = 2, 128, 4, 2, 128
        kq = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(kq[0], (b, h, d), jnp.bfloat16)
        k = jax.random.normal(kq[1], (b, t, hkv, d), jnp.float32)
        v = jax.random.normal(kq[2], (b, t, hkv, d), jnp.float32)
        ck = QuantKVCache.create(b, t, hkv, d, "int4",
                                 layout="ck4").update(k, 0)
        cv = QuantKVCache.create(b, t, hkv, d, "int4",
                                 layout="ptok4").update(v, 0)
        lengths = jnp.array([128, 77], jnp.int32)
        ref = self._reference(q, ck.dequantize(jnp.bfloat16),
                              cv.dequantize(jnp.bfloat16), lengths, d ** -0.5)
        with pltpu.force_tpu_interpret_mode():
            y = decode_attention(q, ck.qdata, cv.qdata, lengths,
                                 k_scale=ck.scale, v_scale=cv.scale,
                                 sm_scale=d ** -0.5, k_layout="ck4")
        err = compute_error(ref, y.astype(jnp.float32))
        assert err > 25, float(err)


class TestInterpretFusedActQuant:
    """Producer-epilogue activation quant kernels (fused_act.py) vs the
    unfused XLA composition — identical math, one HBM pass."""

    def test_norm_modulate_quant(self):
        from ao_tpu.ops.pallas.fused_act import norm_modulate_quant_pallas

        b, t, d = 2, 100, 256  # ragged T exercises the row padding
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        h = jax.random.normal(ks[0], (b, t, d), jnp.bfloat16)
        sh = jax.random.normal(ks[1], (b, d), jnp.float32) * 0.1
        sm = jax.random.normal(ks[2], (b, d), jnp.float32) * 0.1
        with pltpu.force_tpu_interpret_mode():
            q, s = norm_modulate_quant_pallas(h, sh, sm, 1e-6)
        xf = h.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
        y = y * (1.0 + sm[:, None]) + sh[:, None]
        got = q.astype(jnp.float32) * s
        assert compute_error(y, got) > 30
        assert q.shape == (b, t, d) and s.shape == (b, t, 1)

    def test_gelu_quant(self):
        from ao_tpu.ops.pallas.fused_act import gelu_quant_pallas

        y = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128),
                              jnp.bfloat16) * 2
        with pltpu.force_tpu_interpret_mode():
            q, s = gelu_quant_pallas(y)
        ref = jax.nn.gelu(y.astype(jnp.float32), approximate=True)
        assert compute_error(ref, q.astype(jnp.float32) * s) > 30

    def test_silu_mul_quant(self):
        from ao_tpu.ops.pallas.fused_act import silu_mul_quant_pallas

        ks = jax.random.split(jax.random.PRNGKey(2), 2)
        a = jax.random.normal(ks[0], (1, 32, 256), jnp.bfloat16)
        bb = jax.random.normal(ks[1], (1, 32, 256), jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            q, s = silu_mul_quant_pallas(a, bb)
        ref = jax.nn.silu(a.astype(jnp.float32)) * bb.astype(jnp.float32)
        assert compute_error(ref, q.astype(jnp.float32) * s) > 30


class TestInterpretFlashAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_flash_vs_reference(self, causal):
        from ao_tpu.ops.pallas.flash_attention import flash_attention

        b, h, s, d = 1, 2, 128, 128
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
        sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (d ** -0.5)
        if causal:
            mask = jnp.tril(jnp.ones((s, s), bool))
            sc = jnp.where(mask, sc, -1e30)
        ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(sc, -1),
                         v.astype(jnp.float32))
        with pltpu.force_tpu_interpret_mode():
            y = flash_attention(q, k, v, causal=causal)
        assert compute_error(ref, y.astype(jnp.float32)) > 30


class TestInterpretPagedAttention:
    @pytest.mark.parametrize("dtype_name", ["bf16", "int8", "int4"])
    def test_paged_vs_reference(self, dtype_name):
        from ao_tpu.ops.pallas.paged_attention import paged_decode_attention
        from ao_tpu.serving.paged import (
            PagedKVPool,
            paged_decode_attention_reference,
        )

        b, h, hkv, d, ps, n_pages = 2, 4, 2, 128, 128, 6
        kp = PagedKVPool.create(n_pages, ps, hkv, d, dtype_name)
        vp = PagedKVPool.create(n_pages, ps, hkv, d, dtype_name)
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        # fill pools with random content (quantized pools keep random scales)
        kdata = jax.random.normal(ks[0], kp.pages.shape, jnp.float32)
        vdata = jax.random.normal(ks[1], vp.pages.shape, jnp.float32)
        import dataclasses as dc

        def rep(pool, **kw):
            return dc.replace(pool, **kw)

        if dtype_name == "int8":
            ksc = jnp.max(jnp.abs(kdata), -1, keepdims=True) / 127.0
            vsc = jnp.max(jnp.abs(vdata), -1, keepdims=True) / 127.0
            kp = rep(kp, pages=jnp.round(kdata / ksc).astype(jnp.int8),
                     scale=ksc)
            vp = rep(vp, pages=jnp.round(vdata / vsc).astype(jnp.int8),
                     scale=vsc)
        elif dtype_name == "int4":
            # int4 pages are (P, ps/8, H, D) words: write via write_prompt
            kdata = jax.random.normal(ks[0], (n_pages, ps, hkv, d),
                                      jnp.float32)
            vdata = jax.random.normal(ks[1], (n_pages, ps, hkv, d),
                                      jnp.float32)
            kp = kp.write_prompt(kdata.reshape(n_pages * ps, hkv, d),
                                 jnp.arange(n_pages, dtype=jnp.int32))
            vp = vp.write_prompt(vdata.reshape(n_pages * ps, hkv, d),
                                 jnp.arange(n_pages, dtype=jnp.int32))
        else:
            kp = rep(kp, pages=kdata.astype(jnp.bfloat16))
            vp = rep(vp, pages=vdata.astype(jnp.bfloat16))
        q = jax.random.normal(ks[2], (b, h, d), jnp.bfloat16)
        block_table = jnp.array([[0, 2, 4], [1, 3, 5]], jnp.int32)
        lengths = jnp.array([300, 150], jnp.int32)
        ref = paged_decode_attention_reference(q, kp, vp, block_table, lengths)
        chunks = (1, 3) if dtype_name == "int4" else (1,)
        for ppc in chunks:  # int4: also multi-page chunks (per-page decode)
            with pltpu.force_tpu_interpret_mode():
                y = paged_decode_attention(q, kp, vp, block_table, lengths,
                                           pages_per_chunk=ppc)
            assert compute_error(ref.astype(jnp.float32),
                                 y.astype(jnp.float32)) > 25, ppc


class TestInterpretLut4:
    def test_nf4_magic_kernel(self, xw):
        """NF4's fused LUT kernel: magic-layout codes + masked select tree
        must match the dequant+matmul dispatch."""
        from ao_tpu.quantization.qarrays.nf4 import NF4Array

        x, w = xw
        qa = NF4Array.from_hp(w, block_size=64)
        assert qa.layout == "magic"
        _pallas_vs_emulated(x, qa, 40)

    def test_nf4_halves_fallback_unchanged(self, xw):
        from ao_tpu.quantization.qarrays.nf4 import NF4Array

        x, w = xw
        qa = NF4Array.from_hp(w[:96], block_size=32)  # 3 blocks: no magic
        assert qa.layout == "halves"
        ref = linear(x[:, :96], qa)
        with pltpu.force_tpu_interpret_mode():
            with kernels.backend("pallas"):
                y = linear(x[:, :96], qa)
        np.testing.assert_allclose(np.asarray(ref, np.float32),
                                   np.asarray(y, np.float32), atol=1e-3)

    def test_codebook_magic_kernel(self, xw):
        """Shared-LUT 4-bit codebook: packed magic codes + runtime k-means
        codebook through the same LUT kernel."""
        from ao_tpu.algorithms.codebook import CodebookArray

        x, w = xw
        qa = CodebookArray.from_hp(w, bits=4, scale_block=64)
        assert qa.layout == "magic"
        # storage actually halved: int32 (K/8, N) vs uint8 (K, N)
        assert qa.codes.size * 4 == w.shape[0] * w.shape[1] // 2
        _pallas_vs_emulated(x, qa, 40)

    def test_codebook_3bit_magic_kernel(self, xw):
        """2/3-bit shared LUTs ride the same kernel with a padded table."""
        from ao_tpu.algorithms.codebook import CodebookArray

        x, w = xw
        qa = CodebookArray.from_hp(w, bits=3, scale_block=64)
        assert qa.layout == "magic"
        _pallas_vs_emulated(x, qa, 40)

    def test_codebook_groupwise_lut_kernel(self, xw):
        """Per-row-block LUTs: static SMEM offsets per group iteration."""
        from ao_tpu.algorithms.codebook import CodebookArray

        x, w = xw
        qa = CodebookArray.from_hp(w, bits=4, scale_block=64, lut_block=128)
        assert qa.layout == "magic" and qa.codebook.ndim == 2
        _pallas_vs_emulated(x, qa, 40)


class TestInterpretGroupedMatmul:
    """Fused int4 grouped GEMMs over magic-packed expert stacks
    (ops/pallas/grouped_matmul.py) vs the dequant+ragged_dot dispatch."""

    E, T, GK, GN, G = 3, 8, 256, 128, 32

    def _setup(self, act_quant=None):
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        w = jax.random.normal(
            jax.random.PRNGKey(1), (self.E, self.GK, self.GN), jnp.float32
        ) * 0.02
        x = jax.random.normal(
            jax.random.PRNGKey(0), (self.T, self.GK), jnp.bfloat16
        )
        qa = Int4Array.from_hp(w, group_size=self.G, act_quant=act_quant)
        return x, qa

    def _fused_vs_ragged(self, x, qa, gs, min_db):
        from ao_tpu.moe.grouped import grouped_matmul
        from ao_tpu.ops import kernels

        with kernels.backend("xla"):
            ref = grouped_matmul(x, qa, gs).astype(jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            with kernels.backend("pallas"):
                y = grouped_matmul(x, qa, gs).astype(jnp.float32)
        err = compute_error(ref, y)
        assert err > min_db, float(err)

    def test_wo_magic_grouped(self):
        x, qa = self._setup()
        assert qa.layout == "magic"
        gs = jnp.array([3, 1, 4], jnp.int32)
        self._fused_vs_ragged(x, qa, gs, 45)

    def test_wo_magic_grouped_empty_expert(self):
        """Empty experts contribute nothing (mask all-zero)."""
        x, qa = self._setup()
        gs = jnp.array([0, 8, 0], jnp.int32)
        self._fused_vs_ragged(x, qa, gs, 45)

    def test_w4a8_magic8_grouped(self):
        from ao_tpu.quantization.qarrays.common import ActQuantSpec

        x, qa = self._setup(
            ActQuantSpec(dtype="int8", granularity="per_token",
                         symmetric=True))
        assert qa.layout == "magic8"
        gs = jnp.array([2, 5, 1], jnp.int32)
        # int8 activation quantization bounds the SQNR (same contract as
        # the 2-D W4A8 kernel: the int core itself is exact)
        self._fused_vs_ragged(x, qa, gs, 35)

    def test_grouped_large_t_falls_back(self):
        """T > 256 stays on the ragged_dot path (compute-bound regime)."""
        from ao_tpu.moe.grouped import grouped_matmul
        from ao_tpu.ops import kernels
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        w = jax.random.normal(
            jax.random.PRNGKey(1), (2, self.GK, self.GN), jnp.float32
        ) * 0.02
        qa = Int4Array.from_hp(w, group_size=self.G)
        x = jax.random.normal(
            jax.random.PRNGKey(0), (512, self.GK), jnp.bfloat16
        )
        gs = jnp.array([300, 212], jnp.int32)
        with kernels.backend("xla"):
            ref = grouped_matmul(x, qa, gs).astype(jnp.float32)
        # no interpret guard needed: the fallback is pure XLA
        with kernels.backend("pallas"):
            y = grouped_matmul(x, qa, gs).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(y))


class TestFrozenWeightSTE:
    """Inference containers carry an explicit straight-through backward
    (ops.linear.frozen_weight_ste): fused Pallas forwards define no VJP and
    activation rounding has zero natural gradient, but QLoRA-style training
    over frozen quantized bases still needs dL/dx flowing."""

    def _mk(self, **kw):
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32) * 0.02
        x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
        return x, Int4Array.from_hp(w, group_size=32, **kw)

    def test_grad_through_fused_matches_xla(self):
        x, qa = self._mk()

        def loss(x):
            return jnp.sum(linear(x, qa).astype(jnp.float32) ** 2)

        with pltpu.force_tpu_interpret_mode():
            with kernels.backend("pallas"):
                g_fused = jax.grad(loss)(x).astype(jnp.float32)
        with kernels.backend("xla"):
            g_xla = jax.grad(loss)(x).astype(jnp.float32)
        scale = float(jnp.max(jnp.abs(g_xla)))
        assert float(jnp.max(jnp.abs(g_fused - g_xla))) < 0.05 * scale

    def test_w4a8_act_rounding_grad_nonzero(self):
        """Dynamic-act rounding used to silently zero dL/dx; the STE
        backward restores it."""
        from ao_tpu.quantization.qarrays.common import ActQuantSpec

        x, qa = self._mk(act_quant=ActQuantSpec(
            dtype="int8", granularity="per_token", symmetric=True))
        with kernels.backend("xla"):
            g = jax.grad(lambda x: jnp.sum(
                linear(x, qa).astype(jnp.float32) ** 2))(x)
        assert float(jnp.linalg.norm(g.astype(jnp.float32))) > 1e-3

    def test_grouped_fused_grad(self):
        from ao_tpu.moe.grouped import grouped_matmul
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        w3 = jax.random.normal(
            jax.random.PRNGKey(2), (3, K, N), jnp.float32) * 0.02
        qg = Int4Array.from_hp(w3, group_size=32)
        x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
        gs = jnp.array([3, 1, 4], jnp.int32)

        def loss(x):
            return jnp.sum(grouped_matmul(x, qg, gs).astype(jnp.float32) ** 2)

        with pltpu.force_tpu_interpret_mode():
            with kernels.backend("pallas"):
                g_fused = jax.grad(loss)(x).astype(jnp.float32)
        with kernels.backend("xla"):
            g_xla = jax.grad(loss)(x).astype(jnp.float32)
        scale = float(jnp.max(jnp.abs(g_xla)))
        assert float(jnp.max(jnp.abs(g_fused - g_xla))) < 0.05 * scale


class TestExperimentalV6eKernels:
    """Interpret-mode parity for the EXPERIMENTAL kernels that lose to the
    XLA paths on v5e (no native fp8 MXU) and target fp8-native TPUs —
    "auto" never selects them here, so CPU interpret mode is the only
    hermetic gate that their dataflow stays correct (decision recorded in
    PARITY.md "v5e-dead kernels")."""

    def test_fp8_blockwise_interpret_parity(self):
        from ao_tpu.quantization.qarrays.common import ActQuantSpec
        from ao_tpu.quantization.qarrays.float8 import Float8Array

        k, n = 256, 256
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n),
                              jnp.float32) * 0.02
        x = jax.random.normal(jax.random.PRNGKey(0), (8, k), jnp.bfloat16)
        qw = Float8Array.from_hp(
            w, block_size=(128, 128),
            act_quant=ActQuantSpec(dtype="float8_e4m3fn",
                                   granularity="per_group:128"))
        ref = linear(x, qw).astype(jnp.float32)  # emulated/XLA reference
        with pltpu.force_tpu_interpret_mode():
            with kernels.backend("pallas"):
                y = linear(x, qw).astype(jnp.float32)
        assert compute_error(ref, y) > 30.0

    def test_bsr_interpret_parity(self):
        from ao_tpu.sparsity.blocksparse import BlockSparseArray

        w = jax.random.normal(jax.random.PRNGKey(2), (256, 256),
                              jnp.float32) * 0.05
        qw = BlockSparseArray.from_hp(w, blocksize=128, keep_fraction=0.5)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 256), jnp.bfloat16)
        ref = jnp.matmul(x.astype(jnp.float32), qw.dequantize(jnp.float32))
        with pltpu.force_tpu_interpret_mode():
            with kernels.backend("pallas"):
                y = linear(x, qw).astype(jnp.float32)
        assert compute_error(ref, y) > 30.0
