"""Real-TPU kernel tests (pallas vs emulated numerics gates).

Run with: AO_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -m tpu
(ref test model: kernel-vs-emulated numerics comparisons, SURVEY §4.4)
"""

import os

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu

if not os.environ.get("AO_TPU_TESTS"):
    pytest.skip("TPU suite disabled (set AO_TPU_TESTS=1)", allow_module_level=True)

from ao_tpu.ops import kernels, linear  # noqa: E402
from ao_tpu.quantization.primitives import compute_error  # noqa: E402
from ao_tpu.quantization.qarrays.int4 import Int4Array  # noqa: E402

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("m", [1, 8, 64, 200])
@pytest.mark.parametrize("shape", [(2048, 2048), (4096, 11008)])
@pytest.mark.parametrize("g", [64, 128])
def test_int4_kernel_matches_emulated(m, shape, g):
    k, n = shape
    w = jax.random.normal(KEY, (k, n), jnp.float32) * 0.02
    x = jax.random.normal(KEY, (m, k), jnp.bfloat16)
    qw = Int4Array.from_hp(w, g)
    with kernels.backend("emulated"):
        y_ref = linear(x, qw)
    with kernels.backend("pallas"):
        y = linear(x, qw)
    assert compute_error(y_ref, y) > 40.0


def test_int4_magic_vs_halves_kernels():
    """Both layouts' Pallas kernels agree with each other and emulated."""
    w = jax.random.normal(KEY, (2048, 2048), jnp.float32) * 0.02
    x = jax.random.normal(KEY, (8, 2048), jnp.bfloat16)
    qm = Int4Array.from_hp(w, 128)
    assert qm.layout == "magic"
    qh = qm.to_layout("halves")
    with kernels.backend("pallas"):
        ym = linear(x, qm)
        yh = linear(x, qh)
    with kernels.backend("emulated"):
        y_ref = linear(x, qm)
    assert compute_error(y_ref, ym) > 40.0
    assert compute_error(y_ref, yh) > 40.0
    assert compute_error(ym, yh) > 40.0


def test_int4_magic_nonzero_mean_activations():
    """The unshifted 128+u decode adds a ~128*s*sum(x) common-mode term per
    group that the folded -136*s bias FMA cancels; with ZERO-mean x the
    cancellation error hides. Post-GELU/ReLU MLP inputs are strongly
    non-centered — bound the f32 cancellation error in that regime (abs of
    gaussian ~ half-normal, mean 0.8*sigma) at large K."""
    w = jax.random.normal(KEY, (4096, 2048), jnp.float32) * 0.02
    x = jnp.abs(jax.random.normal(KEY, (8, 4096), jnp.float32)).astype(
        jnp.bfloat16)
    qm = Int4Array.from_hp(w, 128)
    assert qm.layout == "magic"
    with kernels.backend("pallas"):
        y = linear(x, qm)
    with kernels.backend("emulated"):
        y_ref = linear(x, qm)
    assert compute_error(y_ref, y) > 40.0


@pytest.mark.parametrize("m", [1, 8, 64])
def test_mxfp4_kernel_matches_emulated(m):
    from ao_tpu.quantization.qarrays.mx import MXArray

    w = jax.random.normal(KEY, (2048, 2048), jnp.float32) * 0.02
    x = jax.random.normal(KEY, (m, 2048), jnp.bfloat16)
    qw = MXArray.from_hp(w, elem_dtype="float4_e2m1fn")
    assert qw.layout == "magic"
    with kernels.backend("emulated"):
        y_ref = linear(x, qw)
    with kernels.backend("pallas"):
        y = linear(x, qw)
    # integer exponent-add reproduces the emulated dequant bit-exactly up
    # to the bf16 output cast
    assert compute_error(y_ref, y) > 50.0


@pytest.mark.parametrize("m", [1, 8, 64])
def test_nvfp4_kernel_matches_emulated(m):
    from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array

    w = jax.random.normal(KEY, (2048, 2048), jnp.float32) * 0.02
    x = jax.random.normal(KEY, (m, 2048), jnp.bfloat16)
    qw = NVFP4Array.from_hp(w)
    assert qw.layout == "magic"
    with kernels.backend("emulated"):
        y_ref = linear(x, qw)
    with kernels.backend("pallas"):
        y = linear(x, qw)
    assert compute_error(y_ref, y) > 40.0


@pytest.mark.parametrize("m", [1, 8, 64])
def test_w4a8_kernel_matches_emulated(m):
    """Int8DynamicActivationInt4Weight: the i8-MXU kernel vs the q/dq
    fallback (same activation quantization, float dot)."""
    import ao_tpu

    w = jax.random.normal(KEY, (2048, 2048), jnp.float32) * 0.02
    x = jax.random.normal(KEY, (m, 2048), jnp.bfloat16)
    qw = ao_tpu.quantize_(
        {"kernel": w},
        ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=128),
    )["kernel"]
    assert qw.layout == "magic8" and qw.act_quant is not None
    with kernels.backend("emulated"):
        y_ref = linear(x, qw)
    with kernels.backend("pallas"):
        y = linear(x, qw)
    # the i8 core computes the same quantized contract exactly; residual
    # is the fallback's f32 dequant-dot vs i32-exact dot rounding
    assert compute_error(y_ref, y) > 40.0


def test_int4_kernel_hqq_weights():
    w = jax.random.normal(KEY, (2048, 2048), jnp.float32) * 0.02
    x = jax.random.normal(KEY, (4, 2048), jnp.bfloat16)
    qw = Int4Array.from_hp(w, 128, algorithm="hqq")
    with kernels.backend("emulated"):
        y_ref = linear(x, qw)
    with kernels.backend("pallas"):
        y = linear(x, qw)
    assert compute_error(y_ref, y) > 40.0


class TestFlashAttentionTPU:
    @pytest.mark.parametrize("shape", [(1, 4, 256, 128), (2, 8, 512, 128)])
    def test_matches_xla(self, shape):
        from ao_tpu.ops.pallas.flash_attention import flash_attention

        b, h, s, d = shape
        q = jax.random.normal(KEY, shape, jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.bfloat16)
        out = flash_attention(q, k, v, causal=True)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (d**-0.5)
        mask = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(mask, scores, -1e30)
        ref = jnp.einsum(
            "bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1).astype(jnp.bfloat16), v
        )
        assert compute_error(ref, out) > 20.0

    def test_cross_attention_no_causal(self):
        from ao_tpu.ops.pallas.flash_attention import flash_attention

        q = jax.random.normal(KEY, (1, 2, 128, 128), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 384, 128), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 384, 128), jnp.bfloat16)
        out = flash_attention(q, k, v, causal=False)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (128**-0.5)
        ref = jnp.einsum(
            "bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1).astype(jnp.bfloat16), v
        )
        assert compute_error(ref, out) > 20.0


def test_fp8_blockwise_kernel_matches_emulated():
    """DeepSeek-style 1x128 act x 128x128 weight blockwise fp8 GEMM."""
    from ao_tpu.quantization.qarrays.common import ActQuantSpec
    from ao_tpu.quantization.qarrays.float8 import Float8Array

    k, n = 1024, 1024
    w = jax.random.normal(KEY, (k, n), jnp.float32) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1), (64, k), jnp.bfloat16)
    qw = Float8Array.from_hp(
        w, block_size=(128, 128),
        act_quant=ActQuantSpec(dtype="float8_e4m3fn",
                               granularity="per_group:128"),
    )
    with kernels.backend("emulated"):
        y_ref = linear(x, qw)
    with kernels.backend("pallas"):
        y = linear(x, qw)
    assert compute_error(y_ref, y) > 30.0


def test_fp8_blockwise_kernel_direct():
    from ao_tpu.ops.pallas.fp8_matmul import fp8_blockwise_matmul_pallas

    m, k, n = 8, 512, 512
    # clip into e4m3's finite range — overflow encodes as NaN in *fn dtypes
    qx = jnp.clip(jax.random.normal(KEY, (m, k)) * 100, -448, 448).astype(
        jnp.float8_e4m3fn)
    sx = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (m, k // 128))) + 0.5
    qw = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), (k, n)) * 100,
                  -448, 448).astype(jnp.float8_e4m3fn)
    sw = jnp.abs(jax.random.normal(jax.random.PRNGKey(3),
                                   (k // 128, n // 128))) + 0.5
    y = fp8_blockwise_matmul_pallas(qx, sx, qw, sw)
    # emulated reference
    xd = qx.astype(jnp.float32) * jnp.repeat(sx, 128, axis=1)
    wd = qw.astype(jnp.float32) * jnp.repeat(
        jnp.repeat(sw, 128, axis=0), 128, axis=1)
    assert compute_error(xd @ wd, y.astype(jnp.float32)) > 30.0


def test_bsr_kernel_matches_dense():
    """Block-sparse Pallas kernel vs dense reference of the pruned weight,
    and the sparse speed win at high sparsity."""
    from ao_tpu.sparsity.blocksparse import BlockSparseArray

    k, n, b = 1024, 1024, 128
    w = jax.random.normal(KEY, (k, n), jnp.float32) * 0.05
    qw = BlockSparseArray.from_hp(w, blocksize=b, keep_fraction=0.25)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, k), jnp.bfloat16)
    ref = jnp.matmul(x.astype(jnp.float32), qw.dequantize(jnp.float32))
    with kernels.backend("pallas"):
        y = linear(x, qw)
    assert compute_error(ref, y.astype(jnp.float32)) > 30


def test_bsr_kernel_batch_one():
    from ao_tpu.sparsity.blocksparse import BlockSparseArray

    w = jax.random.normal(KEY, (512, 640), jnp.float32) * 0.05
    qw = BlockSparseArray.from_hp(w, blocksize=128, keep_fraction=0.5)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 512), jnp.bfloat16)
    ref = jnp.matmul(x.astype(jnp.float32), qw.dequantize(jnp.float32))
    with kernels.backend("pallas"):
        y = linear(x, qw)
    assert compute_error(ref, y.astype(jnp.float32)) > 30


def test_decode_attention_kernel_parity():
    """Flash-decoding kernel vs XLA SDPA reference, bf16 and int8 caches."""
    from ao_tpu.ops.pallas.decode_attention import decode_attention

    b, h, hkv, d, t = 4, 8, 2, 128, 512
    q = jax.random.normal(KEY, (b, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, hkv, d), jnp.float32)
    lengths = jnp.array([512, 200, 128, 1], jnp.int32)

    def ref(q, k, v):
        g = h // hkv
        kk = jnp.repeat(k, g, axis=2).transpose(0, 2, 1, 3)
        vv = jnp.repeat(v, g, axis=2).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhd,bhtd->bht", q, kk) * d ** -0.5
        mask = jnp.arange(t)[None, None, :] < lengths[:, None, None]
        p = jax.nn.softmax(jnp.where(mask, s, -1e30), -1)
        return jnp.einsum("bht,bhtd->bhd", p, vv)

    y = decode_attention(q, k, v, lengths, block_t=128)
    assert compute_error(ref(q, k, v), y) > 40

    amax = jnp.max(jnp.abs(k), -1, keepdims=True)
    ks = jnp.maximum(amax, 1e-8) / 127.0
    kq = jnp.clip(jnp.round(k / ks), -127, 127).astype(jnp.int8)
    amax = jnp.max(jnp.abs(v), -1, keepdims=True)
    vs = jnp.maximum(amax, 1e-8) / 127.0
    vq = jnp.clip(jnp.round(v / vs), -127, 127).astype(jnp.int8)
    yq = decode_attention(q, kq, vq, lengths, k_scale=ks, v_scale=vs,
                          block_t=128)
    rq = ref(q, kq.astype(jnp.float32) * ks, vq.astype(jnp.float32) * vs)
    assert compute_error(rq, yq) > 40

    # int4 word-packed cache: plane-major magic decode in-kernel
    from ao_tpu.serving.kvcache import QuantKVCache

    ck = QuantKVCache.create(b, t, hkv, d, "int4").update(k, 0)
    cv = QuantKVCache.create(b, t, hkv, d, "int4").update(v, 0)
    y4 = decode_attention(q, ck.qdata, cv.qdata, lengths,
                          k_scale=ck.scale, v_scale=cv.scale, block_t=128)
    r4 = ref(q, ck.dequantize(jnp.float32), cv.dequantize(jnp.float32))
    assert compute_error(r4, y4) > 40

    # transposed-K ("kt") int8 cache — the serving default: i8×i8→i32 MXU
    # score dots against in-kernel-quantized q. q-quantization adds ~0.7%
    # relative error on top of the cache quantization, so gate at a
    # slightly lower (still tight) SQNR than the exact-dequant paths.
    ckt = QuantKVCache.create(b, t, hkv, d, "int8", layout="kt").update(k, 0)
    cvt = QuantKVCache.create(b, t, hkv, d, "int8").update(v, 0)
    ykt = decode_attention(q, ckt.qdata, cvt.qdata, lengths,
                           k_scale=ckt.scale, v_scale=cvt.scale,
                           k_layout="kt")
    rkt = ref(q, ckt.dequantize(jnp.float32), cvt.dequantize(jnp.float32))
    assert compute_error(rkt, ykt) > 30

    # fp8 K in kt layout (cvt mode: in-kernel fp8→bf16 + bf16 dots)
    ckf = QuantKVCache.create(b, t, hkv, d, "float8_e4m3fn",
                              layout="kt").update(k, 0)
    cvf = QuantKVCache.create(b, t, hkv, d, "float8_e4m3fn").update(v, 0)
    ykf = decode_attention(q, ckf.qdata, cvf.qdata, lengths,
                           k_scale=ckf.scale, v_scale=cvf.scale,
                           k_layout="kt")
    rkf = ref(q, ckf.dequantize(jnp.float32), cvf.dequantize(jnp.float32))
    assert compute_error(rkf, ykf) > 40

    # fp8 parity pair ("ktp" K + "ptok" V): byte-splice decode, the
    # serving default for fp8 caches
    ckp = QuantKVCache.create(b, t, hkv, d, "float8_e4m3fn",
                              layout="ktp").update(k, 0)
    cvp = QuantKVCache.create(b, t, hkv, d, "float8_e4m3fn",
                              layout="ptok").update(v, 0)
    ykp = decode_attention(q, ckp.qdata, cvp.qdata, lengths,
                           k_scale=ckp.scale, v_scale=cvp.scale,
                           k_layout="ktp")
    rkp = ref(q, ckp.dequantize(jnp.float32), cvp.dequantize(jnp.float32))
    assert compute_error(rkp, ykp) > 40

    # int4 plane pair ("ck4" channel-packed K + "ptok4" flat V): the
    # MXU-native kt-form int4 decode, the serving default for int4 caches
    ck4 = QuantKVCache.create(b, t, hkv, d, "int4",
                              layout="ck4").update(k, 0)
    cp4 = QuantKVCache.create(b, t, hkv, d, "int4",
                              layout="ptok4").update(v, 0)
    yc4 = decode_attention(q, ck4.qdata, cp4.qdata, lengths,
                           k_scale=ck4.scale, v_scale=cp4.scale,
                           k_layout="ck4")
    rc4 = ref(q, ck4.dequantize(jnp.float32), cp4.dequantize(jnp.float32))
    assert compute_error(rc4, yc4) > 40


def test_fused_act_quant_kernels():
    """Producer-epilogue quant kernels on real TPU vs the XLA math."""
    from ao_tpu.ops.pallas.fused_act import (
        gelu_quant_pallas, norm_modulate_quant_pallas, silu_mul_quant_pallas,
    )

    b, t, d = 2, 200, 256
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    h = jax.random.normal(ks[0], (b, t, d), jnp.bfloat16)
    sh = jax.random.normal(ks[1], (b, d), jnp.float32) * 0.1
    sm = jax.random.normal(ks[2], (b, d), jnp.float32) * 0.1
    q, s = norm_modulate_quant_pallas(h, sh, sm, 1e-6)
    xf = h.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    y = y * (1.0 + sm[:, None]) + sh[:, None]
    assert compute_error(y, q.astype(jnp.float32) * s) > 30

    yy = jax.random.normal(ks[3], (b, t, d), jnp.bfloat16) * 2
    q, s = gelu_quant_pallas(yy)
    ref_g = jax.nn.gelu(yy.astype(jnp.float32), approximate=True)
    assert compute_error(ref_g, q.astype(jnp.float32) * s) > 30

    q, s = silu_mul_quant_pallas(h, yy)
    ref_s = jax.nn.silu(h.astype(jnp.float32)) * yy.astype(jnp.float32)
    assert compute_error(ref_s, q.astype(jnp.float32) * s) > 30


def test_paged_attention_kernel_parity():
    """DMA-gather paged attention vs the XLA reference, bf16 + int8 pools."""
    import numpy as np

    from ao_tpu.ops.pallas.paged_attention import paged_decode_attention
    from ao_tpu.serving.paged import (
        PageAllocator, PagedKVPool, paged_decode_attention_reference,
    )

    b, h, hkv, d = 4, 8, 2, 128
    ps, n_pages, max_pages = 128, 24, 4
    for dtype_name, bound in (("bf16", 45), ("int8", 45), ("int4", 45)):
        kp = PagedKVPool.create(n_pages, ps, hkv, d, dtype_name)
        vp = PagedKVPool.create(n_pages, ps, hkv, d, dtype_name)
        alloc = PageAllocator(n_pages)
        lens = [400, 130, 256, 1]
        table = np.zeros((b, max_pages), np.int32)
        ks = jax.random.normal(KEY, (b, max_pages * ps, hkv, d), jnp.float32)
        vs = jax.random.normal(jax.random.PRNGKey(1),
                               (b, max_pages * ps, hkv, d), jnp.float32)
        for bi, ln in enumerate(lens):
            npg = -(-ln // ps)
            ids = [alloc.alloc() for _ in range(npg)]
            table[bi, :npg] = ids
            kp = kp.write_prompt(ks[bi, :npg * ps], jnp.asarray(ids, jnp.int32))
            vp = vp.write_prompt(vs[bi, :npg * ps], jnp.asarray(ids, jnp.int32))
        table = jnp.asarray(table)
        lengths = jnp.asarray(lens, jnp.int32)
        q = jax.random.normal(jax.random.PRNGKey(2), (b, h, d), jnp.float32)
        ref = paged_decode_attention_reference(q, kp, vp, table, lengths)
        y = paged_decode_attention(q, kp, vp, table, lengths,
                                   pages_per_chunk=2)
        assert compute_error(ref, y) > bound, dtype_name



class TestInt8Kernel:
    def test_int8_wo_pallas_vs_emulated(self):
        """Pallas int8-WO kernel vs the XLA epilogue-folded path."""
        import ao_tpu
        from ao_tpu.ops import kernels, linear

        w = jax.random.normal(jax.random.PRNGKey(0), (512, 256), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 512), jnp.bfloat16)
        q = ao_tpu.quantize_({"kernel": w},
                             ao_tpu.Int8WeightOnlyConfig())["kernel"]
        with kernels.backend("pallas"):
            y_pallas = linear(x, q)
        with kernels.backend("xla"):
            y_xla = linear(x, q)
        assert float(ao_tpu.compute_error(
            y_xla.astype(jnp.float32), y_pallas.astype(jnp.float32))) > 35.0

    def test_int8_wo_odd_shapes_fall_back(self):
        import ao_tpu
        from ao_tpu.ops import kernels, linear

        # K not 128-aligned → must fall back, not crash
        w = jax.random.normal(jax.random.PRNGKey(0), (96, 256), jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 96), jnp.bfloat16)
        q = ao_tpu.quantize_({"kernel": w},
                             ao_tpu.Int8WeightOnlyConfig())["kernel"]
        with kernels.backend("pallas"):
            y = linear(x, q)
        assert y.shape == (4, 256)


@pytest.mark.parametrize("m", [1, 8, 64])
def test_nf4_lut_kernel_matches_emulated(m):
    from ao_tpu.quantization.qarrays.nf4 import NF4Array

    w = jax.random.normal(KEY, (2048, 2048), jnp.float32) * 0.02
    x = jax.random.normal(KEY, (m, 2048), jnp.bfloat16)
    qw = NF4Array.from_hp(w, block_size=64)
    assert qw.layout == "magic"
    with kernels.backend("emulated"):
        y_ref = linear(x, qw)
    with kernels.backend("pallas"):
        y = linear(x, qw)
    assert compute_error(y_ref, y) > 40.0


@pytest.mark.parametrize("lut_block", [None, 512])
def test_codebook_lut_kernel_matches_emulated(lut_block):
    from ao_tpu.algorithms.codebook import CodebookArray

    w = jax.random.normal(KEY, (2048, 1024), jnp.float32) * 0.02
    x = jax.random.normal(KEY, (8, 2048), jnp.bfloat16)
    qw = CodebookArray.from_hp(w, bits=4, scale_block=64,
                               lut_block=lut_block)
    assert qw.layout == "magic"
    with kernels.backend("emulated"):
        y_ref = linear(x, qw)
    with kernels.backend("pallas"):
        y = linear(x, qw)
    assert compute_error(y_ref, y) > 40.0


def test_window_bias_attention_parity():
    """Fused SAM/ViTDet windowed attention (rel-pos via expansion-matrix
    dots, scores never in HBM) vs the XLA einsum+bias reference — both
    the heads-resident (side 14) and per-head-grid (side 32) variants."""
    from ao_tpu.ops.pallas.window_attention import window_bias_attention

    for side, g, nh, hd in ((14, 6, 4, 64), (32, 2, 4, 64)):
        t = side * side
        kq, kk, kv, kh, kw = jax.random.split(jax.random.PRNGKey(side), 5)
        q = jax.random.normal(kq, (g, t, nh, hd), jnp.bfloat16)
        k = jax.random.normal(kk, (g, t, nh, hd), jnp.bfloat16)
        v = jax.random.normal(kv, (g, t, nh, hd), jnp.bfloat16)
        rh = jax.random.normal(kh, (g, nh, t, side), jnp.float32) * 0.3
        rw = jax.random.normal(kw, (g, nh, t, side), jnp.float32) * 0.3

        y = window_bias_attention(q, k, v, rh, rw, side=side,
                                  scale=hd ** -0.5)

        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        s = s * hd ** -0.5
        cols = jnp.arange(t)
        eh = (cols[None, :] // side == jnp.arange(side)[:, None]
              ).astype(jnp.float32)
        ew = (cols[None, :] % side == jnp.arange(side)[:, None]
              ).astype(jnp.float32)
        s = s + rh @ eh + rw @ ew
        a = jax.nn.softmax(s, axis=-1)
        ref = jnp.einsum("bhqk,bkhd->bqhd", a, v.astype(jnp.float32))
        ref = ref.reshape(g, t, nh * hd)
        assert compute_error(ref, y.astype(jnp.float32)) > 35, side


def test_window_bias_attention_rejects_oversized_head():
    """side=64 (SAM-B/L at image 1024: T=4096) must raise UnsupportedShape
    from the feasibility gate — the per-head fallback would otherwise hold
    a ~192MB (4096, 4096) f32 score tile and die at Mosaic compile time
    where the model's except-clause could not catch it."""
    from ao_tpu.ops.pallas import UnsupportedShape
    from ao_tpu.ops.pallas.window_attention import window_bias_attention

    side, g, nh, hd = 64, 1, 2, 64
    t = side * side
    q = jnp.zeros((g, t, nh, hd), jnp.bfloat16)
    rh = jnp.zeros((g, nh, t, side), jnp.float32)
    with pytest.raises(UnsupportedShape):
        window_bias_attention(q, q, q, rh, rh, side=side, scale=hd ** -0.5)
