"""Paged decode attention — Pallas TPU, block tables + double-buffered DMA.

(Beyond reference parity: the vLLM-style paged-attention kernel, TPU-native.
torchao delegates paged serving to vLLM's CUDA kernels; here the page pool
stays in HBM as an unblocked ref and the kernel itself gathers each
sequence's pages with `make_async_copy`, double-buffered so the next chunk's
page DMAs hide behind the current chunk's flash-decoding math. The block
table and lengths are scalar-prefetch operands. int8/fp8 pools stream as
8-bit bytes; per-vector scales ride beside the pages and fold into
scores/probs (scale-commuted, no dequant multiplies). int4 pools stream as
word-packed nibbles (4 bits/value on the wire) and each page decodes to a
plane-major-sublane-stacked bf16 block via the magic i32→bf16 bitcast —
the same geometry as ops/pallas/decode_attention.py's int4 mode.)

Layout:
  pools   (P, page_size, Hkv·D)   — page-major; a page's head-slice is a
                                    (page_size, D) lane window
  scales  (P, Hkv, page_size)     — per-head rows, one lane-vector DMA per
                                    page (quantized pools need page_size=128)
  table   (B·max_pages,) int32    — scalar prefetch
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _make_kernel(ps, d, hkv, n_pb, chunk, sm_scale, mode, gp, out_dtype):
    n_chunks = n_pb // chunk
    tb = ps * chunk  # tokens per compute step
    rp = ps // 8 if mode == "int4" else ps  # buffer rows per page
    quantized = mode != "fp"

    def kernel(tab_ref, len_ref, q_ref, kpool, kscale, vpool, vscale,
               o_ref, kbuf, ksbuf, vbuf, vsbuf, sems):
        bi = pl.program_id(0)
        hi = pl.program_id(1)

        def page_dmas(slot, ci):
            """All DMAs for chunk ci into buffer ``slot``. Returns a list."""
            dmas = []
            for j in range(chunk):
                page = tab_ref[bi * n_pb + ci * chunk + j]
                dmas.append(pltpu.make_async_copy(
                    kpool.at[page, :, pl.ds(hi * d, d)],
                    kbuf.at[slot, pl.ds(j * rp, rp)],
                    sems.at[slot, 0, j],
                ))
                dmas.append(pltpu.make_async_copy(
                    vpool.at[page, :, pl.ds(hi * d, d)],
                    vbuf.at[slot, pl.ds(j * rp, rp)],
                    sems.at[slot, 1, j],
                ))
                if quantized:
                    # scales are (P, Hkv, ps) with ps lane-aligned (128):
                    # each page's head-row DMAs as one (ps,) lane vector
                    dmas.append(pltpu.make_async_copy(
                        kscale.at[page, hi], ksbuf.at[slot, j],
                        sems.at[slot, 2, j],
                    ))
                    dmas.append(pltpu.make_async_copy(
                        vscale.at[page, hi], vsbuf.at[slot, j],
                        sems.at[slot, 3, j],
                    ))
            return dmas

        for dma in page_dmas(0, 0):
            dma.start()

        q = q_ref[0, 0]  # (G, D) bf16

        def body(ci, carry):
            m_prev, l_prev, acc = carry
            slot = ci % 2
            nxt = (ci + 1) % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                for dma in page_dmas(nxt, ci + 1):
                    dma.start()

            for dma in page_dmas(slot, ci):
                dma.wait()

            if mode == "int4":
                # per-page plane-major sublane stack (see decode_attention
                # int4 mode): page block j contributes rows [j*ps,(j+1)*ps)
                # in plane_major_perm(ps) token order
                from ao_tpu.ops.pallas import int4_words_to_bf16

                k, v = [
                    jnp.concatenate([
                        int4_words_to_bf16(buf[slot][j * rp:(j + 1) * rp])
                        for j in range(chunk)
                    ], axis=0)  # (tb, D)
                    for buf in (kbuf, vbuf)
                ]
            else:
                k = kbuf[slot]  # (tb, D)
                v = vbuf[slot]
                if quantized:
                    k = k.astype(jnp.bfloat16)
                    v = v.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # (G, tb)
            if quantized:
                s = s * ksbuf[slot].reshape(1, tb)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            if mode == "int4":
                # column → logical token: page pg, page-local plane-major i2
                pcap = ps // 4
                pg, i2 = col // ps, col % ps
                pos = pg * ps + 4 * (i2 % pcap) + i2 // pcap + ci * tb
            else:
                pos = col + ci * tb
            s = jnp.where(pos < len_ref[bi], s, _NEG)

            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            pv = (p * vsbuf[slot].reshape(1, tb) if quantized
                  else p).astype(jnp.bfloat16)
            acc = acc * alpha + jax.lax.dot_general(
                pv, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((gp, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((gp, 1), jnp.float32)
        a0 = jnp.zeros((gp, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(out_dtype)

    return kernel, tb, n_chunks


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "mode", "ps", "gp", "chunk"),
)
def _impl(table, lengths, qg, kpages, kscale, vpages, vscale, *,
          sm_scale, mode, ps, gp, chunk):
    b, hkv, _, d = qg.shape
    n_pb = table.shape[0] // b
    kernel, tb, _ = _make_kernel(
        ps, d, hkv, n_pb, chunk, sm_scale, mode, gp, jnp.float32
    )
    pool_dt = kpages.dtype
    buf_rows = tb // 8 if mode == "int4" else tb
    del _

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, gp, d),
                         lambda bi, hi, tab, ln: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # k pool, HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # k scales
            pl.BlockSpec(memory_space=pltpu.ANY),  # v pool
            pl.BlockSpec(memory_space=pltpu.ANY),  # v scales
        ],
        out_specs=pl.BlockSpec(
            (1, 1, gp, d), lambda bi, hi, tab, ln: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, buf_rows, d), pool_dt),  # k double buffer
            pltpu.VMEM((2, chunk, ps), jnp.float32),  # k scales
            pltpu.VMEM((2, buf_rows, d), pool_dt),  # v
            pltpu.VMEM((2, chunk, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4, chunk)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gp, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(table, lengths, qg, kpages, kscale, vpages, vscale)


def paged_decode_attention(
    q: jax.Array,  # (B, H, D)
    k_pool, v_pool,  # serving.paged.PagedKVPool
    block_table: jax.Array,  # (B, max_pages) int32
    lengths: jax.Array,  # (B,)
    sm_scale=None,
    pages_per_chunk: int = 8,
) -> jax.Array:
    b, h, d = q.shape
    int4 = k_pool.dtype_name == "int4"
    n_pages, hkv = k_pool.pages.shape[0], k_pool.pages.shape[2]
    ps = k_pool.page_size
    max_pages = block_table.shape[1]
    g = h // hkv
    if d % 128:
        raise UnsupportedShape(f"D={d} not lane-aligned")
    quantized = k_pool.scale is not None
    mode = "int4" if int4 else ("vec8" if quantized else "fp")
    if ps % 8:
        raise UnsupportedShape(f"page_size {ps} not sublane-aligned")
    if quantized and ps % 128:
        # quantized pools need lane-aligned per-page scale rows
        raise UnsupportedShape(f"quantized pool needs page_size %128, got {ps}")
    if g * hkv != h:
        raise UnsupportedShape(f"H={h} vs Hkv={hkv}")
    while max_pages % pages_per_chunk:
        pages_per_chunk //= 2
    sm = float(sm_scale if sm_scale is not None else d ** -0.5)

    gp = max(8, g)
    qg = q.astype(jnp.bfloat16).reshape(b, hkv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))

    rows = ps // 8 if int4 else ps
    kpages = k_pool.pages.reshape(n_pages, rows, hkv * d)
    vpages = v_pool.pages.reshape(n_pages, rows, hkv * d)
    if quantized:
        kscale = k_pool.scale.reshape(n_pages, ps, hkv).transpose(0, 2, 1)
        vscale = v_pool.scale.reshape(n_pages, ps, hkv).transpose(0, 2, 1)
        if int4:
            # page-local plane-major permutation to match the kernel's
            # nibble-plane stacking (see decode_attention int4 mode)
            from ao_tpu.ops.pallas import plane_major_perm

            perm = plane_major_perm(ps)
            kscale = kscale[..., perm]
            vscale = vscale[..., perm]
    else:  # dummies (never read)
        kscale = jnp.zeros((1, hkv, ps), jnp.float32)
        vscale = kscale

    out = _impl(
        block_table.reshape(-1).astype(jnp.int32),
        lengths.astype(jnp.int32), qg, kpages, kscale, vpages, vscale,
        sm_scale=sm, mode=mode, ps=ps, gp=gp,
        chunk=pages_per_chunk,
    )
    return out[:, :, :g].reshape(b, h, d)
