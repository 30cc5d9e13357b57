"""Paged KV cache: vLLM-style page pool + block tables, with int8/fp8/int4
pages (int4 word-packs 8 tokens per int32 along each page's token axis).

(Beyond reference parity: torchao delegates paged serving to vLLM; here the
page pool, allocator, and the paged-attention Pallas kernel are in-framework
and TPU-native. Memory for a sequence is allocated page-by-page as it
grows, so max_seq no longer reserves HBM per slot.)

Device state per layer (a pytree, shardable like any other):
  k_pages/v_pages: (num_pages, page_size, Hkv, D) bf16 or int8
  k_scale/v_scale: (num_pages, page_size, Hkv, 1) f32 (quantized pools)
Sequence state (shared across layers):
  block_table: (max_seqs, max_pages) int32 page ids
  lengths:     (max_seqs,) int32 valid token counts

The host-side :class:`PageAllocator` hands out / reclaims page ids; all
device ops are jittable with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization.qarrays.base import meta, qarray_dataclass

_QMAX = {"int8": 127.0, "float8_e4m3fn": 448.0, "int4": 7.0}


class PageAllocator:
    """Host-side free-list of page ids (page 0 is reserved as the null
    page so uninitialized block-table entries stay in-bounds)."""

    def __init__(self, num_pages: int):
        self.free: List[int] = list(range(num_pages - 1, 0, -1))

    def alloc(self) -> int:
        if not self.free:
            raise RuntimeError("KV page pool exhausted")
        return self.free.pop()

    def release(self, pages: List[int]) -> None:
        for p in pages:
            if p != 0:
                self.free.append(p)


@qarray_dataclass
class PagedKVPool:
    """One layer's K or V page pool."""

    pages: jax.Array  # (P, page_size, Hkv, D)
    scale: Optional[jax.Array]  # (P, page_size, Hkv, 1) or None (hp pool)
    page_size: int = meta(default=16)
    dtype_name: str = meta(default="bf16")

    @classmethod
    def create(cls, num_pages: int, page_size: int, n_kv_heads: int,
               head_dim: int, dtype_name: str = "bf16") -> "PagedKVPool":
        if dtype_name == "bf16":
            return cls(
                pages=jnp.zeros((num_pages, page_size, n_kv_heads, head_dim),
                                jnp.bfloat16),
                scale=None, page_size=page_size, dtype_name=dtype_name,
            )
        if dtype_name == "int4":
            # word-packed token axis per page, same bit geometry as the
            # slot cache (serving/kvcache.py) and the int4 weight kernels
            if page_size % 8:
                raise ValueError(
                    f"int4 pages need page_size % 8 == 0, got {page_size}")
            return cls(
                pages=jnp.zeros(
                    (num_pages, page_size // 8, n_kv_heads, head_dim),
                    jnp.int32),
                scale=jnp.zeros((num_pages, page_size, n_kv_heads, 1),
                                jnp.float32),
                page_size=page_size, dtype_name=dtype_name,
            )
        from ao_tpu.quantization.qarrays.common import canon_dtype

        return cls(
            pages=jnp.zeros((num_pages, page_size, n_kv_heads, head_dim),
                            canon_dtype(dtype_name)),
            scale=jnp.zeros((num_pages, page_size, n_kv_heads, 1),
                            jnp.float32),
            page_size=page_size, dtype_name=dtype_name,
        )

    def _quant(self, x: jax.Array):
        if self.dtype_name == "bf16":
            return x.astype(jnp.bfloat16), None
        qmax = _QMAX[self.dtype_name]
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / qmax
        if self.dtype_name == "int8":
            q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        elif self.dtype_name == "int4":
            # unsigned nibbles u = q+8 (kernel decodes u-8 via bf16 bitcast)
            q = (jnp.clip(jnp.round(xf / s), -8, 7) + 8).astype(jnp.int32)
        else:
            q = jnp.clip(xf / s, -qmax, qmax).astype(self.pages.dtype)
        return q, s

    def append_token(self, x: jax.Array, block_table: jax.Array,
                     lengths: jax.Array) -> "PagedKVPool":
        """Write one new token per sequence. x (B, Hkv, D); block_table
        (B, max_pages); lengths (B,) = positions BEFORE this token."""
        b = x.shape[0]
        page_idx = lengths // self.page_size
        page_ids = jnp.take_along_axis(
            block_table, page_idx[:, None], axis=1
        )[:, 0]  # (B,)
        offs = lengths % self.page_size
        q, s = self._quant(x)
        if self.dtype_name == "int4":
            # read-modify-write one nibble slot of one int32 word per seq
            # (bit geometry = kvcache._kv_shift: token 8r+4h+j at 4j+16h)
            wrow = offs // 8
            o = offs % 8
            shift = (4 * (o % 4) + 16 * (o // 4))[:, None, None]
            cur = self.pages[page_ids, wrow]  # (B, Hkv, D) int32
            new = (cur & ~(15 << shift)) | (q << shift)
            pages = self.pages.at[page_ids, wrow].set(new)
            scale = self.scale.at[page_ids, offs].set(s)
            return dataclasses.replace(self, pages=pages, scale=scale)
        pages = self.pages.at[page_ids, offs].set(q)
        scale = self.scale
        if scale is not None:
            scale = scale.at[page_ids, offs].set(s)
        return dataclasses.replace(self, pages=pages, scale=scale)

    def write_prompt(self, x: jax.Array, page_ids: jax.Array) -> "PagedKVPool":
        """Bulk-write a prefill: x (n_pages*page_size, Hkv, D) padded;
        page_ids (n_pages,) destination pages."""
        ps = self.page_size
        n = page_ids.shape[0]
        q, s = self._quant(x)
        q = q.reshape(n, ps, *x.shape[1:])
        if self.dtype_name == "int4":
            from ao_tpu.serving.kvcache import _pack_tok_int4

            q = jax.vmap(_pack_tok_int4)(q)  # (n, ps/8, Hkv, D) words
        pages = self.pages.at[page_ids].set(q)
        scale = self.scale
        if scale is not None:
            scale = scale.at[page_ids].set(
                s.reshape(n, ps, x.shape[1], 1)
            )
        return dataclasses.replace(self, pages=pages, scale=scale)

    def gather(self, block_table_row: jax.Array, out_dtype=jnp.bfloat16):
        """Debug/emulated path: materialize one sequence's (T, Hkv, D)."""
        pages = self.pages[block_table_row]  # (max_pages, ps[/8], Hkv, D)
        if self.dtype_name == "int4":
            from ao_tpu.serving.kvcache import _unpack_tok_int4

            u = jax.vmap(_unpack_tok_int4)(pages)  # (mp, ps, Hkv, D)
            x = (u - 8).astype(jnp.float32) * self.scale[block_table_row]
        else:
            x = pages.astype(jnp.float32)
            if self.scale is not None:
                x = x * self.scale[block_table_row]
        mp, ps, hkv, d = x.shape
        return x.reshape(mp * ps, hkv, d).astype(out_dtype)


def paged_decode_attention_reference(
    q: jax.Array,  # (B, H, D)
    k_pool: PagedKVPool,
    v_pool: PagedKVPool,
    block_table: jax.Array,  # (B, max_pages)
    lengths: jax.Array,  # (B,)
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """XLA reference: gather pages → dense decode attention. The Pallas
    fast path is ops/pallas/paged_attention.py."""
    b, h, d = q.shape
    hkv = k_pool.pages.shape[2]
    g = h // hkv
    sm = sm_scale if sm_scale is not None else d ** -0.5

    def one(qb, row, ln):
        k = k_pool.gather(row, jnp.float32)  # (T, Hkv, D)
        v = v_pool.gather(row, jnp.float32)
        kk = jnp.repeat(k, g, axis=1)  # (T, H, D)
        vv = jnp.repeat(v, g, axis=1)
        s = jnp.einsum("hd,thd->ht", qb.astype(jnp.float32), kk) * sm
        mask = jnp.arange(s.shape[1]) < ln
        s = jnp.where(mask[None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("ht,thd->hd", p, vv)

    return jax.vmap(one)(q, block_table, lengths)


def paged_attention(q, k_pool, v_pool, block_table, lengths, sm_scale=None):
    """Dispatching entry: Pallas DMA kernel on TPU, XLA reference elsewhere."""
    from ao_tpu.ops import kernels as _kernels

    if _kernels.on_tpu() and _kernels.get_backend() in ("auto", "pallas"):
        from ao_tpu.ops.pallas import UnsupportedShape
        from ao_tpu.ops.pallas.paged_attention import paged_decode_attention

        try:
            return paged_decode_attention(
                q, k_pool, v_pool, block_table, lengths, sm_scale=sm_scale
            )
        except UnsupportedShape:
            pass
    return paged_decode_attention_reference(
        q, k_pool, v_pool, block_table, lengths, sm_scale=sm_scale
    )
