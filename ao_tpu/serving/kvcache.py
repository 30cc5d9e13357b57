"""Quantized KV cache (int8 / fp8 / int4) with per-token-per-head scales.

(ref analog: the reference's quantized-attention/KV-cache surface —
csrc/cpu/aten_kernels/quantized_sdpa.cpp int8/fp8 attention semantics and
prototype/attention fp8 SDPA; SURVEY §5 "long context" notes. TPU
re-design: the cache is a pytree of (qdata, scale) pairs, so sharding,
donation, and collectives apply leaf-wise. Scales are per (batch, pos,
kv_head) — one scalar per cached vector, stored HEAD-MAJOR (B, Hkv, T) so
the decode kernel's per-head score rows broadcast without any transposes —
which keeps dequantization a single fused multiply on load and halves
(int8/fp8) or quarters (int4) the HBM bytes the decode attention reads.

Layouts (``layout`` meta field):

* ``"tokens"``: qdata (B, T, Hkv, D) — the write-natural layout; V caches
  use it (the decode kernel's p·V dot reads (Tb, Hkv*D) slabs
  contiguously and contracts MXU-natively).
* ``"kt"``: qdata (B, Hkv, D, T) — K stored TRANSPOSED.  The q·K score
  contraction then rides q's lanes x K's sublanes directly, with no
  in-kernel transpose and (for int8) no int→float converts at all: the
  decode kernel quantizes q and issues i8×i8→i32 MXU dots
  (`ops/pallas/decode_attention.py`).  Measured 3.0x over tokens-layout
  int8 decode attention at T=4096 on v5e (457us -> 152us,
  `benchmarks/results/r4/attn_sol.json`).  `init_quant_kv_caches` creates
  K caches as "kt" for int8/fp8.

int4 mode (beyond the reference, which has no 4-bit KV): nibbles pack the
TOKEN axis into int32 words — word row r holds tokens 8r..8r+7, token
8r+4h+j at bits [4j+16h : +4) — the same "magic" bit geometry as the int4
weight kernels, so the decode kernel recovers (u-8) as bf16 with one
shift/and/or + an i32→bf16 bitcast per plane and zero int→float converts.
qdata is (B, T/8, Hkv, D) int32 (always tokens layout); the scale array is
(B, Hkv, T) f32 like every other mode."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization.qarrays.base import meta, qarray_dataclass
from ao_tpu.quantization.qarrays.common import canon_dtype

_QMAX = {"int8": 127.0, "float8_e4m3fn": 448.0, "float8_e5m2": 57344.0,
         "int4": 7.0}


def _kv_shift(o: int) -> int:
    """Bit offset of token-in-word slot o: word r holds token 8r+o at bits
    [4*(o%4) + 16*(o//4) : +4) — the i32→bf16 sublane-doubling bitcast then
    recovers plane j as rows 2r+h ↦ token 8r+4h+j, i.e. tokens ≡ j (mod 4)
    in order (see ops/pallas/decode_attention.py int4 mode)."""
    return 4 * (o % 4) + 16 * (o // 4)


def _pack_tok_int4(u: jax.Array) -> jax.Array:
    """Unsigned nibbles (T, H, D) int32 → (T/8, H, D) int32 words."""
    t = u.shape[0]
    ug = u.astype(jnp.int32).reshape(t // 8, 8, *u.shape[1:])
    word = jnp.zeros((t // 8,) + u.shape[1:], jnp.int32)
    for o in range(8):
        word = word | (ug[:, o] << _kv_shift(o))
    return word


def _unpack_tok_int4(word: jax.Array) -> jax.Array:
    """Inverse of :func:`_pack_tok_int4` → nibbles 0..15, (8R, H, D) int32."""
    r = word.shape[0]
    planes = [(word >> _kv_shift(o)) & 0xF for o in range(8)]
    return jnp.stack(planes, axis=1).reshape(8 * r, *word.shape[1:])


def _clamped_cols(starts: jax.Array, s_tok: int, t: int) -> jax.Array:
    """Write columns for per-slot s-token windows with clamp-at-last-row
    semantics, made DETERMINISTIC: positions past t-1 collapse onto t-1,
    and among tokens that collide only the LAST survives — the rest are
    sent out of bounds (t) for a ``mode="drop"`` scatter, so the result
    never depends on XLA's duplicate-index ordering."""
    cols = jnp.minimum(starts[:, None] + jnp.arange(s_tok)[None], t - 1)
    last = jnp.concatenate(
        [cols[:, 1:] != cols[:, :-1],
         jnp.ones((cols.shape[0], 1), bool)], axis=1)
    return jnp.where(last, cols, t)


@qarray_dataclass
class QuantKVCache:
    """One layer's K or V cache: quantized qdata + (B, Hkv, T) scales."""

    qdata: jax.Array
    scale: jax.Array
    dtype_name: str = meta(default="int8")
    layout: str = meta(default="tokens")

    @classmethod
    def create(cls, batch: int, max_seq: int, n_kv_heads: int, head_dim: int,
               dtype_name: str = "int8", layout: str = "tokens",
               ) -> "QuantKVCache":
        if dtype_name == "int4":
            if max_seq % 8:
                raise ValueError(f"int4 KV cache needs max_seq % 8 == 0, "
                                 f"got {max_seq}")
            if layout in ("ck4", "ptok4"):
                from ao_tpu.ops.pallas import plane_window

                if plane_window(max_seq) is None or head_dim % 8:
                    raise ValueError(
                        f"{layout} needs a plane-compatible max_seq/"
                        f"head_dim (got {max_seq}, {head_dim})")
                if layout == "ck4":
                    # channel-packed transposed K: 8 channel nibbles per
                    # word, token lanes plane-permuted at write time —
                    # a token write is a pure column scatter (no RMW)
                    qdata = jnp.zeros(
                        (batch, n_kv_heads, head_dim // 8, max_seq),
                        jnp.int32)
                else:
                    # token-word-packed V stored FLAT (avoids the
                    # in-decode-jit tile relayout) with plane-permuted
                    # scales
                    qdata = jnp.zeros(
                        (batch, max_seq // 8, n_kv_heads * head_dim),
                        jnp.int32)
            elif layout != "tokens":
                raise ValueError(
                    "int4 KV layouts: tokens (legacy words), ck4, ptok4")
            else:
                qdata = jnp.zeros(
                    (batch, max_seq // 8, n_kv_heads, head_dim), jnp.int32)
        elif layout in ("kt", "ktp"):
            if layout == "ktp":
                from ao_tpu.ops.pallas import parity_window

                if (dtype_name != "float8_e4m3fn"
                        or parity_window(max_seq) is None):
                    raise ValueError(
                        f"ktp layout needs an e4m3 cache with a parity-"
                        f"compatible max_seq (got {dtype_name}, {max_seq})")
            qdata = jnp.zeros(
                (batch, n_kv_heads, head_dim, max_seq),
                canon_dtype(dtype_name))
        elif layout == "ptok":
            from ao_tpu.ops.pallas import parity_window

            if dtype_name != "float8_e4m3fn" or parity_window(max_seq) is None:
                raise ValueError(
                    f"ptok layout needs an e4m3 cache with a parity-"
                    f"compatible max_seq (got {dtype_name}, {max_seq})")
            # stored FLAT (B, T, Hkv*D): the decode kernel streams
            # (Tb, Hkv*D) slabs, and a (B,T,H,D)->(B,T,H*D) reshape inside
            # the decode jit is a full-cache TPU tile RELAYOUT (measured
            # ~82us for 4x16.7MB at T=4096 — nearly the kernel's own cost)
            qdata = jnp.zeros((batch, max_seq, n_kv_heads * head_dim),
                              canon_dtype(dtype_name))
        else:
            qdata = jnp.zeros((batch, max_seq, n_kv_heads, head_dim),
                              canon_dtype(dtype_name))
        return cls(
            qdata=qdata,
            scale=jnp.zeros((batch, n_kv_heads, max_seq), jnp.float32),
            dtype_name=dtype_name,
            layout=layout,
        )

    @property
    def max_seq(self) -> int:
        return self.scale.shape[2]

    def quantize_values(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """x (B, S, H, D) hp → (q, scale) with per-vector scales.

        q follows x's token-major layout regardless of the cache layout
        (update() transposes on write); scale is (B, S, H, 1)."""
        qmax = _QMAX[self.dtype_name]
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / qmax
        v = xf / scale
        if self.dtype_name == "int8":
            q = jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8)
        elif self.dtype_name == "int4":
            # unsigned nibbles u = q+8 so the kernel's bf16-bitcast decode
            # (128+u → u-8) recovers the signed value directly
            q = (jnp.clip(jnp.round(v), -8, 7) + 8).astype(jnp.int32)
        else:
            q = jnp.clip(v, -qmax, qmax).astype(canon_dtype(self.dtype_name))
        return q, scale

    def update(self, x: jax.Array, index) -> "QuantKVCache":
        """Write new positions at ``index`` (B, S, H, D) → new cache.
        ``index`` may be a scalar (all rows at one offset) or a (B,) vector
        (continuous batching: per-slot positions)."""
        q, s = self.quantize_values(x)
        b, s_tok, h = q.shape[0], q.shape[1], q.shape[2]
        t = self.max_seq
        sh = s[..., 0].transpose(0, 2, 1)  # (B, H, S) head-major
        if self.layout in ("ktp", "ptok"):
            # pre-fold the splice kernel's 2^-120 rescale into the STORED
            # scale (K carries 2^60 — q brings the other 2^60 — V the full
            # 2^120): saves two full scale-array multiplies per decode
            # call; dequantize() compensates
            sh = sh * jnp.float32(2.0 ** (60 if self.layout == "ktp"
                                          else 120))
        per_slot = hasattr(index, "ndim") and getattr(index, "ndim", 0) == 1

        if self.dtype_name == "int4":
            starts = index if per_slot else jnp.full((b,), index, jnp.int32)
            cols = _clamped_cols(starts, s_tok, t)
            if self.layout in ("ck4", "ptok4"):
                from ao_tpu.ops.pallas import (
                    plane_major_perm, plane_slot, plane_window,
                )

                scalar_1tok = not per_slot and s_tok == 1
                pbt = plane_window(t)
                aligned = (not per_slot and s_tok > 1
                           and isinstance(index, int) and index % pbt == 0
                           and index + -(-s_tok // pbt) * pbt <= t)
                if aligned:
                    # whole-window prefill: gather + contiguous DUS (see
                    # the parity-layout fast path above); zero-pad fills
                    # masked positions with inert u=8 (value 0) nibbles
                    sp = -(-s_tok // pbt) * pbt
                    perm = plane_major_perm(pbt)
                    nw = sp // pbt
                    shp = jnp.pad(sh, ((0, 0), (0, 0), (0, sp - s_tok)))
                    shp = shp.reshape(b, h, nw, pbt)[..., perm].reshape(
                        b, h, sp)
                    scale = jax.lax.dynamic_update_slice(
                        self.scale, shp, (0, 0, index))
                    qp = jnp.pad(
                        q, ((0, 0), (0, sp - s_tok), (0, 0), (0, 0)),
                        constant_values=8)
                    if self.layout == "ck4":
                        d = q.shape[3]
                        ug = qp.reshape(b, sp, h, d // 8, 8)
                        word = jnp.zeros(ug.shape[:-1], jnp.int32)
                        for o in range(8):
                            word = word | (ug[..., o] << _kv_shift(o))
                        wk = word.transpose(0, 2, 3, 1)  # (B,H,D/8,S)
                        wk = wk.reshape(*wk.shape[:3], nw, pbt)[
                            ..., perm].reshape(*wk.shape[:3], sp)
                        qdata = jax.lax.dynamic_update_slice(
                            self.qdata, wk, (0, 0, 0, index))
                    else:  # ptok4: whole word rows, token-natural
                        words = jax.vmap(_pack_tok_int4)(
                            qp.reshape(b, sp, -1))
                        qdata = jax.lax.dynamic_update_slice(
                            self.qdata, words, (0, index // 8, 0))
                    return dataclasses.replace(
                        self, qdata=qdata, scale=scale)
                pcols = jnp.where(cols == t, t, plane_slot(cols, pbt))
                if self.layout == "ck4":
                    # pack 8 CHANNEL nibbles per word; one pure column
                    # write per token — no read-modify-write
                    d = q.shape[3]
                    ug = q.reshape(b, s_tok, h, d // 8, 8)
                    word = jnp.zeros(ug.shape[:-1], jnp.int32)
                    for o in range(8):
                        word = word | (ug[..., o] << _kv_shift(o))
                    wcol = word.transpose(0, 2, 3, 1)  # (B, H, D/8, S)
                    if scalar_1tok:
                        # decode step: contiguous single-column DUS — the
                        # vmap-scatter form measured 0.85x e2e where DUS
                        # layouts run 1.35x (decode_suite long4k)
                        pc = plane_slot(jnp.clip(index, 0, t - 1),
                                        plane_window(t))
                        qdata = jax.lax.dynamic_update_slice(
                            self.qdata, wcol, (0, 0, 0, pc))
                    else:
                        def one(qd, w, col):
                            return qd.at[:, :, col].set(w, mode="drop")

                        qdata = jax.vmap(one)(self.qdata, wcol, pcols)
                else:  # ptok4: flat token-words
                    if scalar_1tok:
                        # merge one nibble slot into one word row in place
                        # (3 integer ops) instead of the region
                        # unpack/repack
                        pos = jnp.clip(index, 0, t - 1)
                        row, o = pos // 8, pos % 8
                        shift = 4 * (o % 4) + 16 * (o // 4)
                        wrow = jax.lax.dynamic_slice(
                            self.qdata, (0, row, 0),
                            (b, 1, self.qdata.shape[2]))
                        nib = q.reshape(b, 1, -1).astype(jnp.int32)
                        wnew = (wrow & ~(0xF << shift)) | (nib << shift)
                        qdata = jax.lax.dynamic_update_slice(
                            self.qdata, wnew, (0, row, 0))
                    else:
                        qdata = self._scatter_int4(
                            q.reshape(b, s_tok, -1), starts, cols)
                if scalar_1tok:
                    pc = plane_slot(jnp.clip(index, 0, t - 1),
                                    plane_window(t))
                    scale = jax.lax.dynamic_update_slice(
                        self.scale, sh, (0, 0, pc))
                else:
                    scale = self._scatter_scale(sh, pcols)
                return dataclasses.replace(self, qdata=qdata, scale=scale)
            qdata = self._scatter_int4(q, starts, cols)
            # scales use the SAME duplicate-free clamped columns as the
            # words (a start-clamped dynamic_update_slice would SHIFT the
            # window instead for end-straddling writes, and duplicate
            # scatter indices would leave nibble/scale pairing to XLA's
            # unspecified duplicate ordering)
            scale = self._scatter_scale(sh, cols)
            return dataclasses.replace(self, qdata=qdata, scale=scale)

        if self.layout in ("ktp", "ptok"):
            # parity layouts ("ktp" K / "ptok" V, fp8 splice kernel): the
            # write columns map through parity_slot, so even a contiguous
            # token window scatters (cheap — decode writes 1 token/slot,
            # prefill writes are one-time)
            from ao_tpu.ops.pallas import (
                parity_major_perm, parity_slot, parity_window,
            )

            pbt = parity_window(t)
            starts = index if per_slot else jnp.full((b,), index, jnp.int32)
            scalar_1tok = not per_slot and s_tok == 1
            # window-aligned PREFILL fast path: whole permutation windows
            # write as an in-window GATHER + one contiguous DUS instead of
            # an O(s_tok) column scatter (XLA serializes scatters; a 4k
            # prompt's K write was the slow path)
            aligned = (not per_slot and s_tok > 1 and isinstance(index, int)
                       and index % pbt == 0
                       and index + -(-s_tok // pbt) * pbt <= t)
            if aligned:
                # pad the write to whole windows: positions past s_tok are
                # beyond the valid length (masked by the kernel, later
                # overwritten by decode steps), so the zero-fill is inert
                sp = -(-s_tok // pbt) * pbt
                perm = parity_major_perm(pbt)
                nw = sp // pbt
                shp = jnp.pad(sh, ((0, 0), (0, 0), (0, sp - s_tok)))
                shp = shp.reshape(b, h, nw, pbt)[..., perm].reshape(
                    b, h, sp)
                scale = jax.lax.dynamic_update_slice(
                    self.scale, shp, (0, 0, index))
                if self.layout == "ktp":
                    qk = q.transpose(0, 2, 3, 1)  # (B, H, D, S)
                    qk = jnp.pad(
                        qk, ((0, 0),) * 3 + ((0, sp - s_tok),))
                    qk = qk.reshape(*qk.shape[:3], nw, pbt)[
                        ..., perm].reshape(*qk.shape[:3], sp)
                    qdata = jax.lax.dynamic_update_slice(
                        self.qdata, qk, (0, 0, 0, index))
                else:  # ptok: values token-natural (no data permute)
                    qf = jnp.pad(q.reshape(b, s_tok, -1),
                                 ((0, 0), (0, sp - s_tok), (0, 0)))
                    qdata = jax.lax.dynamic_update_slice(
                        self.qdata, qf, (0, index, 0))
                return dataclasses.replace(self, qdata=qdata, scale=scale)
            cols = _clamped_cols(starts, s_tok, t)
            pcols = jnp.where(cols == t, t, parity_slot(cols, pbt))
            if self.layout == "ktp":
                qk = q.transpose(0, 2, 3, 1)  # (B, H, D, S)
                if scalar_1tok:
                    # decode step: single-column DUS beats the vmap
                    # scatter by ~1.5x e2e (see the ck4 note)
                    pc = parity_slot(jnp.clip(index, 0, t - 1), pbt)
                    qdata = jax.lax.dynamic_update_slice(
                        self.qdata, qk, (0, 0, 0, pc))
                else:
                    def one(qd, qn, col):
                        return qd.at[:, :, col].set(qn, mode="drop")

                    qdata = jax.vmap(one)(self.qdata, qk, pcols)
            else:  # ptok: token-natural values, flat (B, T, H*D) storage
                if scalar_1tok:
                    qdata = jax.lax.dynamic_update_slice(
                        self.qdata, q.reshape(b, 1, -1),
                        (0, jnp.clip(index, 0, t - 1), 0))
                else:
                    rows = jnp.arange(b)[:, None]
                    qdata = self.qdata.at[rows, cols].set(
                        q.reshape(b, s_tok, -1), mode="drop")
            if scalar_1tok:
                pc = parity_slot(jnp.clip(index, 0, t - 1), pbt)
                scale = jax.lax.dynamic_update_slice(
                    self.scale, sh, (0, 0, pc))
            else:
                scale = self._scatter_scale(sh, pcols)
            return dataclasses.replace(self, qdata=qdata, scale=scale)

        if self.layout == "kt":
            qk = q.transpose(0, 2, 3, 1)  # (B, H, D, S)
            if per_slot:
                cols = _clamped_cols(index, s_tok, t)

                def one(qd, qn, col):
                    return qd.at[:, :, col].set(qn, mode="drop")

                qdata = jax.vmap(one)(self.qdata, qk, cols)
                scale = self._scatter_scale(sh, cols)
            else:
                qdata = jax.lax.dynamic_update_slice(
                    self.qdata, qk, (0, 0, 0, index))
                scale = jax.lax.dynamic_update_slice(
                    self.scale, sh, (0, 0, index))
            return dataclasses.replace(self, qdata=qdata, scale=scale)

        if per_slot:
            # per-slot offsets; x may be an s-token window per slot
            # (speculative verify) — writes past the end clamp onto the
            # last row, later tokens win (duplicate-free scatter: earlier
            # clamped tokens are dropped, not racily overwritten)
            rows = jnp.arange(b)[:, None]
            cols = _clamped_cols(index, s_tok, t)
            qdata = self.qdata.at[rows, cols].set(q, mode="drop")
            scale = self._scatter_scale(sh, cols)
        else:
            qdata = jax.lax.dynamic_update_slice(
                self.qdata, q, (0, index, 0, 0))
            scale = jax.lax.dynamic_update_slice(
                self.scale, sh, (0, 0, index))
        return dataclasses.replace(self, qdata=qdata, scale=scale)

    def _scatter_scale(self, sh: jax.Array, cols: jax.Array) -> jax.Array:
        """sh (B, H, S) new scales into (B, H, T) at per-slot ``cols``
        (B, S); entries == T are dropped (duplicate-free clamp scheme)."""

        def one(sc, sn, col):
            return sc.at[:, col].set(sn, mode="drop")

        return jax.vmap(one)(self.scale, sh, cols)

    def _scatter_int4(self, u: jax.Array, starts: jax.Array,
                      cols: jax.Array) -> jax.Array:
        """Write per-batch s-token nibble windows into the packed words via
        an unpack→set→repack of the touched word-row region. ``cols`` is
        the :func:`_clamped_cols` output — the shared duplicate-free write
        columns (entries == t are dropped), so nibbles and scales always
        land as a pair."""
        s_tok = u.shape[1]
        n_rows, t = self.qdata.shape[1], self.max_seq
        region = min(s_tok // 8 + 2, n_rows)

        def one(words, ub, start, col):
            row0 = jnp.clip(jnp.minimum(start // 8, n_rows - region),
                            0, n_rows)
            zeros = (0,) * (words.ndim - 1)
            blk = jax.lax.dynamic_slice(
                words, (row0,) + zeros, (region,) + words.shape[1:])
            toks = _unpack_tok_int4(blk)
            # dropped entries (col == t) map past the region → drop mode
            pos = jnp.where(col == t, 8 * region, col - row0 * 8)
            toks = toks.at[pos].set(ub, mode="drop")
            return jax.lax.dynamic_update_slice(
                words, _pack_tok_int4(toks), (row0,) + zeros)

        return jax.vmap(one)(self.qdata, u, starts, cols)

    def insert_slot(self, other: "QuantKVCache", slot) -> "QuantKVCache":
        """Write ``other``'s (batch=1) rows 0..other.max_seq into this
        cache's ``slot`` batch row (engine prefill: scratch -> pool).

        Layout-aware: parity layouts translate between the scratch's and
        the pool's parity windows (a raw leaf-wise dynamic_update_slice
        would misalign tokens whenever plen != the pool window)."""
        if type(other) is not type(self):
            raise ValueError(f"cache type mismatch {type(other)}")
        t_scr = other.max_seq
        if self.layout in ("ktp", "ptok", "ck4", "ptok4"):
            from ao_tpu.ops.pallas import (
                parity_slot, parity_window, plane_slot, plane_window,
            )

            slot_fn, win_fn = ((parity_slot, parity_window)
                               if self.layout in ("ktp", "ptok")
                               else (plane_slot, plane_window))
            toks = jnp.arange(t_scr)
            dst = slot_fn(toks, win_fn(self.max_seq))
            legacy = other.layout in ("tokens", "kt")
            if other.layout == self.layout:
                src = slot_fn(toks, win_fn(t_scr))
                scale_src = other.scale[0][:, src]
            elif legacy:
                # scratch prefill caches fall back to the legacy layouts
                # when their bucket length has no parity/plane window:
                # translate token order AND (fp8) re-fold the splice's
                # scale factor the fast layouts pre-store
                scale_src = other.scale[0]
                if self.layout in ("ktp", "ptok"):
                    scale_src = scale_src * jnp.float32(
                        2.0 ** (60 if self.layout == "ktp" else 120))
            else:
                raise ValueError(
                    f"layout mismatch {other.layout}/{self.layout}")
            # NB: mixing a basic slice with the advanced index `dst` moves
            # the indexed dim FIRST in the target shape — sources go in
            # token-major
            scale = self.scale.at[slot, :, dst].set(scale_src.T)
            if self.layout == "ktp":
                qsrc = (other.qdata[0][..., src] if not legacy
                        else other.qdata[0])  # kt scratch: natural cols
                qdata = self.qdata.at[slot, :, :, dst].set(
                    qsrc.transpose(2, 0, 1))
            elif self.layout == "ck4":
                if not legacy:
                    qsrc = other.qdata[0][..., src]
                else:  # tokens-int4 word scratch -> channel words
                    u = _unpack_tok_int4(other.qdata[0])  # (t, h, d)
                    h, d = u.shape[1], u.shape[2]
                    ug = u.reshape(t_scr, h, d // 8, 8)
                    w = jnp.zeros(ug.shape[:-1], jnp.int32)
                    for o in range(8):
                        w = w | (ug[..., o] << _kv_shift(o))
                    qsrc = w.transpose(1, 2, 0)  # (h, d/8, t)
                qdata = self.qdata.at[slot, :, :, dst].set(
                    qsrc.transpose(2, 0, 1))
            else:  # ptok/ptok4: token-natural values, plain row insert
                vals = other.qdata
                if legacy:  # (1, rows, h, d) -> flat (1, rows, h*d)
                    vals = vals.reshape(1, vals.shape[1], -1)
                qdata = jax.lax.dynamic_update_slice(
                    self.qdata, vals, (slot, 0, 0))
            return dataclasses.replace(self, qdata=qdata, scale=scale)
        if other.layout != self.layout:
            raise ValueError(f"layout mismatch {other.layout}/{self.layout}")
        qdata = jax.lax.dynamic_update_slice(
            self.qdata, other.qdata,
            (slot,) + (0,) * (self.qdata.ndim - 1))
        scale = jax.lax.dynamic_update_slice(
            self.scale, other.scale, (slot, 0, 0))
        return dataclasses.replace(self, qdata=qdata, scale=scale)

    def dequantize(self, out_dtype=jnp.bfloat16) -> jax.Array:
        """→ (B, T, Hkv, D) high-precision values, any layout."""
        if self.dtype_name == "int4":
            if self.layout in ("ck4", "ptok4"):
                from ao_tpu.ops.pallas import plane_slot, plane_window

                t = self.max_seq
                pcols = plane_slot(jnp.arange(t), plane_window(t))
                sc = self.scale[..., pcols].transpose(0, 2, 1)[..., None]
                if self.layout == "ck4":
                    w = self.qdata[..., pcols]  # (B, H, D/8, T) token-major
                    planes = [(w >> _kv_shift(o)) & 0xF for o in range(8)]
                    u = jnp.stack(planes, axis=3)  # (B, H, D/8, 8, T)
                    b, hh = u.shape[0], u.shape[1]
                    u = u.reshape(b, hh, -1, t).transpose(0, 3, 1, 2)
                else:
                    b = self.qdata.shape[0]
                    hh = self.scale.shape[1]
                    u = jax.vmap(_unpack_tok_int4)(self.qdata)
                    u = u.reshape(b, t, hh, -1)
                return ((u - 8).astype(jnp.float32) * sc).astype(out_dtype)
            sc = self.scale.transpose(0, 2, 1)[..., None]
            u = jax.vmap(_unpack_tok_int4)(self.qdata)
            return ((u - 8).astype(jnp.float32) * sc).astype(out_dtype)
        if self.layout in ("ktp", "ptok"):
            from ao_tpu.ops.pallas import parity_slot, parity_window

            t = self.max_seq
            pcols = parity_slot(jnp.arange(t), parity_window(t))
            unfold = 2.0 ** (-60 if self.layout == "ktp" else -120)
            sc = (self.scale[..., pcols] * jnp.float32(unfold)
                  ).transpose(0, 2, 1)[..., None]
            if self.layout == "ktp":
                x = self.qdata[..., pcols].transpose(0, 3, 1, 2)
            else:  # ptok: flat token-natural values
                b = self.qdata.shape[0]
                x = self.qdata.reshape(b, t, sc.shape[2], -1)
            return (x.astype(jnp.float32) * sc).astype(out_dtype)
        sc = self.scale.transpose(0, 2, 1)[..., None]  # (B, T, H, 1)
        if self.layout == "kt":
            x = self.qdata.transpose(0, 3, 1, 2)  # (B, T, H, D)
            return (x.astype(jnp.float32) * sc).astype(out_dtype)
        return (self.qdata.astype(jnp.float32) * sc).astype(out_dtype)


def init_quant_kv_caches(cfg, batch: int, max_seq: int,
                         dtype_name: str = "int8"):
    """Per-layer [(K-cache, V-cache)] matching llama.forward's interface.

    int8 K caches are created in the transposed "kt" layout so decode
    attention runs i8xi8 MXU dots transpose-free. fp8 uses the parity
    pair: K "ktp" (transposed, columns parity-permuted at write time) +
    V "ptok" (token-natural values, parity-permuted scales) so the
    byte-splice decode kernel runs with zero per-call permutes — measured
    97us @ T=4096 vs 152us int8 / 1136us via the f8->bf16 convert path
    (falls back to plain "kt" when max_seq has no parity window). int4
    word-packing streams contiguous i32 rows with its own geometry."""
    if dtype_name == "int8":
        k_layout, v_layout = "kt", "tokens"
    elif dtype_name == "float8_e4m3fn":
        from ao_tpu.ops.pallas import parity_window

        if parity_window(max_seq) is not None:
            k_layout, v_layout = "ktp", "ptok"
        else:
            k_layout, v_layout = "kt", "tokens"
    elif dtype_name == "int4":
        from ao_tpu.ops.pallas import plane_window

        if plane_window(max_seq) is not None and cfg.head_dim % 8 == 0:
            k_layout, v_layout = "ck4", "ptok4"
        else:
            k_layout, v_layout = "tokens", "tokens"
    else:
        k_layout, v_layout = "tokens", "tokens"
    return [
        (
            QuantKVCache.create(batch, max_seq, cfg.n_kv_heads, cfg.head_dim,
                                dtype_name, layout=k_layout),
            QuantKVCache.create(batch, max_seq, cfg.n_kv_heads, cfg.head_dim,
                                dtype_name, layout=v_layout),
        )
        for _ in range(cfg.n_layers)
    ]
