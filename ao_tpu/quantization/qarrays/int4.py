"""Int4Array — packed int4 weights with groupwise scales (+ zeros).

(ref: torchao .../workflows/int4/int4_tensor.py:57 ``Int4Tensor`` and
int4_tile_packed_to_4d_tensor.py:31; packing re-designed for TPU.)

TPU-native packing ("group-local split-halves", axis -2): instead of pairing
adjacent k indices in one byte (which needs a sublane interleave to undo) or
WGMMA shuffles, each quantization group of ``g`` logical rows is stored as
``g/2`` bytes where byte ``j`` holds logical rows ``j`` (low nibble) and
``j + g/2`` (high nibble) *of that group*::

    u.reshape(ng, g, n);  packed[gi, j] = u[gi, j] | (u[gi, j + g//2] << 4)
    unpack: concat([p & 0xF, p >> 4], axis=1)     # within each group

Properties that matter on TPU:
  * unpack = two cheap vector ops + a sublane concat inside the per-group
    reshape the dequant does anyway — no lane/sublane interleave;
  * packing locality is *group-local*, so sharding the K axis at any
    group-aligned boundary (tensor-parallel row sharding) keeps packed
    bytes, scales, and activations aligned on every shard;
  * the fused kernel issues a single MXU dot per tile.
Nibbles are stored offset-binary (u = q + 8 ∈ [0, 15]).

Supports both zero-point domains:
  * INT:   dq = (u - 8 - zp) * scale              (plain asymmetric/symmetric)
  * FLOAT: dq = (u - 8) * scale + zp              (tinygemm-style, ref
            quant_primitives.py:498)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.qarrays.common import ActQuantSpec


def pack_int4(u: jax.Array, group_size: int, axis: int = -2) -> jax.Array:
    """Pack unsigned nibbles (0..15) along ``axis`` with the group-local
    split-half layout. ``u.shape[axis]`` must be a multiple of ``group_size``
    and ``group_size`` must be even."""
    axis = axis % u.ndim
    k = u.shape[axis]
    g = group_size
    if g % 2 != 0 or k % g != 0:
        raise ValueError(f"K={k} must be a multiple of even group_size={g}")
    shape = u.shape
    ub = u.astype(jnp.uint8).reshape(
        shape[:axis] + (k // g, g) + shape[axis + 1 :]
    )
    lo, hi = jnp.split(ub, 2, axis=axis + 1)
    packed = lo | (hi << 4)
    return packed.reshape(shape[:axis] + (k // 2,) + shape[axis + 1 :])


def unpack_int4(packed: jax.Array, group_size: int, axis: int = -2) -> jax.Array:
    """Inverse of :func:`pack_int4`; returns uint8 values 0..15."""
    axis = axis % packed.ndim
    kp = packed.shape[axis]
    gh = group_size // 2
    shape = packed.shape
    pb = packed.reshape(shape[:axis] + (kp // gh, gh) + shape[axis + 1 :])
    lo = pb & jnp.uint8(0xF)
    hi = pb >> 4
    u = jnp.concatenate([lo, hi], axis=axis + 1)
    return u.reshape(shape[:axis] + (2 * kp,) + shape[axis + 1 :])


def pack_int4_magic(u: jax.Array, group_size: int) -> jax.Array:
    """Pack unsigned nibbles (K, N) into the "magic" int32 layout (K/8, N).

    Word-row r = (g/2)*t + r' holds, at bits [4j + 16h : +4), the nibble of
    logical row (4t + j)*g + 2r' + h. Consequences the fused kernel exploits
    (ops/pallas/int4_matmul.py): extracting bit-plane j of a word block and
    bitcasting i32→bf16 (sublane-doubling) yields the rows of quantization
    groups {g' ≡ j (mod 4)} in natural order as bf16 values 128+u — nibble→
    bf16 costs 3 integer ops per TWO weights, with no int→float converts.
    Requires (K/group_size) % 4 == 0.

    Leading batch dims (expert stacks, (E, K, N)) pack per-slice: since each
    slice's group count is a multiple of 4, the flattened (E*K, N) reshape
    never mixes experts within a word block, so the 2-D path is exact.
    """
    if u.ndim > 2:
        lead = u.shape[:-2]
        k, n = u.shape[-2:]
        w2 = pack_int4_magic(u.reshape(-1, n), group_size)
        return w2.reshape(*lead, k // 8, n)
    k, n = u.shape
    g = group_size
    ngroups = k // g
    if ngroups % 4 != 0:
        raise ValueError(
            f"magic int4 layout needs K/group_size % 4 == 0, got {ngroups}"
        )
    ug = u.reshape(ngroups // 4, 4, g // 2, 2, n).astype(jnp.int32)
    word = jnp.zeros((ngroups // 4, g // 2, n), jnp.int32)
    for j in range(4):
        for h in range(2):
            word = word | (ug[:, j, :, h] << (4 * j + 16 * h))
    return word.reshape(k // 8, n)


def unpack_int4_magic(word: jax.Array, group_size: int) -> jax.Array:
    """Inverse of :func:`pack_int4_magic`; returns uint8 values 0..15 (K, N)."""
    if word.ndim > 2:
        lead = word.shape[:-2]
        kw, n = word.shape[-2:]
        u2 = unpack_int4_magic(word.reshape(-1, n), group_size)
        return u2.reshape(*lead, 8 * kw, n)
    kw, n = word.shape
    g = group_size
    nt = 8 * kw // (4 * g)
    wb = word.reshape(nt, g // 2, n)
    planes = []
    for j in range(4):
        nib = jnp.stack(
            [(wb >> (4 * j + 16 * h)) & 0xF for h in range(2)], axis=2
        )  # (nt, g/2, 2, n) [r', h]
        planes.append(nib.reshape(nt, g, n))
    u = jnp.stack(planes, axis=1)  # (nt, 4, g, n): group index 4t + j
    return u.reshape(8 * kw, n).astype(jnp.uint8)


def pack_int4_magic8(u: jax.Array, group_size: int) -> jax.Array:
    """Pack unsigned nibbles (K, N) into the 2-plane "magic8" int32 layout
    (K/8, N) for the int8-MXU W4A8 kernel.

    Plane A = even quantization groups concatenated (K/2 rows), plane B =
    odd groups. Word row r stores, in byte b, plane A row 4r+b in the LOW
    nibble and plane B row 4r+b in the HIGH nibble. The kernel exploits
    that ``bitcast(word & 0x0F0F0F0F, int8)`` yields plane A's rows in
    natural order as int8 values 0..15 with NO zero rows (and
    ``(word >> 4) & 0x0F0F0F0F`` plane B) — so true i8×i8→i32 MXU dots run
    at exact K MACs with one shift+mask per plane.
    Requires K % 8 == 0, (K/group_size) % 2 == 0, group_size % 8 == 0.

    Leading batch dims pack per-slice via the flattened reshape (exact —
    per-slice group counts are even, so word rows never straddle slices).
    """
    if u.ndim > 2:
        lead = u.shape[:-2]
        k, n = u.shape[-2:]
        w2 = pack_int4_magic8(u.reshape(-1, n), group_size)
        return w2.reshape(*lead, k // 8, n)
    k, n = u.shape
    g = group_size
    ngroups = k // g
    if ngroups % 2 != 0 or g % 8 != 0 or k % 8 != 0:
        raise ValueError(
            f"magic8 layout needs K/g even, g % 8 == 0 (K={k}, g={g})"
        )
    pair = u.reshape(ngroups // 2, 2, g, n)
    a = pair[:, 0].reshape(k // 8, 4, n).astype(jnp.int32)
    b = pair[:, 1].reshape(k // 8, 4, n).astype(jnp.int32)
    word = jnp.zeros((k // 8, n), jnp.int32)
    for byte in range(4):
        word = word | (a[:, byte] << (8 * byte)) | (b[:, byte] << (8 * byte + 4))
    return word


def unpack_int4_magic8(word: jax.Array, group_size: int) -> jax.Array:
    """Inverse of :func:`pack_int4_magic8`; returns uint8 values 0..15 (K, N)."""
    if word.ndim > 2:
        lead = word.shape[:-2]
        kw, n = word.shape[-2:]
        u2 = unpack_int4_magic8(word.reshape(-1, n), group_size)
        return u2.reshape(*lead, 8 * kw, n)
    kw, n = word.shape
    k = kw * 8
    g = group_size
    a = jnp.stack([(word >> (8 * b)) & 0xF for b in range(4)], axis=1)
    bb = jnp.stack([(word >> (8 * b + 4)) & 0xF for b in range(4)], axis=1)
    a = a.reshape(k // (2 * g), g, n)
    bb = bb.reshape(k // (2 * g), g, n)
    u = jnp.stack([a, bb], axis=1)  # (ng/2, 2, g, n): group 2t / 2t+1
    return u.reshape(k, n).astype(jnp.uint8)


@qarray_dataclass
class Int4Array(QuantizedArray):
    # uint8 (K/2, N) or (E, K/2, N) split-half layout, OR int32 (K/8, N)
    # "magic" layout (pack_int4_magic) / "magic8" layout (pack_int4_magic8,
    # distinguished by _layout) — layout is inferred from dtype + _layout
    qdata: jax.Array
    scale: jax.Array  # (K/g, N) — bf16 (tinygemm) or fp32
    zero_point: Optional[jax.Array]  # same shape as scale; int32 or bf16
    act_pre_scale: Optional[jax.Array]  # AWQ per-K-channel activation scale
    block_size: Tuple[int, ...] = meta(default=())
    zero_point_domain: P.ZeroPointDomain = meta(default=P.ZeroPointDomain.FLOAT)
    act_quant: Optional[ActQuantSpec] = meta(default=None)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")
    _layout: str = meta(default="")  # "" = infer from qdata dtype

    @property
    def group_size(self) -> int:
        return self.block_size[-2]

    @property
    def layout(self) -> str:
        if self._layout:
            return self._layout
        return "magic" if self.qdata.dtype == jnp.int32 else "halves"

    def to_layout(self, layout: str) -> "Int4Array":
        """Repack qdata between the split-half, magic, and magic8 layouts."""
        if layout == self.layout:
            return self
        u = self.unpack()
        if layout == "magic":
            return self.replace(qdata=pack_int4_magic(u, self.group_size),
                                _layout="magic")
        if layout == "magic8":
            return self.replace(qdata=pack_int4_magic8(u, self.group_size),
                                _layout="magic8")
        if layout == "halves":
            return self.replace(qdata=pack_int4(u, self.group_size, axis=-2),
                                _layout="halves")
        raise ValueError(layout)

    @classmethod
    def from_hp(
        cls,
        hp: jax.Array,
        group_size: int = 128,
        zero_point_domain: P.ZeroPointDomain = P.ZeroPointDomain.FLOAT,
        mapping_type: P.MappingType = P.MappingType.ASYMMETRIC,
        algorithm: str = "minmax",  # "minmax" | "hqq"
        act_pre_scale: Optional[jax.Array] = None,
        act_quant: Optional[ActQuantSpec] = None,
        dequant_dtype: str = "bfloat16",
        layout: str = "auto",
    ) -> "Int4Array":
        if hp.ndim < 2:
            raise ValueError("int4 weights must be at least 2-D (K, N)")
        k = hp.shape[-2]
        if group_size % 2 != 0 or k % group_size != 0:
            raise ValueError(
                f"K={k} must be a multiple of even group_size={group_size}"
            )
        block_size = (1,) * (hp.ndim - 2) + (group_size, 1)

        if algorithm == "hqq":
            from ao_tpu.algorithms.hqq import choose_qparams_hqq

            scale, zp, q = choose_qparams_hqq(
                hp, block_size, quant_min=0, quant_max=15,
                zero_point_domain=zero_point_domain,
            )
            u = q.astype(jnp.uint8)
        elif zero_point_domain is P.ZeroPointDomain.FLOAT:
            scale, zp = P.choose_qparams_affine_tinygemm(
                hp, block_size, target_dtype="int4"
            )
            q = P.quantize_affine_tinygemm(
                hp, block_size, scale, zp, quant_min=-8, quant_max=7
            )
            u = (q.astype(jnp.int32) + 8).astype(jnp.uint8)
        elif zero_point_domain is P.ZeroPointDomain.INT:
            scale, zp = P.choose_qparams_affine(
                hp, mapping_type, block_size, target_dtype="int4"
            )
            q = P.quantize_affine(
                hp, block_size, scale, zp, quant_min=-8, quant_max=7
            )
            u = (q.astype(jnp.int32) + 8).astype(jnp.uint8)
        else:
            raise ValueError(zero_point_domain)

        # "magic" (int32-word) layout feeds the fastest fused bf16 kernel
        # (K/g % 4 == 0; 3-D expert stacks feed the fused GROUPED kernel,
        # ops/pallas/grouped_matmul.py); int8-activation weights instead
        # take the 2-plane "magic8" layout whose bitcast feeds i8×i8→i32
        # MXU dots; otherwise fall back to split-halves
        if layout == "auto":
            if (act_quant is not None and act_quant.dtype == "int8"
                    and act_quant.symmetric and hp.ndim in (2, 3)
                    and k % 8 == 0 and (k // group_size) % 2 == 0
                    and group_size % 8 == 0):
                layout = "magic8"
            elif hp.ndim in (2, 3) and (k // group_size) % 4 == 0:
                layout = "magic"
            else:
                layout = "halves"
        if layout == "magic":
            qdata = pack_int4_magic(u, group_size)
        elif layout == "magic8":
            qdata = pack_int4_magic8(u, group_size)
        elif layout == "halves":
            qdata = pack_int4(u, group_size, axis=-2)
        else:
            raise ValueError(layout)
        return cls(
            qdata=qdata,
            _layout=layout,
            scale=scale,
            zero_point=zp,
            act_pre_scale=act_pre_scale,
            block_size=block_size,
            zero_point_domain=zero_point_domain,
            act_quant=act_quant,
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    def unpack(self) -> jax.Array:
        """uint8 nibble values 0..15, logical (.., K, N)."""
        if self.layout == "magic":
            return unpack_int4_magic(self.qdata, self.group_size)
        if self.layout == "magic8":
            return unpack_int4_magic8(self.qdata, self.group_size)
        return unpack_int4(self.qdata, self.group_size, axis=-2)

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        u = self.unpack().astype(jnp.int32) - 8  # back to [-8, 7]
        if self.zero_point_domain is P.ZeroPointDomain.FLOAT:
            return P.dequantize_affine_tinygemm(
                u, self.block_size, self.scale, self.zero_point,
                quant_min=-8, quant_max=7, output_dtype=out_dtype,
            )
        return P.dequantize_affine(
            u, self.block_size, self.scale, self.zero_point,
            output_dtype=out_dtype,
        )
