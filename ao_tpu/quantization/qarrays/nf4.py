"""NF4Array — 4-bit NormalFloat (QLoRA) with double-quantized scalers.

(ref: torchao/prototype/dtypes/nf4/nf4_tensor.py:590 ``NF4Tensor``; the
16-value normal-float codebook and double quantization of per-block
scalers follow the QLoRA paper. Forward = dequantize + hp matmul, matching
the reference's ``LinearNF4`` :1063.)

Layout: (K, N) weights, blocks along K (block_size | K). Codes are packed
two-per-byte with the group-local split-half layout (g = block_size).
Scalers are double-quantized: per-block absmax → int8 against a
per-scaler-block absmax factor, plus a global mean offset.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.qarrays.int4 import (
    pack_int4,
    pack_int4_magic,
    unpack_int4,
    unpack_int4_magic,
)

# QLoRA NF4 codebook (public constants; ref nf4_tensor.py nf4 table)
NF4_CODEBOOK = jnp.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=jnp.float32,
)
_MIDPOINTS = (NF4_CODEBOOK[1:] + NF4_CODEBOOK[:-1]) / 2.0  # (15,)


def _nearest_code(xn: jax.Array) -> jax.Array:
    """Index of the nearest codebook entry: count midpoints below x.

    Binary search (searchsorted) rather than a broadcast against the 15
    midpoints: the broadcast materializes a (…, 15) intermediate — a 15x
    memory blowup that OOMs when quantizing full-model weights on-chip.
    """
    return jnp.searchsorted(_MIDPOINTS, xn, side="left").astype(jnp.uint8)


@qarray_dataclass
class NF4Array(QuantizedArray):
    # packed codes: uint8 (K/2, N) split-half, OR int32 (K/8, N) "magic"
    # layout (pack_int4_magic over the code nibbles) feeding the fused
    # 16-entry-LUT kernel (ops/pallas/lut4_matmul.py)
    qdata: jax.Array
    quantized_scalers: jax.Array  # int8 (K/bs, N)
    quantization_factor: jax.Array  # f32 (K/(bs*sbs_rows)...) per scaler block
    scaler_mean: jax.Array  # f32 scalar ()
    block_size: Tuple[int, ...] = meta(default=())
    scaler_block_size: int = meta(default=256)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @property
    def layout(self) -> str:
        return "magic" if self.qdata.dtype == jnp.int32 else "halves"

    def to_layout(self, layout: str) -> "NF4Array":
        """Repack codes between the split-half and magic layouts (the
        sharding layer repacks to "halves" when a K-shard would split a
        magic word block)."""
        if layout == self.layout:
            return self
        codes = self.unpack()
        if layout == "halves":
            return self.replace(
                qdata=pack_int4(codes, self.block_size[0], axis=-2))
        if layout == "magic":
            return self.replace(
                qdata=pack_int4_magic(codes, self.block_size[0]))
        raise ValueError(layout)

    @classmethod
    def from_hp(
        cls,
        hp: jax.Array,
        block_size: int = 64,
        scaler_block_size: int = 256,
        dequant_dtype: str = "bfloat16",
    ) -> "NF4Array":
        if hp.ndim != 2:
            raise ValueError("NF4 weights must be 2-D (K, N)")
        k, n = hp.shape
        if k % block_size != 0:
            raise ValueError(f"K={k} not divisible by block_size={block_size}")
        nblocks = k // block_size
        w = hp.astype(jnp.float32)

        bs_tuple = (block_size, 1)
        scaler = P.block_reduce(w, bs_tuple, "absmax")  # (K/bs, N)
        scaler = jnp.maximum(scaler, 1e-12)

        # double quantization of scalers (ref nf4_tensor.py double_quantize)
        mean = jnp.mean(scaler)
        centered = scaler - mean
        flat = centered.reshape(-1)
        total = flat.shape[0]
        sbs = scaler_block_size
        pad = (-total) % sbs
        if pad:
            flat = jnp.pad(flat, (0, pad))
        blocks = flat.reshape(-1, sbs)
        qfac = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1, keepdims=True), 1e-12) / 127.0
        qs = jnp.clip(jnp.round(blocks / qfac), -127, 127).astype(jnp.int8)

        # quantize values against the (dequantized) scalers for exactness
        dq_scaler = (qs.astype(jnp.float32) * qfac).reshape(-1)[:total].reshape(
            nblocks, n
        ) + mean
        dq_scaler = jnp.maximum(dq_scaler, 1e-12)

        def _norm(wb, s):
            return wb / s

        xn = P.apply_blockwise(w, bs_tuple, _norm, dq_scaler)
        codes = _nearest_code(jnp.clip(xn, -1.0, 1.0))

        # the magic layout feeds the fused LUT kernel; fall back to
        # split-half when the group count is incompatible
        if nblocks % 4 == 0 and k % 128 == 0:
            qdata = pack_int4_magic(codes, block_size)
        else:
            qdata = pack_int4(codes, block_size, axis=-2)
        return cls(
            qdata=qdata,
            quantized_scalers=qs,
            quantization_factor=qfac,
            scaler_mean=mean,
            block_size=bs_tuple,
            scaler_block_size=sbs,
            _shape=(k, n),
            _dequant_dtype=dequant_dtype,
        )

    def _scalers(self) -> jax.Array:
        k, n = self.shape
        nblocks = k // self.block_size[0]
        dq = self.quantized_scalers.astype(jnp.float32) * self.quantization_factor
        return dq.reshape(-1)[: nblocks * n].reshape(nblocks, n) + self.scaler_mean

    def unpack(self) -> jax.Array:
        """uint8 code values 0..15, logical (K, N)."""
        if self.layout == "magic":
            return unpack_int4_magic(self.qdata, self.block_size[0])
        return unpack_int4(self.qdata, self.block_size[0], axis=-2)

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        codes = self.unpack()
        vals = jnp.take(NF4_CODEBOOK, codes.astype(jnp.int32), axis=0)
        out = P.apply_blockwise(
            vals, self.block_size, lambda v, s: v * s, self._scalers()
        )
        return out.astype(out_dtype)
