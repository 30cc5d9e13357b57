"""Codebook (k-means LUT) weight-only quantization.

(ref: torchao/prototype/quantization/codebook/codebook_ops.py:16,98,225
``quantize_codebook``/``dequantize_codebook``/``fit_kmeans`` with greedy
init, and codebook_quantized_tensor.py:26 ``CodebookQuantizedTensor`` +
``CodebookWeightOnlyConfig``. TPU re-design: the k-means fit is a jitted
`lax.fori_loop` of assign/update steps (segment sums on the VPU); lookup
at inference is a gather feeding the MXU matmul.)

Scheme: values are grouped into scale blocks along K (like int4 groupwise),
normalized by an absmax scale, then vector-quantized against a
2^bits-entry scalar codebook fit with k-means — either one SHARED codebook
over the whole tensor, or PER-GROUP LUTs (``lut_block`` rows per LUT,
vmapped k-means; ref: the groupwise-LUT variants
prototype/quantization/codebook_groupwise/ and codebook_coreml/).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import register_quantize_handler
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass


def fit_kmeans(
    values: jax.Array, k: int, iters: int = 30, key: Optional[jax.Array] = None
) -> jax.Array:
    """1-D k-means over ``values`` (flattened). Returns sorted (k,) centers.

    Init is quantile-spread (the greedy-init spirit of ref
    codebook_ops.py:247 without the data-dependent loop: quantiles cover the
    mass exactly where codes are needed).
    """
    v = values.reshape(-1).astype(jnp.float32)
    qs = jnp.linspace(0.0, 1.0, k)
    centers = jnp.quantile(v, qs)

    def step(_, c):
        # assign
        idx = jnp.argmin(jnp.abs(v[:, None] - c[None, :]), axis=1)
        # update (empty clusters keep their center)
        sums = jax.ops.segment_sum(v, idx, num_segments=k)
        cnts = jax.ops.segment_sum(jnp.ones_like(v), idx, num_segments=k)
        return jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1), c)

    centers = jax.lax.fori_loop(0, iters, step, centers)
    return jnp.sort(centers)


def quantize_codebook(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest-code assignment. codebook sorted (k,) → codes uint8/uint16."""
    k = codebook.shape[0]
    # sorted codebook → searchsorted + boundary compare beats a (N, k) argmin
    hi = jnp.searchsorted(codebook, x.reshape(-1), side="left")
    hi = jnp.clip(hi, 1, k - 1)
    lo = hi - 1
    pick_hi = (codebook[hi] - x.reshape(-1)) < (x.reshape(-1) - codebook[lo])
    codes = jnp.where(pick_hi, hi, lo)
    dt = jnp.uint8 if k <= 256 else jnp.uint16
    return codes.reshape(x.shape).astype(dt)


def dequantize_codebook(codes: jax.Array, codebook: jax.Array, output_dtype):
    return codebook[codes].astype(output_dtype)


@qarray_dataclass
class CodebookArray(QuantizedArray):
    codes: jax.Array  # uint8/uint16 (K, N)
    codebook: jax.Array  # (2^bits,) shared, or (K/lut_block, 2^bits) LUTs
    scale: jax.Array  # (K/g, N) absmax block scales
    block_size: Tuple[int, ...] = meta(default=())
    bits: int = meta(default=4)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(
        cls,
        hp: jax.Array,
        bits: int = 4,
        scale_block: int = 64,
        kmeans_iters: int = 30,
        lut_block: Optional[int] = None,
        dequant_dtype: str = "bfloat16",
    ) -> "CodebookArray":
        if hp.ndim != 2:
            raise ValueError("codebook quantization supports 2-D weights")
        k_dim, n = hp.shape
        if k_dim % scale_block:
            raise ValueError(f"K={k_dim} not a multiple of scale_block={scale_block}")
        w = hp.astype(jnp.float32)
        g = scale_block
        wg = w.reshape(k_dim // g, g, n)
        scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1), 1e-12)  # (K/g, N)
        normed = (wg / scale[:, None, :]).reshape(k_dim, n)
        if lut_block is None:
            codebook = fit_kmeans(normed, 2 ** bits, iters=kmeans_iters)
            codes = quantize_codebook(normed, codebook)
            # ≤4-bit shared-LUT codes pack into the int4 magic layout: half
            # the bytes (or better vs unpacked uint8) AND the fused LUT
            # kernel (ops/pallas/lut4_matmul; 2/3-bit LUTs pad to 16)
            if (bits <= 4 and g % 2 == 0 and (k_dim // g) % 4 == 0
                    and k_dim % 128 == 0):
                from ao_tpu.quantization.qarrays.int4 import pack_int4_magic

                codes = pack_int4_magic(codes.astype(jnp.uint8), g)
        else:
            if k_dim % lut_block:
                raise ValueError(
                    f"K={k_dim} not a multiple of lut_block={lut_block}")
            groups = normed.reshape(k_dim // lut_block, lut_block * n)
            codebook = jax.vmap(
                lambda v: fit_kmeans(v, 2 ** bits, iters=kmeans_iters)
            )(groups)  # (L, 2^bits)
            codes = jax.vmap(quantize_codebook)(groups, codebook)
            codes = codes.reshape(k_dim, n)
            if (bits <= 4 and g % 2 == 0 and (k_dim // g) % 4 == 0
                    and k_dim % 128 == 0 and lut_block % g == 0):
                from ao_tpu.quantization.qarrays.int4 import pack_int4_magic

                codes = pack_int4_magic(codes.astype(jnp.uint8), g)
        return cls(
            codes=codes,
            codebook=codebook,
            scale=scale,
            block_size=(g, 1),
            bits=bits,
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    @property
    def layout(self) -> str:
        return "magic" if self.codes.dtype == jnp.int32 else "flat"

    def to_layout(self, layout: str) -> "CodebookArray":
        """Repack between flat uint8 codes and the magic layout ("halves"
        is accepted as an alias for flat — the sharding layer's repack
        target name)."""
        if layout in ("flat", "halves"):
            if self.layout == "flat":
                return self
            return self.replace(codes=self.unpacked_codes())
        if layout == "magic":
            if self.layout == "magic":
                return self
            from ao_tpu.quantization.qarrays.int4 import pack_int4_magic

            return self.replace(codes=pack_int4_magic(
                self.codes.astype(jnp.uint8), self.block_size[0]))
        raise ValueError(layout)

    def unpacked_codes(self) -> jax.Array:
        if self.layout == "magic":
            from ao_tpu.quantization.qarrays.int4 import unpack_int4_magic

            return unpack_int4_magic(self.codes, self.block_size[0])
        return self.codes

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        k_dim, n = self.shape
        g = self.block_size[0]
        if self.codebook.ndim == 2:  # per-group LUTs
            lb = k_dim // self.codebook.shape[0]
            cg = self.unpacked_codes().reshape(k_dim // lb, lb * n)
            v = jnp.take_along_axis(
                self.codebook, cg.astype(jnp.int32), axis=1
            ).astype(jnp.float32).reshape(k_dim, n)
        else:
            v = dequantize_codebook(self.unpacked_codes(), self.codebook,
                                    jnp.float32)
        v = v.reshape(k_dim // g, g, n) * self.scale[:, None, :]
        return v.reshape(k_dim, n).astype(out_dtype)


@dataclasses.dataclass(frozen=True)
class CodebookWeightOnlyConfig(AOBaseConfig):
    """(ref: CodebookWeightOnlyConfig, prototype/quantization/codebook/;
    lut_block != None gives per-row-group LUTs like
    prototype/quantization/codebook_groupwise/ GroupwiseLutWeightConfig)"""

    bits: int = 4
    scale_block: int = 64
    kmeans_iters: int = 30
    lut_block: Optional[int] = None  # rows per LUT; None = one shared LUT
    version: int = 1


@register_quantize_handler(CodebookWeightOnlyConfig)
def _codebook_transform(weight: jax.Array, config: CodebookWeightOnlyConfig):
    if weight.ndim != 2 or weight.shape[-2] % config.scale_block:
        return weight
    if config.lut_block and weight.shape[-2] % config.lut_block:
        return weight
    return CodebookArray.from_hp(
        weight, bits=config.bits, scale_block=config.scale_block,
        kmeans_iters=config.kmeans_iters, lut_block=config.lut_block,
    )


from ao_tpu.ops.dispatch import implements  # noqa: E402
from ao_tpu.ops.linear import frozen_weight_ste  # noqa: E402


@implements("linear", CodebookArray)
@frozen_weight_ste
def _codebook_linear(x: jax.Array, w: CodebookArray, b: Optional[jax.Array]):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if w.layout == "magic":
        from ao_tpu.ops.linear import try_lut4_linear

        y = try_lut4_linear(x2, w.codes, w.scale, w.codebook,
                            w.block_size[0])
        if y is not None:
            if b is not None:
                y = y + b.astype(y.dtype)
            return y.astype(x.dtype).reshape(*lead, y.shape[-1])
    y = jnp.matmul(x2, w.dequantize(x2.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.reshape(*lead, y.shape[-1])
