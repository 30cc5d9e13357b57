"""GGUF Q4_K-style super-block double quantization.

(ref: torchao/prototype/quantization/gguf/gguf_quantized_tensor.py:27
``GGUFQuantizedTensor`` and quant_primitives.py:1596-1806
``choose_qparams_gguf`` — Q4_K super-block layout: 256-wide super-blocks of
8×32-wide sub-blocks; per-sub-block scale and min are themselves quantized
to 6 bits against per-super-block fp16 ``d``/``dmin``.)

Dequant: w[k] ≈ d·sc[j]·q[k] − dmin·m[j]   (q ∈ [0,15], sc/m ∈ [0,63])

TPU layout: weights (K, N), super-blocks along K; qdata packed 2 nibbles per
byte with the framework's group-local split-half layout so TP sharding at
super-block boundaries stays aligned.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import register_quantize_handler
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.qarrays.int4 import pack_int4, unpack_int4

SUB_BLOCK = 32
SUPER_BLOCK = 256
N_SUB = SUPER_BLOCK // SUB_BLOCK


def choose_qparams_gguf(w: jax.Array):
    """w (K, N) → (q uint8 [0,15] (K,N), sc/m uint8 [0,63] (K/32, N),
    d/dmin f32 (K/256, N))."""
    k_dim, n = w.shape
    if k_dim % SUPER_BLOCK:
        raise ValueError(f"K={k_dim} must be a multiple of {SUPER_BLOCK}")
    wf = w.astype(jnp.float32).reshape(k_dim // SUB_BLOCK, SUB_BLOCK, n)

    # per-sub-block asymmetric [0,15] qparams
    wmax = jnp.max(wf, axis=1)  # (K/32, N)
    wmin = jnp.minimum(jnp.min(wf, axis=1), 0.0)
    s = jnp.maximum((wmax - wmin) / 15.0, 1e-10)
    m = -wmin  # stored positive

    # double quant: 6-bit sub-block scales/mins per super-block
    s_sb = s.reshape(k_dim // SUPER_BLOCK, N_SUB, n)
    m_sb = m.reshape(k_dim // SUPER_BLOCK, N_SUB, n)
    d = jnp.maximum(jnp.max(s_sb, axis=1), 1e-10) / 63.0  # (K/256, N)
    dmin = jnp.maximum(jnp.max(m_sb, axis=1), 1e-10) / 63.0
    sc = jnp.clip(jnp.round(s_sb / d[:, None, :]), 0, 63)
    mc = jnp.clip(jnp.round(m_sb / dmin[:, None, :]), 0, 63)

    # re-derive effective qparams from the quantized scales (the numerics
    # the decoder will see), then quantize the values against those
    s_eff = (d[:, None, :] * sc).reshape(k_dim // SUB_BLOCK, 1, n)
    m_eff = (dmin[:, None, :] * mc).reshape(k_dim // SUB_BLOCK, 1, n)
    q = jnp.clip(jnp.round((wf + m_eff) / jnp.maximum(s_eff, 1e-10)), 0, 15)

    return (
        q.reshape(k_dim, n).astype(jnp.uint8),
        sc.reshape(k_dim // SUB_BLOCK, n).astype(jnp.uint8),
        mc.reshape(k_dim // SUB_BLOCK, n).astype(jnp.uint8),
        d,
        dmin,
    )


@qarray_dataclass
class GGUFQuantizedArray(QuantizedArray):
    qdata: jax.Array  # packed uint8 (K/2, N)
    sc: jax.Array  # uint8 6-bit sub-block scales (K/32, N)
    mc: jax.Array  # uint8 6-bit sub-block mins (K/32, N)
    d: jax.Array  # f32 super-block scale-of-scales (K/256, N)
    dmin: jax.Array  # f32 super-block scale-of-mins (K/256, N)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(cls, hp: jax.Array, dequant_dtype: str = "bfloat16"):
        if hp.ndim != 2:
            raise ValueError("gguf quantization supports 2-D weights")
        q, sc, mc, d, dmin = choose_qparams_gguf(hp)
        return cls(
            qdata=pack_int4(q, SUB_BLOCK, axis=-2),
            sc=sc,
            mc=mc,
            d=d,
            dmin=dmin,
            _shape=tuple(hp.shape),
            _dequant_dtype=dequant_dtype,
        )

    def dequantize(self, output_dtype=None) -> jax.Array:
        out_dtype = output_dtype or self.dtype
        k_dim, n = self.shape
        q = unpack_int4(self.qdata, SUB_BLOCK, axis=-2).astype(jnp.float32)
        qb = q.reshape(k_dim // SUB_BLOCK, SUB_BLOCK, n)
        nsb = k_dim // SUPER_BLOCK
        s_eff = self.d.repeat(N_SUB, axis=0) * self.sc.astype(jnp.float32)
        m_eff = self.dmin.repeat(N_SUB, axis=0) * self.mc.astype(jnp.float32)
        v = qb * s_eff[:, None, :] - m_eff[:, None, :]
        return v.reshape(k_dim, n).astype(out_dtype)

    def to_int4(self, act_quant=None, scale_dtype=jnp.bfloat16):
        """Collapse the double quantization into a flat per-32-group affine
        ``Int4Array`` (FLOAT zero-point domain): the effective qparams
        ``scale = d·sc[j]``, ``zp = −dmin·m[j]`` are representable exactly,
        so with ``scale_dtype=float32`` the conversion is bit-exact. The
        result lands in the magic/magic8 layouts and hits the fused decode
        kernels that the GGUF container's dequant-linear cannot.

        (ref analog: the reference converts GGUF tensors back through
        Int4 tile layouts for its fast paths; on TPU this is the magic-
        layout repack.)
        """
        from ao_tpu.quantization import primitives as P
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        k_dim, n = self.shape
        s_eff = self.d.repeat(N_SUB, axis=0) * self.sc.astype(jnp.float32)
        zp = -(self.dmin.repeat(N_SUB, axis=0) * self.mc.astype(jnp.float32))
        arr = Int4Array(
            qdata=self.qdata,
            scale=s_eff.astype(scale_dtype),
            zero_point=zp.astype(scale_dtype),
            act_pre_scale=None,
            block_size=(SUB_BLOCK, 1),
            zero_point_domain=P.ZeroPointDomain.FLOAT,
            act_quant=act_quant,
            _shape=(k_dim, n),
            _dequant_dtype=self._dequant_dtype,
            _layout="halves",
        )
        if (act_quant is not None and act_quant.dtype == "int8"
                and act_quant.symmetric):
            return arr.to_layout("magic8")
        return arr.to_layout("magic")


def fuse_gguf_int4(params, act_quant=None, scale_dtype=jnp.bfloat16):
    """Tree-walk converting every ``GGUFQuantizedArray`` leaf to the fused
    ``Int4Array`` form (see :meth:`GGUFQuantizedArray.to_int4`); other
    leaves pass through untouched."""
    def fuse(leaf):
        if isinstance(leaf, GGUFQuantizedArray):
            return leaf.to_int4(act_quant=act_quant, scale_dtype=scale_dtype)
        return leaf

    return jax.tree_util.tree_map(
        fuse, params, is_leaf=lambda x: isinstance(x, GGUFQuantizedArray)
    )


@dataclasses.dataclass(frozen=True)
class GGUFWeightOnlyConfig(AOBaseConfig):
    """Q4_K-style 4-bit super-block double quantization.
    (ref: prototype/quantization/gguf/api.py:22)"""

    version: int = 1


@register_quantize_handler(GGUFWeightOnlyConfig)
def _gguf_transform(weight: jax.Array, config: GGUFWeightOnlyConfig):
    if weight.ndim != 2 or weight.shape[-2] % SUPER_BLOCK:
        return weight
    return GGUFQuantizedArray.from_hp(weight)


from ao_tpu.ops.dispatch import implements  # noqa: E402
from ao_tpu.ops.linear import frozen_weight_ste  # noqa: E402


@implements("linear", GGUFQuantizedArray)
@frozen_weight_ste
def _gguf_linear(x: jax.Array, w: GGUFQuantizedArray, b: Optional[jax.Array]):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = jnp.matmul(x2, w.dequantize(x2.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.reshape(*lead, y.shape[-1])
