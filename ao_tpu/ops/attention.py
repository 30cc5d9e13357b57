"""Low-precision attention: int8/fp8 quantized SDPA with optional fused
Hadamard rotation.

(ref: torchao/prototype/attention/api.py:68 ``apply_low_precision_attention``
(FA3/FA4 fp8 attention + triton fused Hadamard+RoPE+QKV quant),
csrc/cpu/aten_kernels/quantized_sdpa.cpp (int8/fp8 Q,K,V,P with per-tensor
scales), prototype/fp8_sdpa_inference/. TPU re-design: the two dots run as
int8→int32 / fp8→fp32 `dot_general` on the MXU with per-head dynamic
scales applied in the epilogue; the Hadamard rotation uses the SpinQuant
Kronecker transform and cancels exactly inside q·kᵀ, so it costs two small
matmuls and buys outlier-free quantization of Q/K.)

Numerics contract (per head, per batch):
    s  = (q̂ · k̂ᵀ) · s_q s_k · sm_scale          (int32/fp32 accum)
    p  = softmax(s)                    (fp32)
    o  = (p̂ · v̂) · s_p s_v                      (p̂ int8 @ scale 1/127)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

FP8_MAX = 448.0


def _quant_per_head(x: jax.Array, dtype: str):
    """x (B, H, S, D) → (q, scale (B, H, 1, 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(-2, -1), keepdims=True)
    if dtype == "int8":
        scale = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(xf / scale), -128, 127).astype(jnp.int8)
    else:
        scale = jnp.maximum(amax, 1e-12) / FP8_MAX
        q = jnp.clip(xf / scale, -FP8_MAX, FP8_MAX).astype(jnp.float8_e4m3fn)
    return q, scale


def _dot(a, b_t, int_path: bool):
    """a (..., M, K) @ b_t (..., N, K)ᵀ with wide accumulation."""
    dn = (((a.ndim - 1,), (b_t.ndim - 1,)),
          (tuple(range(a.ndim - 2)), tuple(range(b_t.ndim - 2))))
    return jax.lax.dot_general(
        a, b_t,
        dimension_numbers=dn,
        preferred_element_type=jnp.int32 if int_path else jnp.float32,
    )


def quantized_sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    dtype: str = "int8",  # "int8" | "float8_e4m3fn"
    causal: bool = True,
    sm_scale: Optional[float] = None,
    mask: Optional[jax.Array] = None,
    rotate: bool = False,
) -> jax.Array:
    """Scaled-dot-product attention with quantized Q, K, V and P.

    q (B, H, Sq, D), k/v (B, H, Sk, D) — GQA repeat happens before the call.
    ``rotate=True`` applies a Hadamard rotation over D to Q and K before
    quantization (exactly cancels in q·kᵀ; spreads outlier channels).
    """
    b, h, sq, d = q.shape
    sk = k.shape[-2]
    sm_scale = sm_scale if sm_scale is not None else d ** -0.5
    int_path = dtype == "int8"

    if rotate:
        from ao_tpu.algorithms.spinquant import hadamard_transform

        q = hadamard_transform(q.astype(jnp.float32))
        k = hadamard_transform(k.astype(jnp.float32))

    qq, s_q = _quant_per_head(q, dtype)
    qk, s_k = _quant_per_head(k, dtype)
    qv, s_v = _quant_per_head(v, dtype)

    s = _dot(qq, qk, int_path).astype(jnp.float32)
    s = s * (s_q * s_k * sm_scale)
    if causal and mask is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        mask = (cols <= rows + (sk - sq))[None, None]
    if mask is not None:
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)

    # probs ∈ [0,1]: fixed scale, no reduction needed
    if int_path:
        qp = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
        s_p = 1.0 / 127.0
    else:
        qp = jnp.clip(p * FP8_MAX, 0, FP8_MAX).astype(jnp.float8_e4m3fn)
        s_p = 1.0 / FP8_MAX

    # (B,H,Sq,Sk) @ (B,H,Sk,D): transpose v into (…, D, Sk) for the shared dot
    o = _dot(qp, jnp.swapaxes(qv, -1, -2), int_path).astype(jnp.float32)
    o = o * (s_p * s_v)
    return o.astype(q.dtype if q.dtype != jnp.float32 else jnp.float32)


def sdpa_reference(q, k, v, *, causal=True, sm_scale=None, mask=None):
    """fp32 reference SDPA (for tests and the EMULATED preference)."""
    d = q.shape[-1]
    sm_scale = sm_scale if sm_scale is not None else d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    sq, sk = s.shape[-2], s.shape[-1]
    if causal and mask is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        mask = (cols <= rows + (sk - sq))[None, None]
    if mask is not None:
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
