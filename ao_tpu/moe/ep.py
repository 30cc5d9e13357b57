"""Expert-parallel quantized all-to-all dispatch/combine.

(ref: torchao/prototype/moe_training/ep/a2a_dispatch.py:18
``_A2ADispatchMXFP8FwdHPBwd`` — quantize tokens, all_to_all qdata and scales
as separate payloads, high-precision backward; a2a_combine.py:18 — hp
forward, quantized backward. TPU re-design: `jax.lax.all_to_all` over an ICI
mesh axis inside shard_map, with the (qdata, scale) pair as a pytree so both
payloads ride the same collective schedule; e8m0/f32 scales are tiny next to
the token payload, halving (fp8) a2a bytes vs bf16.)

Use inside ``shard_map`` over the expert-parallel axis::

    y = a2a_dispatch_quantized(tokens, "ep")          # fwd fp8, bwd hp
    ...expert compute...
    out = a2a_combine_quantized(y, "ep")              # fwd hp, bwd fp8
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

FP8_MAX = 448.0  # float8_e4m3fn


def _fp8_quant_rowwise(x: jax.Array):
    """Per-token (last-axis) fp8 e4m3 quantization. Returns (q, scale_f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / FP8_MAX
    q = jnp.clip(xf / scale, -FP8_MAX, FP8_MAX).astype(jnp.float8_e4m3fn)
    return q, scale


def _mx_quant(x: jax.Array):
    """MXFP8 (block-32 e8m0 scales, rceil) quantization of the token payload.
    Scales are already the uint8 e8m0 byte — exactly what the collective
    wants on the wire (ref: mx_tensor.py:1004 views e8m0 as uint8 for
    comms)."""
    from ao_tpu.quantization.qarrays.mx import to_mx

    bs = (1,) * (x.ndim - 1) + (32,)
    return to_mx(x, bs, "float8_e4m3fn", "rceil")


def _mx_dequant(q: jax.Array, scale_u8: jax.Array, out_dtype):
    from ao_tpu.quantization import primitives as P
    from ao_tpu.quantization.qarrays.mx import e8m0_decode

    scale = e8m0_decode(scale_u8)
    bs = tuple(q.shape[i] // scale.shape[i] for i in range(q.ndim))
    v = P.apply_blockwise(
        q.astype(jnp.float32), bs, lambda v, s: v * s, scale
    )
    return v.astype(out_dtype)


def _a2a(x: jax.Array, axis_name: str) -> jax.Array:
    return jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0, tiled=True)


def _a2a_quantized(x: jax.Array, axis_name: str, fmt: str) -> jax.Array:
    """Quantize → all_to_all(qdata), all_to_all(scale) → dequantize."""
    if fmt == "float8":
        q, s = _fp8_quant_rowwise(x)
        q, s = _a2a(q, axis_name), _a2a(s, axis_name)
        return (q.astype(jnp.float32) * s).astype(x.dtype)
    if fmt == "mxfp8":
        q, s = _mx_quant(x)
        q, s = _a2a(q, axis_name), _a2a(s, axis_name)
        return _mx_dequant(q, s, x.dtype)
    if fmt == "none":
        return _a2a(x, axis_name)
    raise ValueError(f"unknown a2a payload format {fmt!r}")


# ---------------------------------------------------------------------------
# dispatch: quantized forward, high-precision backward
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def a2a_dispatch_quantized(x: jax.Array, axis_name: str, fmt: str = "float8"):
    """Token dispatch a2a: payload quantized on the wire, hp gradient back.

    x local shape (n_ep * C, ...) with destination-contiguous chunks; the
    tiled all_to_all swaps chunk d with device d along axis 0.
    """
    return _a2a_quantized(x, axis_name, fmt)


def _dispatch_fwd(x, axis_name, fmt):
    return _a2a_quantized(x, axis_name, fmt), None


def _dispatch_bwd(axis_name, fmt, _res, g):
    # hp backward (ref: a2a_dispatch "FwdHPBwd" — quantizing grads here hurts)
    return (_a2a(g, axis_name),)


a2a_dispatch_quantized.defvjp(_dispatch_fwd, _dispatch_bwd)


# ---------------------------------------------------------------------------
# combine: high-precision forward, quantized backward
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def a2a_combine_quantized(x: jax.Array, axis_name: str, fmt: str = "float8"):
    """Output combine a2a: hp on the wire forward, quantized gradient back.
    (ref: a2a_combine.py:18 — fwd outputs feed the residual stream, so they
    stay hp; grads tolerate fp8.)"""
    return _a2a(x, axis_name)


def _combine_fwd(x, axis_name, fmt):
    return _a2a(x, axis_name), None


def _combine_bwd(axis_name, fmt, _res, g):
    return (_a2a_quantized(g, axis_name, fmt),)


a2a_combine_quantized.defvjp(_combine_fwd, _combine_bwd)
