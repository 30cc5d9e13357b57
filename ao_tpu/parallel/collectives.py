"""Quantized-payload collectives and tensor-parallel linear styles.

(ref: §2.7 of the reference's architecture —
float8_tensor_parallel.py:42,107,170 ``Float8ColwiseParallel``/
``Float8RowwiseParallel``/``PrepareFloat8ModuleInput`` (cast to fp8 BEFORE
redistribution so comms ride in 8 bits), fsdp_utils.py:139
``WeightWithDynamicFloat8CastTensor`` (fp8-bits all-gather) and
fsdp_utils.py:28 ``precompute_float8_dynamic_scale_for_fsdp``;
mx_tensor.py:1004 all_gather on (qdata, scale) pairs. TPU re-design: these
are shard_map-level functions — a QuantizedArray is a pytree, so
`jax.lax.all_gather` moves qdata and scales as one schedule; the ring
collective-matmul uses `lax.ppermute` chunks that XLA's latency-hiding
scheduler overlaps with the partial dots.)

All functions below run INSIDE ``shard_map`` over a mesh axis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

FP8_MAX = 448.0


# ---------------------------------------------------------------------------
# fp8-on-the-wire activation redistribution (sequence/tensor parallel input)
# ---------------------------------------------------------------------------


def _fp8_cast_rowwise(x: jax.Array):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / FP8_MAX
    q = jnp.clip(xf / scale, -FP8_MAX, FP8_MAX).astype(jnp.float8_e4m3fn)
    return q, scale


def all_gather_fp8(x: jax.Array, axis_name: str, *, axis: int = 0,
                   tiled: bool = True) -> jax.Array:
    """All-gather ``x`` with the payload cast to fp8 per-token first —
    halves ICI bytes vs bf16 (ref: PrepareFloat8ModuleInput — cast BEFORE
    redistribution). Returns the gathered, dequantized hp array."""
    q, s = _fp8_cast_rowwise(x)
    qg = jax.lax.all_gather(q, axis_name, axis=axis, tiled=tiled)
    sg = jax.lax.all_gather(s, axis_name, axis=axis, tiled=tiled)
    return (qg.astype(jnp.float32) * sg).astype(x.dtype)


def all_gather_quantized(tree, axis_name: str, *, axis: int = 0,
                         tiled: bool = True):
    """All-gather every leaf of a (possibly QuantizedArray) pytree along
    ``axis`` — qdata and scales travel as separate 8-bit/f32 messages on one
    schedule (ref: mx_tensor.py:1004 e8m0-as-uint8 collectives)."""
    gathered = jax.tree_util.tree_map(
        lambda leaf: jax.lax.all_gather(leaf, axis_name, axis=axis, tiled=tiled),
        tree,
    )
    from ao_tpu.quantization.qarrays.base import QuantizedArray

    def fix_shape(leaf, orig):
        if isinstance(orig, QuantizedArray):
            n = jax.lax.axis_size(axis_name)
            shape = list(orig.shape)
            shape[axis] = shape[axis] * n
            return leaf.replace(_shape=tuple(shape))
        return leaf

    if isinstance(tree, QuantizedArray):
        return fix_shape(gathered, tree)
    return gathered


# ---------------------------------------------------------------------------
# FSDP-style fp8 weight sharding
# ---------------------------------------------------------------------------


def precompute_fp8_weight_scales(params):
    """Per-out-channel fp8 scales for every ≥2-D float leaf, computed once
    per step for all params (ref: precompute_float8_dynamic_scale_for_fsdp
    fsdp_utils.py:28 — one fused pass instead of per-layer casts)."""

    def one(leaf):
        if not (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            return None
        amax = jnp.max(jnp.abs(leaf.astype(jnp.float32)), axis=0, keepdims=True)
        return jnp.maximum(amax, 1e-12) / FP8_MAX

    return jax.tree_util.tree_map(one, params)


def fsdp_all_gather_fp8(
    w_shard: jax.Array, scale: jax.Array, axis_name: str
) -> jax.Array:
    """Gather a dim-0-sharded weight as fp8 bits + broadcast scale; returns
    the full hp weight for this step's matmuls (ref:
    WeightWithDynamicFloat8CastTensor.fsdp_pre_all_gather)."""
    q = jnp.clip(
        w_shard.astype(jnp.float32) / scale, -FP8_MAX, FP8_MAX
    ).astype(jnp.float8_e4m3fn)
    qg = jax.lax.all_gather(q, axis_name, axis=0, tiled=True)
    return (qg.astype(jnp.float32) * scale).astype(w_shard.dtype)


# ---------------------------------------------------------------------------
# Wire-format-controlled reductions (the scaling-efficiency path)
# ---------------------------------------------------------------------------


def all_to_all_reduce(partial: jax.Array, axis_name: str, *,
                      wire_dtype=jnp.bfloat16) -> jax.Array:
    """Reduce-scatter ``partial`` (T, d) over the axis with a GUARANTEED
    wire dtype: the payload travels as an all-to-all (pure data movement —
    no backend can promote it the way XLA promotes bf16 all-REDUCE
    computations to f32) and the sum happens locally in f32, which is also
    numerically stronger than an in-ring bf16 accumulate. Returns this
    device's (T/n, d) chunk of the sum, f32.

    (ref: the reference's whole fp8-TP design is cast-before-comm so the
    wire never carries widened payloads — float8_tensor_parallel.py:42,107;
    this is the reduction-side analog.)
    """
    n = jax.lax.axis_size(axis_name)
    t, d = partial.shape
    assert t % n == 0, f"tokens {t} not divisible by axis size {n}"
    chunks = partial.reshape(n, t // n, d).astype(wire_dtype)
    recv = jax.lax.all_to_all(chunks, axis_name, split_axis=0, concat_axis=0)
    return jnp.sum(recv.astype(jnp.float32), axis=0)


def reduce_gather_wire(partial: jax.Array, axis_name: str, *,
                       wire: str = "fp8", out_dtype=jnp.bfloat16) -> jax.Array:
    """Replicated sum of per-device partials (T, d) with explicit wire
    formats: bf16 all-to-all reduce-scatter + quantized (fp8) all-gather of
    the summed chunks — 3 bytes/elem on the wire vs 8 for the f32
    all-reduce XLA's promotion pass emits from the auto-sharded forward
    (2 + 1 vs 2 x 4). ``wire``: "fp8" (default) or "bf16" for the gather
    payload. (ref: PrepareFloat8ModuleInput float8_tensor_parallel.py:170.)
    """
    n = jax.lax.axis_size(axis_name)
    t, d = partial.shape
    pad = (-t) % n
    if pad:
        partial = jnp.pad(partial, ((0, pad), (0, 0)))
    chunk = all_to_all_reduce(partial, axis_name)  # (T'/n, d) f32
    if wire == "fp8":
        q, s = _fp8_cast_rowwise(chunk)
        qg = jax.lax.all_gather(q, axis_name, axis=0, tiled=True)
        sg = jax.lax.all_gather(s, axis_name, axis=0, tiled=True)
        full = (qg.astype(jnp.float32) * sg).astype(out_dtype)
    else:
        full = jax.lax.all_gather(chunk.astype(jnp.bfloat16), axis_name,
                                  axis=0, tiled=True).astype(out_dtype)
    return full[:t] if pad else full


# ---------------------------------------------------------------------------
# Tensor-parallel linear styles
# ---------------------------------------------------------------------------


def tp_colwise_linear(x: jax.Array, w_shard, axis_name: str,
                      gather_output: bool = False) -> jax.Array:
    """Column-parallel linear: W (K, N/P) shard per device, x replicated.
    Output stays sharded on N unless ``gather_output``.
    (ref: Float8ColwiseParallel — w_shard may be a QuantizedArray, in which
    case the quantized kernel path runs per-shard.)"""
    from ao_tpu.ops.linear import linear

    y = linear(x, w_shard)
    if gather_output:
        y = jax.lax.all_gather(y, axis_name, axis=y.ndim - 1, tiled=True)
    return y


def tp_rowwise_linear(x_shard: jax.Array, w_shard, axis_name: str,
                      reduce_scatter: bool = False) -> jax.Array:
    """Row-parallel linear: W (K/P, N) shard, x sharded on K. Partial
    products psum over the axis (or reduce-scatter along the token dim).
    (ref: Float8RowwiseParallel.)"""
    from ao_tpu.ops.linear import linear

    partial = linear(x_shard, w_shard)
    if reduce_scatter:
        return jax.lax.psum_scatter(partial, axis_name, scatter_dimension=0,
                                    tiled=True)
    return jax.lax.psum(partial, axis_name)


# ---------------------------------------------------------------------------
# Ring collective-matmul: all-gather overlapped with partial dots
# ---------------------------------------------------------------------------


def ring_allgather_matmul(x_local: jax.Array, w_local, axis_name: str):
    """y_full = concat_p(x_p) @ W_local with the gather hidden behind the
    matmuls: each of P steps multiplies the chunk on hand while `ppermute`
    ships it to the neighbor (XLA's latency-hiding scheduler overlaps the
    ICI transfer with the MXU work — the TPU analog of the reference's
    fused comm/gemm CUDA streams).

    x_local (m, K) — this device's row chunk; w_local (K, n_local) possibly
    a QuantizedArray. Returns (m*P, n_local) rows ordered by source device.
    """
    from ao_tpu.ops.linear import linear

    p = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    m = x_local.shape[0]
    perm = [(i, (i + 1) % p) for i in range(p)]

    y0 = linear(x_local, w_local)
    out = jnp.zeros((m * p, y0.shape[-1]), y0.dtype)
    out = jax.lax.dynamic_update_slice(out, y0, (idx * m, 0))

    def body(step, carry):
        out, chunk = carry
        chunk = jax.lax.ppermute(chunk, axis_name, perm)
        src = (idx - step - 1) % p
        y = linear(chunk, w_local)
        out = jax.lax.dynamic_update_slice(out, y, (src * m, 0))
        return out, chunk

    out, _ = jax.lax.fori_loop(0, p - 1, body, (out, x_local))
    return out
