"""`ao_tpu.ops.embedding` — quantized embedding lookup.

(ref analog: the embedding op overrides on Int8Tensor (dequant path,
int8_tensor.py embedding impl) and the prototype embedding quantizers,
prototype/quantization/embedding/api.py:38. For embeddings the quantized
table is stored row-major (V, D) with per-row scales so a gather pulls the
row's qdata and scale together, then dequantizes only the gathered rows.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ao_tpu.ops.dispatch import implements, lookup
from ao_tpu.quantization.qarrays.base import QuantizedArray
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.quantization.qarrays.intx import IntxArray


def embedding(table, ids: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
    """table (V, D) or QuantizedArray; ids int array → (..., D)."""
    if isinstance(table, QuantizedArray):
        return lookup("embedding", type(table))(table, ids, out_dtype)
    return jnp.take(table, ids, axis=0).astype(out_dtype)


@implements("embedding", Int8Array)
def _int8_embedding(t: Int8Array, ids, out_dtype):
    # per-row scales required: block_size (1, D) → scale (V, 1)
    v, d = t.shape
    if t.scale.shape[0] != v:
        raise ValueError(
            "embedding tables must be quantized per-row: use block_size (1, D)"
        )
    rows = jnp.take(t.qdata, ids, axis=0).astype(jnp.float32)
    scales = jnp.take(t.scale, ids, axis=0).astype(jnp.float32)
    if t.zero_point is not None:
        zps = jnp.take(t.zero_point, ids, axis=0).astype(jnp.float32)
        rows = rows - zps
    return (rows * scales).astype(out_dtype)


@implements("embedding", IntxArray)
def _intx_embedding(t: IntxArray, ids, out_dtype):
    v, d = t.shape
    if t.packed or t.scale.shape[0] != v:
        # bitplane-packed or group-scaled tables: dequantize then gather
        # (XLA fuses the dequant into the gather producer; sub-8-bit tables
        # are small enough that the transient is acceptable — the win is
        # checkpoint/HBM residency, ref: embedding_xbit CPU kernels)
        return jnp.take(t.dequantize(out_dtype), ids, axis=0)
    rows = jnp.take(t.qdata, ids, axis=0).astype(jnp.float32)
    scales = jnp.take(t.scale, ids, axis=0).astype(jnp.float32)
    if t.zero_point is not None:
        rows = rows - jnp.take(t.zero_point, ids, axis=0).astype(jnp.float32)
    return (rows * scales).astype(out_dtype)
