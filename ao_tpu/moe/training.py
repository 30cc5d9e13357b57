"""Low-precision MoE training: fp8 / mxfp8 grouped matmuls with custom VJP.

(ref: torchao/prototype/moe_training/tensor.py:52-330 — the
``TrainingWeightWrapperBaseTensor`` `_grouped_mm` override running
fp8-rowwise or mxfp8(rceil) grouped gemms with dynamic per-token-group
scales, and the jagged per-group scale triton kernels in
moe_training/kernels/. TPU re-design: all three gemms (out, dinput,
dweight) are `jax.lax.ragged_dot`/`ragged_dot_general` calls with fp8
operands and fp32 accumulation; the "jagged" per-expert scales for the
dweight gemm come from `jax.ops.segment_max` over the token axis instead of
a custom kernel.)

Numerics contract (matches the reference's recipe):
  out     = cast_rowwise(x, axis=-1) @ cast_rowwise(w, axis=K)
  dinput  = cast_rowwise(g, axis=-1) @ cast_rowwise(wT, axis=N)
  dweight = cast_colwise_per_group(x) ᵀ@ cast_colwise_per_group(g)
with every cast dynamic (amax / fp8_max) and accumulation in fp32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ao_tpu.moe.grouped import token_expert_ids

FP8_MAX = 448.0
_E4M3 = jnp.float8_e4m3fn


def _cast_rowwise(x: jax.Array, axis: int):
    """amax-scaled fp8 cast with one scale per slice along ``axis``."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / FP8_MAX
    q = jnp.clip(xf / scale, -FP8_MAX, FP8_MAX).astype(_E4M3)
    return q, scale


def _cast_colwise_per_group(x: jax.Array, group_sizes: jax.Array, n_experts: int):
    """Per-(expert, column) fp8 cast of a token-major (T, C) operand.

    The dweight gemm contracts over tokens, so scales must be constant along
    the token axis *within each expert group* — the 'jagged rowwise scales'
    of the reference. Returns (q (T, C) fp8, scale (E, C) f32)."""
    xf = x.astype(jnp.float32)
    ids = token_expert_ids(group_sizes, x.shape[0])
    amax = jax.ops.segment_max(
        jnp.abs(xf), ids, num_segments=n_experts, indices_are_sorted=True
    )  # (E, C); empty groups give -inf
    scale = jnp.maximum(amax, 1e-12) / FP8_MAX
    q = jnp.clip(xf / scale[ids], -FP8_MAX, FP8_MAX).astype(_E4M3)
    return q, scale


def _ragged_dot_fp8(qx, qw, group_sizes):
    return jax.lax.ragged_dot(
        qx, qw, group_sizes, preferred_element_type=jnp.float32
    )


_DW_DIMS = jax.lax.RaggedDotDimensionNumbers(
    dot_dimension_numbers=(((0,), (0,)), ((), ())),
    lhs_ragged_dimensions=[0],
    rhs_group_dimensions=[],
)


def _fwd_fp8(x, w, group_sizes):
    qx, sx = _cast_rowwise(x, axis=-1)  # (T,K), (T,1)
    qw, sw = _cast_rowwise(w, axis=1)  # (E,K,N), (E,1,N)
    acc = _ragged_dot_fp8(qx, qw, group_sizes)
    ids = token_expert_ids(group_sizes, x.shape[0])
    y = acc * sx * sw[:, 0, :][ids]
    return y.astype(x.dtype)


@jax.custom_vjp
def fp8_grouped_matmul(x: jax.Array, w: jax.Array, group_sizes: jax.Array):
    """y[t] = x[t] @ w[e(t)] with all gemms running in fp8 on the MXU.

    x (T, K) sorted by expert; w (E, K, N) high-precision master weights;
    group_sizes (E,) int32. Differentiable in x and w.
    """
    return _fwd_fp8(x, w, group_sizes)


def _fp8_gmm_fwd(x, w, group_sizes):
    return _fwd_fp8(x, w, group_sizes), (x, w, group_sizes)


def _fp8_gmm_bwd(res, g):
    x, w, group_sizes = res
    e = w.shape[0]
    gf = g.astype(jnp.float32)
    ids = token_expert_ids(group_sizes, x.shape[0])

    # dinput = g @ w[e]^T   — rowwise casts (g per token over N, wT per K-col)
    qg, sg = _cast_rowwise(gf, axis=-1)  # (T,N),(T,1)
    wt = jnp.swapaxes(w.astype(jnp.float32), 1, 2)  # (E,N,K)
    qwt, swt = _cast_rowwise(wt, axis=1)  # (E,N,K),(E,1,K)
    dx = _ragged_dot_fp8(qg, qwt, group_sizes) * sg * swt[:, 0, :][ids]

    # dweight[e] = x_eᵀ @ g_e — jagged per-(expert, column) casts
    qxc, sxc = _cast_colwise_per_group(x, group_sizes, e)  # (T,K),(E,K)
    qgc, sgc = _cast_colwise_per_group(gf, group_sizes, e)  # (T,N),(E,N)
    dw_acc = jax.lax.ragged_dot_general(
        qxc, qgc, group_sizes, _DW_DIMS, preferred_element_type=jnp.float32
    )  # (E, K, N)
    dw = dw_acc * sxc[:, :, None] * sgc[:, None, :]

    return dx.astype(x.dtype), dw.astype(w.dtype), None


fp8_grouped_matmul.defvjp(_fp8_gmm_fwd, _fp8_gmm_bwd)


# ---------------------------------------------------------------------------
# MXFP8 (block-32 e8m0 scales, rceil) — emulated-dot numerics
# ---------------------------------------------------------------------------


def _mx_qdq(x, block_size):
    """Quantize-dequantize through MXFP8 (rceil). On TPU there is no native
    e8m0-scaled mma (a CUDA SM100 feature), so numerics are applied q/dq and
    the dot runs bf16 on the MXU — same numerics contract as the reference's
    EMULATED kernel preference."""
    from ao_tpu.quantization import primitives as P
    from ao_tpu.quantization.qarrays.mx import e8m0_decode, to_mx

    q, scale = to_mx(x, block_size, "float8_e4m3fn", "rceil")
    return P.apply_blockwise(
        q.astype(jnp.float32), block_size, lambda v, s: v * s,
        e8m0_decode(scale),
    )


def _fwd_mx(x, w, group_sizes):
    xq = _mx_qdq(x.astype(jnp.float32), (1, 32))
    wq = _mx_qdq(w.astype(jnp.float32), (1, 32, 1))
    y = jax.lax.ragged_dot(
        xq.astype(jnp.bfloat16), wq.astype(jnp.bfloat16), group_sizes,
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


@jax.custom_vjp
def mxfp8_grouped_matmul(x: jax.Array, w: jax.Array, group_sizes: jax.Array):
    """Grouped matmul with MXFP8 (rceil) casts on every gemm operand."""
    return _fwd_mx(x, w, group_sizes)


def _mx_gmm_fwd(x, w, group_sizes):
    return _fwd_mx(x, w, group_sizes), (x, w, group_sizes)


def _mx_gmm_bwd(res, g):
    x, w, group_sizes = res
    gf = g.astype(jnp.float32)

    gq = _mx_qdq(gf, (1, 32))
    wt = jnp.swapaxes(w.astype(jnp.float32), 1, 2)
    wtq = _mx_qdq(wt, (1, 32, 1))
    dx = jax.lax.ragged_dot(
        gq.astype(jnp.bfloat16), wtq.astype(jnp.bfloat16), group_sizes,
        preferred_element_type=jnp.float32,
    )

    # dweight: contraction over tokens — block the token axis (32, 1).
    # Pad T up to a multiple of 32 for the blockwise q/dq (zero rows never
    # raise a block amax), then slice back before the ragged contraction.
    t = x.shape[0]
    tp = (-t) % 32

    def _qdq_tokens(a):
        ap = jnp.pad(a, ((0, tp), (0, 0))) if tp else a
        return _mx_qdq(ap, (32, 1))[:t]

    xq = _qdq_tokens(x.astype(jnp.float32))
    gqc = _qdq_tokens(gf)
    dw = jax.lax.ragged_dot_general(
        xq.astype(jnp.bfloat16), gqc.astype(jnp.bfloat16), group_sizes,
        _DW_DIMS, preferred_element_type=jnp.float32,
    )
    return dx.astype(x.dtype), dw.astype(w.dtype), None


mxfp8_grouped_matmul.defvjp(_mx_gmm_fwd, _mx_gmm_bwd)
