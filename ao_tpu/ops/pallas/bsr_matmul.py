"""Block-sparse (BSR) dense-activation matmul, Pallas TPU.

(ref: the autotuned triton ``bsr_dense_addmm`` torchao/kernel/
bsr_triton_ops.py:254. TPU re-design: grid (m_tiles, nnz_blocks) with the
block row/col indices as SCALAR-PREFETCH operands — the index maps steer
each step's DMA to exactly the live blocks, so HBM traffic and MXU work
scale with nnz, not with the dense shape. Blocks are stored sorted by
(col, row) and padded so every output column-block appears at least once:
each output tile is then visited in one contiguous run — zeroed on first
visit, accumulated across its run, written back once.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ao_tpu.ops.pallas import UnsupportedShape


def _kernel(row_ref, col_ref, x_ref, v_ref, o_ref, *, out_dtype):
    i = pl.program_id(1)

    is_first = jnp.where(
        i == 0, True, col_ref[i] != col_ref[jnp.maximum(i - 1, 0)]
    )

    @pl.when(is_first)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot(
        x_ref[:], v_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blocksize", "n_out", "out_dtype"))
def _impl(x, values, row_idx, col_idx, *, blocksize, n_out, out_dtype):
    m, k = x.shape
    nnz = values.shape[0]
    b = blocksize

    tm = 256 if m > 256 else ((m + 7) // 8) * 8
    pad_m = (-m) % tm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = m + pad_m

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # row_idx, col_idx
        grid=(mp // tm, nnz),
        in_specs=[
            pl.BlockSpec((tm, b), lambda mi, i, row, col: (mi, row[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, b), lambda mi, i, row, col: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, b), lambda mi, i, row, col: (mi, col[i]),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n_out), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * b * b * nnz,
            bytes_accessed=nnz * b * b * 2 + mp * k * 2 + mp * n_out * 2,
            transcendentals=0,
        ),
    )(row_idx, col_idx, x, values)
    return out[:m] if pad_m else out


def bsr_matmul_pallas(x, w) -> jax.Array:
    """x (M, K) @ BlockSparseArray (K, N) → (M, N).

    Requires blocksize % 128 == 0 (MXU lane alignment) and the array's
    kernel-ready invariants (col-sorted, every col block present) —
    BlockSparseArray.from_hp establishes them.
    """
    b = w.blocksize
    k, n = w.shape
    if x.ndim != 2:
        raise UnsupportedShape("2-D activations only")
    if b % 128 != 0:
        raise UnsupportedShape(f"blocksize {b} not MXU-aligned (need %128)")
    if not getattr(w, "_kernel_ready", True):
        raise UnsupportedShape("BSR array not kernel-sorted")
    return _impl(
        x.astype(jnp.bfloat16), w.values.astype(jnp.bfloat16),
        w.row_indices, w.col_indices,
        blocksize=b, n_out=n, out_dtype=jnp.bfloat16,
    )
