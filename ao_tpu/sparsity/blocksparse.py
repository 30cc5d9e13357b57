"""Block-sparse (BSR) weights.

(ref: torchao/sparsity/blocksparse.py:133 ``BlockSparseTensor`` + the
autotuned triton bsr_dense_addmm kernel/bsr_triton_ops.py. TPU re-design:
blocks are MXU-tile-sized (multiples of 128 recommended); the emulated
path scatters blocks to dense and dots; the Pallas path uses scalar
prefetch of the block indices to DMA only live blocks (later round).)

Layout for (K, N) weights with block size b:
  values:      (nnz, b, b)
  row_indices: (nnz,) int32 — block-row (along K/b)
  col_indices: (nnz,) int32 — block-col (along N/b)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass


@qarray_dataclass
class BlockSparseArray(QuantizedArray):
    values: jax.Array  # (nnz, b, b)
    row_indices: jax.Array  # (nnz,)
    col_indices: jax.Array  # (nnz,)
    blocksize: int = meta(default=64)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def from_hp(cls, hp: jax.Array, blocksize: int = 64,
                keep_fraction: float = None, dequant_dtype: str = "bfloat16"):
        """Keep blocks with the largest Frobenius norms. ``keep_fraction``
        defaults to keeping blocks with any nonzero (exact BSR of a
        pre-pruned weight)."""
        k, n = hp.shape
        b = blocksize
        if k % b or n % b:
            raise ValueError(f"shape {hp.shape} not divisible by block {b}")
        w = np.asarray(hp, np.float32)
        blocks = w.reshape(k // b, b, n // b, b).transpose(0, 2, 1, 3)
        norms = np.linalg.norm(blocks, axis=(2, 3))
        if keep_fraction is None:
            keep = norms > 0
        else:
            nkeep = max(1, int(round(keep_fraction * norms.size)))
            thresh = np.partition(norms.ravel(), -nkeep)[-nkeep]
            keep = norms >= thresh
        rows, cols = np.nonzero(keep)
        vals = blocks[rows, cols]
        # kernel invariants: every output col-block present (pad empty cols
        # with one zero block) and entries sorted by (col, row), so the
        # Pallas kernel visits each output tile in one contiguous run
        missing = np.setdiff1d(np.arange(n // b), np.unique(cols))
        if missing.size:
            rows = np.concatenate([rows, np.zeros_like(missing)])
            cols = np.concatenate([cols, missing])
            vals = np.concatenate(
                [vals, np.zeros((missing.size, b, b), vals.dtype)]
            )
        order = np.lexsort((rows, cols))
        rows, cols, vals = rows[order], cols[order], vals[order]
        return cls(
            values=jnp.asarray(vals, jnp.dtype(dequant_dtype)),
            row_indices=jnp.asarray(rows, jnp.int32),
            col_indices=jnp.asarray(cols, jnp.int32),
            blocksize=b,
            _shape=(k, n),
            _dequant_dtype=dequant_dtype,
        )

    @property
    def nnz_blocks(self) -> int:
        return self.values.shape[0]

    def matmul(self, x: jax.Array) -> jax.Array:
        """x (M, K) @ this (K, N) via a ragged contraction over live blocks.

        The (col,row)-sorted block list turns BSR×dense into ONE
        `ragged_dot_general`: gather x's live row-blocks → lhs (L, M) with
        L = nnz·b segmented by output col-block; rhs = values (L, b);
        ragged-contract per segment → (ncol, M, b) → (M, N). Work and HBM
        scale with nnz, and the MXU sees one long pipelined contraction
        instead of nnz tiny dots (ref analog: bsr_dense_addmm's autotuned
        triton loop; measured faster than both a per-block Pallas grid and
        dense at ≤50% density)."""
        m, k = x.shape
        kk, n = self.shape
        b = self.blocksize
        nnz = self.nnz_blocks
        ncol = n // b
        xb = x.reshape(m, k // b, b)[:, self.row_indices]  # (M, nnz, b)
        lhs = xb.transpose(1, 2, 0).reshape(nnz * b, m)  # (L, M) col-sorted
        rhs = self.values.astype(x.dtype).reshape(nnz * b, b)  # (L, b)
        gs = jnp.bincount(self.col_indices, length=ncol).astype(jnp.int32) * b
        dims = jax.lax.RaggedDotDimensionNumbers(
            dot_dimension_numbers=(((0,), (0,)), ((), ())),
            lhs_ragged_dimensions=[0],
            rhs_group_dimensions=[],
        )
        y = jax.lax.ragged_dot_general(
            lhs, rhs, gs, dims, preferred_element_type=jnp.float32
        )  # (ncol, M, b)
        return y.transpose(1, 0, 2).reshape(m, n).astype(x.dtype)

    def dequantize(self, output_dtype=None):
        k, n = self.shape
        b = self.blocksize
        dense = jnp.zeros((k // b, n // b, b, b), self.values.dtype)
        dense = dense.at[self.row_indices, self.col_indices].set(self.values)
        out = dense.transpose(0, 2, 1, 3).reshape(k, n)
        return out.astype(output_dtype or self.dtype)
