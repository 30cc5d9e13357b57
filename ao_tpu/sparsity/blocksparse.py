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

    def dequantize(self, output_dtype=None):
        k, n = self.shape
        b = self.blocksize
        dense = jnp.zeros((k // b, n // b, b, b), self.values.dtype)
        dense = dense.at[self.row_indices, self.col_indices].set(self.values)
        out = dense.transpose(0, 2, 1, 3).reshape(k, n)
        return out.astype(output_dtype or self.dtype)
