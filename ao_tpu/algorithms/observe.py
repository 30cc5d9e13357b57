"""Calibration observers: weight wrappers that record activation statistics.

(ref analog: GPTQObserverTensor torchao/prototype/gptq/observer.py:13, the
AWQ/SmoothQuant observers prototype/awq/core.py, prototype/smoothquant/core.py.
There, nn.Module state is mutated during forwards; here the params pytree
holds ``ObservedArray`` leaves whose ``stats`` object is a plain python
accumulator. Calibration forwards therefore run OUTSIDE jit (eagerly); each
underlying matmul/reduction is still XLA-compiled op-by-op, which is plenty
for calibration-scale data. After calibration, ``quantize_`` with
step="convert" reads the accumulated stats.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ao_tpu.ops.dispatch import implements
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass


class StatsAccumulator:
    """Mutable per-weight statistics store. Hashable by identity so it can
    live in pytree aux data (calibration is eager; never crosses jit)."""

    def __init__(self, kind: str):
        self.kind = kind
        self.n = 0
        self.hessian: Optional[jax.Array] = None  # (K, K) for gptq
        self.abs_sum: Optional[jax.Array] = None  # (K,) for awq
        self.abs_max: Optional[jax.Array] = None  # (K,) for smoothquant
        self.amax: Optional[jax.Array] = None  # scalar act amax (static quant)
        self.sample: Optional[jax.Array] = None  # first activation batch
        self.sq_sum: Optional[jax.Array] = None  # (K,) Σx² for wanda

    @property
    def act_l2(self):
        if self.sq_sum is None:
            raise ValueError("no wanda statistics collected")
        import jax.numpy as _jnp

        return _jnp.sqrt(self.sq_sum)

    def update(self, x2d: jax.Array) -> None:
        """x2d: (M, K) activation batch (already flattened)."""
        m = x2d.shape[0]
        xf = x2d.astype(jnp.float32)
        if self.kind == "gptq":
            # running mean of 2 x^T x  (ref: observer.py:67-120 update_2d)
            h = 2.0 * (xf.T @ xf)
            if self.hessian is None:
                self.hessian = h / m
            else:
                tot = self.n + m
                self.hessian = self.hessian * (self.n / tot) + h / tot
        elif self.kind == "awq":
            s = jnp.sum(jnp.abs(xf), axis=0)
            self.abs_sum = s if self.abs_sum is None else self.abs_sum + s
            if self.sample is None:
                self.sample = x2d[: min(64, m)]
        elif self.kind == "smoothquant":
            mx = jnp.max(jnp.abs(xf), axis=0)
            self.abs_max = mx if self.abs_max is None else jnp.maximum(self.abs_max, mx)
        elif self.kind == "wanda":
            # running sum of squares per input channel (ref: wanda.py norms)
            sq = jnp.sum(xf * xf, axis=0)
            self.sq_sum = sq if getattr(self, "sq_sum", None) is None else self.sq_sum + sq
        elif self.kind == "static":
            mx = jnp.max(jnp.abs(xf))
            self.amax = mx if self.amax is None else jnp.maximum(self.amax, mx)
            if self.sample is None:  # kept for the MSE observer
                self.sample = x2d[: min(256, m)]
        else:
            raise ValueError(self.kind)
        self.n += m

    def update_grouped(self, x_sorted: jax.Array, group_sizes: jax.Array,
                       n_experts: int) -> None:
        """Per-expert Hessian accumulation for MoE weights (ref:
        observer.py:67-120 ``update_3d_with_offs`` — grouped xᵀx). x_sorted
        (T, K) is expert-sorted; stores Σ 2 x_eᵀ x_e (E, K, K) + counts."""
        if self.kind != "gptq":
            raise ValueError("grouped observation only implemented for gptq")
        xf = x_sorted.astype(jnp.float32)
        dims = jax.lax.RaggedDotDimensionNumbers(
            dot_dimension_numbers=(((0,), (0,)), ((), ())),
            lhs_ragged_dimensions=[0],
            rhs_group_dimensions=[],
        )
        h = 2.0 * jax.lax.ragged_dot_general(
            xf, xf, group_sizes, dims, preferred_element_type=jnp.float32
        )  # (E, K, K)
        if getattr(self, "hess_sum", None) is None:
            self.hess_sum = h
            self.h_count = group_sizes.astype(jnp.float32)
        else:
            self.hess_sum = self.hess_sum + h
            self.h_count = self.h_count + group_sizes.astype(jnp.float32)

    @property
    def grouped_hessian(self) -> jax.Array:
        """(E, K, K) mean Hessians."""
        if getattr(self, "hess_sum", None) is None:
            raise ValueError("no grouped gptq statistics collected")
        cnt = jnp.maximum(self.h_count, 1.0)
        return self.hess_sum / cnt[:, None, None]

    # identity hash/eq so pytrees treat two accumulators as distinct aux
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@qarray_dataclass
class ObservedArray(QuantizedArray):
    """High-precision weight + stats accumulator; forwards run in hp."""

    weight: jax.Array
    stats: StatsAccumulator = meta(default=None)
    _shape: tuple = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    @classmethod
    def wrap(cls, weight: jax.Array, kind: str) -> "ObservedArray":
        return cls(
            weight=weight,
            stats=StatsAccumulator(kind),
            _shape=tuple(weight.shape),
            _dequant_dtype=str(weight.dtype),
        )

    def dequantize(self, output_dtype=None):
        return self.weight.astype(output_dtype or self.weight.dtype)


@implements("grouped_matmul", ObservedArray)
def _observed_grouped(x, w: ObservedArray, group_sizes, out_dtype):
    if isinstance(x, jax.core.Tracer):
        raise RuntimeError(
            "calibration forwards must run eagerly (outside jit)"
        )
    if w.stats.kind == "gptq":
        w.stats.update_grouped(x, group_sizes, w.weight.shape[0])
    else:
        # awq/smoothquant/wanda/static stats are per-input-channel and
        # expert-agnostic — the plain update applies
        w.stats.update(x)
    y = jax.lax.ragged_dot(
        x, w.weight.astype(x.dtype), group_sizes,
        preferred_element_type=jnp.float32,
    )
    return y.astype(out_dtype or x.dtype)


@implements("linear", ObservedArray)
def _observed_linear(x, w: ObservedArray, b):
    if isinstance(x, jax.core.Tracer):
        raise RuntimeError(
            "calibration forwards must run eagerly (outside jit): "
            "ObservedArray accumulates statistics in python state"
        )
    x2 = x.reshape(-1, x.shape[-1])
    w.stats.update(x2)
    y = jnp.matmul(x2, w.weight.astype(x.dtype))
    y = y.reshape(*x.shape[:-1], y.shape[-1])
    return y if b is None else y + b.astype(y.dtype)
