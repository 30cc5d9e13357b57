"""Quantization observability: per-linear activation stats and a layer-wise
numeric debugger.

(ref: torchao/prototype/quant_logger/quant_logger.py:36-265 — ``log_tensor``
custom op + ``ActivationLoggingTensor`` intercepting F.linear, and the pt2e
numeric debugger's per-node comparisons (pt2e/_numeric_debugger.py). TPU
re-design: a ``LoggedWeight`` container wraps any weight leaf; its linear
impl records input/output stats through ``jax.debug.callback`` — the
host-callback mechanism that works *inside jit* — keyed by the fqn captured
at attach time. The layer-wise debugger runs hp and quantized params through
the same model and reports per-linear SQNR.)
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.ops.dispatch import implements
from ao_tpu.quantization.qarrays.base import QuantizedArray, meta, qarray_dataclass
from ao_tpu.quantization.quantize import default_filter, path_to_fqn

_LOCK = threading.Lock()
_RECORDS: Dict[str, List[Dict[str, float]]] = {}
_CAPTURE: Dict[str, List[jax.Array]] = {}
_CAPTURE_ON = False


def get_records() -> Dict[str, List[Dict[str, float]]]:
    return dict(_RECORDS)


def clear_records() -> None:
    with _LOCK:
        _RECORDS.clear()
        _CAPTURE.clear()


def _record_cb(fqn: str, stats: jax.Array) -> None:
    with _LOCK:
        _RECORDS.setdefault(fqn, []).append({
            "in_absmax": float(stats[0]),
            "in_absmean": float(stats[1]),
            "out_absmax": float(stats[2]),
            "out_absmean": float(stats[3]),
        })


def _capture_cb(fqn: str, out: jax.Array) -> None:
    with _LOCK:
        _CAPTURE.setdefault(fqn, []).append(jax.device_get(out))


@qarray_dataclass
class LoggedWeight(QuantizedArray):
    """Wraps any weight (plain array or QuantizedArray) and logs activation
    stats on every linear through it."""

    inner: Any  # plain array or QuantizedArray (pytree child)
    fqn: str = meta(default="")
    capture_output: bool = meta(default=False)
    _shape: Tuple[int, ...] = meta(default=())
    _dequant_dtype: str = meta(default="bfloat16")

    def dequantize(self, output_dtype=jnp.bfloat16):
        if isinstance(self.inner, QuantizedArray):
            return self.inner.dequantize(output_dtype)
        return self.inner.astype(output_dtype)


@implements("linear", LoggedWeight)
def _logged_linear(x: jax.Array, w: LoggedWeight, b):
    from ao_tpu.ops.linear import linear

    y = linear(x, w.inner, b)
    xa = jnp.abs(x.astype(jnp.float32))
    ya = jnp.abs(y.astype(jnp.float32))
    stats = jnp.stack(
        [jnp.max(xa), jnp.mean(xa), jnp.max(ya), jnp.mean(ya)]
    )
    if isinstance(stats, jax.core.Tracer):
        # inside jit: route through the host-callback mechanism (some
        # backends — e.g. tunneled PJRT — lack host callbacks; there, run
        # the logged forward un-jitted: eager per-op dispatch still lands
        # every matmul on the accelerator)
        jax.debug.callback(_record_cb, w.fqn, stats)
        if w.capture_output:
            jax.debug.callback(_capture_cb, w.fqn, y.astype(jnp.float32))
    else:
        _record_cb(w.fqn, jax.device_get(stats))
        if w.capture_output:
            _capture_cb(w.fqn, y.astype(jnp.float32))
    return y


def attach_logger(
    params: Any,
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
    capture_output: bool = False,
) -> Any:
    """Wrap weight leaves in LoggedWeight (pure; returns a new pytree)."""
    filter_fn = filter_fn or default_filter

    def wrap(path, leaf):
        fqn = path_to_fqn(path)
        ok = (
            isinstance(leaf, QuantizedArray)
            or (hasattr(leaf, "ndim") and filter_fn(fqn, leaf))
        )
        if not ok or isinstance(leaf, LoggedWeight):
            return leaf
        return LoggedWeight(
            inner=leaf,
            fqn=fqn,
            capture_output=capture_output,
            _shape=tuple(leaf.shape),
        )

    return jax.tree_util.tree_map_with_path(
        wrap, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )


def detach_logger(params: Any) -> Any:
    def unwrap(leaf):
        return leaf.inner if isinstance(leaf, LoggedWeight) else leaf

    return jax.tree_util.tree_map(
        unwrap, params, is_leaf=lambda x: isinstance(x, LoggedWeight)
    )


# ---------------------------------------------------------------------------
# Layer-wise numeric debugger
# ---------------------------------------------------------------------------


def compare_layerwise(
    params_ref: Any,
    params_test: Any,
    run_fn: Callable[[Any], Any],
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
) -> Dict[str, float]:
    """Run ``run_fn(params)`` for both pytrees capturing every linear's
    output; return {fqn: SQNR dB of test vs ref}. The quantization debugging
    workflow: find which layer destroys the signal.

    (ref: pt2e numeric debugger with per-node debug handles.)
    """
    from ao_tpu.quantization.primitives import compute_error

    def capture(params):
        clear_records()
        wrapped = attach_logger(params, filter_fn, capture_output=True)
        out = run_fn(wrapped)
        jax.block_until_ready(out)
        with _LOCK:
            return {k: list(v) for k, v in _CAPTURE.items()}

    ref = capture(params_ref)
    test = capture(params_test)
    clear_records()
    result = {}
    for fqn in ref:
        if fqn not in test:
            continue
        pairs = zip(ref[fqn], test[fqn])
        vals = [float(compute_error(jnp.asarray(a), jnp.asarray(b)))
                for a, b in pairs]
        result[fqn] = sum(vals) / max(len(vals), 1)
    return result
