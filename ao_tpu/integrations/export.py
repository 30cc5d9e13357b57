"""Graph export: quantized forwards → StableHLO.

(ref analog: torchao's pt2e/export stack — prepare_pt2e/convert_pt2e FX
rewriting + ``unwrap_tensor_subclass`` for torch.export (torchao/utils.py:
302-362). The TPU framework needs none of that machinery: jax is already
graph-based, QuantizedArrays flatten to plain arrays at the jit boundary,
and `jax.export` emits portable StableHLO with the quantize/dequantize
arithmetic inlined — the equivalent of pt2e's "reference representation"
q/dq graphs, consumable by any StableHLO backend.)
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_quantized(
    fn: Callable,
    args: Tuple[Any, ...],
    platforms: Sequence[str] = ("tpu", "cpu"),
):
    """Export ``fn(*args)`` (args may contain QuantizedArray pytrees) to a
    portable ``jax.export.Exported`` artifact."""
    return jax_export.export(jax.jit(fn), platforms=tuple(platforms))(*args)


def stablehlo_text(fn: Callable, args: Tuple[Any, ...]) -> str:
    """The StableHLO module text (for inspection/tests — the q/dq + matmul
    arithmetic appears inlined as plain stablehlo ops)."""
    return export_quantized(fn, args).mlir_module()


def serialize(exported) -> bytes:
    return bytes(exported.serialize())


def deserialize(blob: bytes):
    return jax_export.deserialize(bytearray(blob))


def roundtrip_call(fn: Callable, args: Tuple[Any, ...]):
    """Export → serialize → deserialize → call. Returns the result of the
    deserialized artifact on ``args`` (the portability smoke test)."""
    exp = export_quantized(fn, args, platforms=(jax.default_backend(),))
    blob = serialize(exp)
    back = deserialize(blob)
    flat_args = jax.tree_util.tree_leaves(args)
    return back.call(*args)
