"""Fast host-side checkpoint quantization (quantize-on-load).

(ref analog: torchao's serving flow where vLLM loads bf16 safetensors and
quantizes during weight loading — the "47% faster model load" row in
docs/source/eager_tutorials/serving.rst:389. Here the hot loop is the native
C++ kernel library (csrc/ao_tpu_host.cpp): fused minmax→quantize→pack on
host memory, one device transfer of the *packed* bytes instead of shipping
bf16 to the device and quantizing there — 4x less H2D traffic for int4.)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.quantization import primitives as P
from ao_tpu.quantization.configs import (
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt4WeightConfig,
    Int8WeightOnlyConfig,
)
from ao_tpu.quantization.qarrays.common import ActQuantSpec
from ao_tpu.quantization.granularity import PerGroup, PerRow
from ao_tpu.quantization.qarrays.base import QuantizedArray
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.quantization.quantize import default_filter, path_to_fqn
from ao_tpu.utils import native


def _int4_host(w: np.ndarray, config, act_quant=None) -> Int4Array:
    g = config.group_size
    k = w.shape[0]
    packed, scale, zp = native.quantize_int4_tinygemm_host(w, g)
    # repack (still on host) into the layout from_hp would pick, so the
    # loaded model hits the same fused kernels as device-side quantize_
    if (act_quant is not None and k % 8 == 0 and (k // g) % 2 == 0
            and g % 8 == 0):
        qdata, layout = native.repack_int4_magic8_host(packed, g), "magic8"
    elif (k // g) % 4 == 0:
        qdata, layout = native.repack_int4_magic_host(packed, g), "magic"
    else:
        qdata, layout = packed, "halves"
    return Int4Array(
        qdata=jnp.asarray(qdata),
        scale=jnp.asarray(scale).astype(jnp.bfloat16),
        zero_point=jnp.asarray(zp).astype(jnp.bfloat16),
        act_pre_scale=None,
        block_size=(g, 1),
        zero_point_domain=P.ZeroPointDomain.FLOAT,
        act_quant=act_quant,
        _shape=tuple(w.shape),
        _dequant_dtype="bfloat16",
        _layout=layout,
    )


def _int8_host(w: np.ndarray, config: Int8WeightOnlyConfig) -> Int8Array:
    gran = config.granularity
    if isinstance(gran, PerGroup):
        g = gran.group_size
    else:  # PerRow / default → one scale per out-channel (whole K)
        g = w.shape[0]
    q, scale = native.quantize_int8_symmetric_host(w, g)
    return Int8Array(
        qdata=jnp.asarray(q),
        scale=jnp.asarray(scale),
        zero_point=None,
        act_scale=None,
        act_zero_point=None,
        act_pre_scale=None,
        block_size=(g, 1),
        act_quant=None,
        _shape=tuple(w.shape),
        _dequant_dtype="bfloat16",
    )


def quantize_on_load(
    params: Any,
    config: AOBaseConfig,
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
    device=None,
) -> Any:
    """quantize_ twin that runs qparam selection + packing on the HOST
    (native C++ when available) and ships only packed bytes to the device.

    Supports Int4WeightOnlyConfig (tinygemm qparams),
    Int8DynamicActivationInt4WeightConfig (same weights + int8 per-token
    act spec, shipped in the W4A8 magic8 layout) and Int8WeightOnlyConfig
    (symmetric); other configs fall back to the device-side ``quantize_``.
    Int4 qdata is repacked on the host into the same magic/magic8 layout
    ``from_hp``'s AUTO would pick, so loaded checkpoints hit the fused
    kernels.
    """
    from ao_tpu.quantization.quantize import quantize_

    filter_fn = filter_fn or default_filter

    def transform(path, leaf):
        fqn = path_to_fqn(path)
        if isinstance(leaf, QuantizedArray) or not filter_fn(fqn, leaf):
            return leaf
        w = np.asarray(jax.device_get(leaf), dtype=np.float32)
        if w.ndim != 2:
            return leaf
        if isinstance(config, Int4WeightOnlyConfig):
            if w.shape[0] % config.group_size:
                return leaf
            out = _int4_host(w, config)
        elif isinstance(config, Int8DynamicActivationInt4WeightConfig):
            if w.shape[0] % config.group_size:
                return leaf
            out = _int4_host(
                w, config,
                act_quant=ActQuantSpec(dtype="int8", granularity="per_token",
                                       symmetric=True))
        elif isinstance(config, Int8WeightOnlyConfig):
            out = _int8_host(w, config)
        else:
            return quantize_({"w": leaf}, config)["w"]
        if device is not None:
            out = jax.device_put(out, device)
        return out

    return jax.tree_util.tree_map_with_path(
        transform, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
