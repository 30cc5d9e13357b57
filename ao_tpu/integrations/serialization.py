"""Checkpoint serialization of quantized param pytrees.

(ref: torchao/prototype/safetensors/safetensors_support.py:16,117
``flatten_tensor_state_dict``/``unflatten_tensor_state_dict`` — decompose
tensor subclasses into plain tensors named ``{fqn}:{attr}`` plus JSON
metadata, with reconstruction restricted to an allow-list. TPU analog:
QuantizedArray pytree leaves are already plain arrays; flattening walks the
pytree, records each container's class + static metadata, and reconstruction
goes through the qarray registry — the same trust boundary as the
reference's allowed-classes list.)

Two on-disk formats:
  * ``.safetensors`` via safetensors.flax (HF-interoperable). Dtypes
    safetensors can't represent (fp8, e8m0) are bitcast to uint8 with the
    true dtype recorded in metadata.
  * ``.npz`` fallback with a JSON sidecar (same layout), no extra deps.

The quantization recipe (an AOBaseConfig) can be embedded so a checkpoint is
self-describing (ref: HF checkpoints embedding the quant config,
test/core/test_config.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ao_tpu.core.config import (
    AOBaseConfig,
    _decode_value,
    _encode_value,
    config_from_dict,
    config_to_dict,
)
from ao_tpu.quantization.qarrays.base import (
    QuantizedArray,
    get_qarray_class,
    list_qarray_classes,
)
from ao_tpu.quantization.quantize import path_to_fqn

# dtypes safetensors/numpy can hold natively; everything else ships as a
# uint8 bitcast with "viewed_dtype" recorded
_NATIVE_DTYPES = {
    "float32", "float16", "bfloat16", "float64",
    "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64", "bool",
}

FORMAT_VERSION = 1


def _shim_out(x: jax.Array) -> Tuple[jax.Array, Optional[str]]:
    name = jnp.dtype(x.dtype).name
    if name in _NATIVE_DTYPES:
        return x, None
    itemsize = jnp.dtype(x.dtype).itemsize
    if itemsize != 1:
        raise TypeError(f"cannot serialize dtype {name}")
    return jax.lax.bitcast_convert_type(x, jnp.uint8), name


def _shim_in(x: jax.Array, viewed: Optional[str]) -> jax.Array:
    if viewed is None:
        return x
    return jax.lax.bitcast_convert_type(x, jnp.dtype(viewed))


def flatten_quantized_state_dict(
    params: Any,
) -> Tuple[Dict[str, jax.Array], Dict[str, Any]]:
    """Returns (tensors {name: plain array}, metadata dict).

    Plain leaves keep their fqn; QuantizedArray leaves expand to
    ``{fqn}:{field}`` entries plus a metadata record of class name and
    static (meta) fields.
    """
    tensors: Dict[str, jax.Array] = {}
    meta: Dict[str, Any] = {"_format_version": FORMAT_VERSION, "entries": {}}

    def visit(path, leaf):
        fqn = path_to_fqn(path)
        if isinstance(leaf, QuantizedArray):
            fields = {}
            for name, v in leaf.data_fields().items():
                if v is None:
                    continue
                arr, viewed = _shim_out(v)
                tensors[f"{fqn}:{name}"] = arr
                fields[name] = {"viewed_dtype": viewed}
            meta["entries"][fqn] = {
                "kind": "qarray",
                "class": type(leaf).__name__,
                "fields": fields,
                "meta": {k: _encode_value(v) for k, v in leaf.meta_fields().items()},
            }
        elif isinstance(leaf, (jax.Array, np.ndarray)):
            arr, viewed = _shim_out(jnp.asarray(leaf))
            tensors[fqn] = arr
            meta["entries"][fqn] = {"kind": "plain", "viewed_dtype": viewed}
        else:
            raise TypeError(f"unsupported leaf at {fqn}: {type(leaf)}")
        return leaf

    jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
    return tensors, meta


def _insert(tree: Dict[str, Any], fqn: str, value: Any) -> None:
    parts = fqn.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _listify(node: Any) -> Any:
    """Dict nodes whose keys are 0..n-1 digits were lists before flattening."""
    if not isinstance(node, dict):
        return node
    out = {k: _listify(v) for k, v in node.items()}
    if out and all(k.isdigit() for k in out):
        idx = sorted(out, key=int)
        if [int(i) for i in idx] == list(range(len(idx))):
            return [out[i] for i in idx]
    return out


def unflatten_quantized_state_dict(
    tensors: Dict[str, jax.Array], meta: Dict[str, Any]
) -> Any:
    """Inverse of :func:`flatten_quantized_state_dict`. QuantizedArray
    classes resolve through the qarray registry only (trust boundary)."""
    if meta.get("_format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported format version {meta.get('_format_version')}")
    tree: Dict[str, Any] = {}
    for fqn, entry in meta["entries"].items():
        if entry["kind"] == "plain":
            _insert(tree, fqn, _shim_in(tensors[fqn], entry.get("viewed_dtype")))
            continue
        cls_name = entry["class"]
        if cls_name not in list_qarray_classes():
            raise ValueError(
                f"refusing to reconstruct unregistered qarray class {cls_name!r}"
            )
        cls = get_qarray_class(cls_name)
        kwargs: Dict[str, Any] = {}
        for name, finfo in entry["fields"].items():
            kwargs[name] = _shim_in(
                tensors[f"{fqn}:{name}"], finfo.get("viewed_dtype")
            )
        for name in cls._data_field_names:
            kwargs.setdefault(name, None)
        for name, v in entry["meta"].items():
            kwargs[name] = _decode_value(v)
        obj = object.__new__(cls)
        for k, v in kwargs.items():
            object.__setattr__(obj, k, v)
        _insert(tree, fqn, obj)
    return _listify(tree)


# ---------------------------------------------------------------------------
# File IO
# ---------------------------------------------------------------------------


def save_quantized(
    path: str, params: Any, config: Optional[AOBaseConfig] = None
) -> None:
    """Write a (possibly quantized) params pytree to ``path``.

    ``.safetensors`` → HF-interoperable safetensors file with the pytree
    metadata (and optional quant config) in the header metadata;
    anything else → ``.npz`` + ``<path>.json`` sidecar.
    """
    tensors, meta = flatten_quantized_state_dict(params)
    if config is not None:
        meta["quant_config"] = config_to_dict(config)
    # Materialize as plain-numpy-dtype arrays: ml_dtypes (bf16) and other
    # exotic dtypes are viewed as same-width uints, recorded for restore.
    # (safetensors' flax adapter mangles device-backed arrays — going
    # through host numpy buffers is both safer and faster for large trees.)
    plain_np = {np.dtype(t) for t in (
        np.float16, np.float32, np.float64, np.int8, np.int16, np.int32,
        np.int64, np.uint8, np.uint16, np.uint32, np.uint64, np.bool_,
    )}
    out = {}
    views = {}
    for k, v in tensors.items():
        a = np.asarray(jax.device_get(v))
        if a.dtype not in plain_np:
            views[k] = a.dtype.name
            a = a.view({1: np.uint8, 2: np.uint16, 4: np.uint32}[
                a.dtype.itemsize])
        out[k] = np.ascontiguousarray(a)
    meta = dict(meta, dtype_views=views)
    if path.endswith(".safetensors"):
        import safetensors.numpy

        safetensors.numpy.save_file(
            out, path, metadata={"ao_tpu": json.dumps(meta)}
        )
    else:
        npz_path = path if path.endswith(".npz") else path + ".npz"
        np.savez(npz_path, **out)
        with open(npz_path + ".json", "w") as f:
            json.dump(meta, f)


def load_quantized(path: str) -> Tuple[Any, Optional[AOBaseConfig]]:
    """Returns (params pytree, embedded quant config or None)."""
    if path.endswith(".safetensors"):
        import safetensors
        import safetensors.numpy

        raw = safetensors.numpy.load_file(path)
        with safetensors.safe_open(path, framework="np") as f:
            meta = json.loads(f.metadata()["ao_tpu"])
    else:
        npz_path = path if path.endswith(".npz") else path + ".npz"
        npz = np.load(npz_path)
        raw = {k: npz[k] for k in npz.files}
        with open(npz_path + ".json") as f:
            meta = json.load(f)
    views = meta.get("dtype_views", {})
    tensors = {}
    for k, a in raw.items():
        x = jnp.asarray(a)
        if k in views:
            x = jax.lax.bitcast_convert_type(x, jnp.dtype(views[k]))
        tensors[k] = x
    config = None
    if "quant_config" in meta:
        config = config_from_dict(meta["quant_config"])
    return unflatten_quantized_state_dict(tensors, meta), config
