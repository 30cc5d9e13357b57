"""QuantizedArray: pytree-registered quantized array containers.

This is the TPU-native analog of the reference's tensor-subclass runtime
(ref: torchao/utils.py:720 ``TorchAOBaseTensor`` + the `__torch_dispatch__`
op-table machinery). On TPU there is no per-op dispatch problem to solve:

  * a quantized weight is a frozen dataclass of plain jax arrays (qdata,
    scale, zero_point, ...) plus static metadata, registered as a pytree;
  * `jax.jit`, `jax.sharding.NamedSharding`, orbax checkpointing, and
    collectives all operate on the pytree *leaves* directly — slice/cat/
    copy_/all_gather overrides are unnecessary by construction;
  * compute enters through dispatching entry points (`ao_tpu.ops.linear`,
    `matmul`, `einsum`) that select a Pallas kernel or emulated path based
    on the container type — the analog of the reference's op tables, but at
    function granularity instead of aten-op granularity.

Subclasses declare::

    @qarray_dataclass
    class Int8Array(QuantizedArray):
        qdata: jax.Array
        scale: jax.Array
        zero_point: Optional[jax.Array]          # data fields = pytree leaves
        block_size: tuple = meta()               # metadata = static aux data
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Type

import jax
import jax.numpy as jnp

_QARRAY_REGISTRY: Dict[str, Type["QuantizedArray"]] = {}


def meta(**kwargs):
    """Mark a dataclass field as static metadata (pytree aux data)."""
    md = dict(kwargs.pop("metadata", {}) or {})
    md["ao_static"] = True
    return dataclasses.field(metadata=md, **kwargs)


class QuantizedArray:
    """Base for all quantized array containers (not a dataclass itself)."""

    # -- to be provided by subclasses -------------------------------------
    def dequantize(self, output_dtype=jnp.bfloat16) -> jax.Array:
        raise NotImplementedError

    @classmethod
    def from_hp(cls, hp: jax.Array, **kwargs) -> "QuantizedArray":
        raise NotImplementedError

    # -- common api --------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return self._shape  # set as metadata by subclasses

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def dtype(self):
        """Logical (dequantized) dtype."""
        return jnp.dtype(self._dequant_dtype)

    @property
    def nbytes(self) -> int:
        total = 0
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, (jax.Array,)) or hasattr(v, "nbytes"):
                total += v.nbytes
        return total

    def data_fields(self) -> Dict[str, Any]:
        return {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if not f.metadata.get("ao_static")
        }

    def meta_fields(self) -> Dict[str, Any]:
        return {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)
            if f.metadata.get("ao_static")
        }

    def replace(self, **updates) -> "QuantizedArray":
        return dataclasses.replace(self, **updates)

    def __repr__(self):
        fields = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, jax.Array):
                fields.append(f"{f.name}={v.dtype}{list(v.shape)}")
            else:
                fields.append(f"{f.name}={v!r}")
        return f"{type(self).__name__}({', '.join(fields)})"


def qarray_dataclass(cls):
    """Decorator: make ``cls`` a frozen dataclass and register it as a pytree
    whose children are the non-meta fields."""
    cls = dataclasses.dataclass(frozen=True)(cls)

    data_names = tuple(
        f.name for f in dataclasses.fields(cls) if not f.metadata.get("ao_static")
    )
    meta_names = tuple(
        f.name for f in dataclasses.fields(cls) if f.metadata.get("ao_static")
    )

    def flatten_with_keys(obj):
        children = [
            (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_names
        ]
        aux = tuple(getattr(obj, n) for n in meta_names)
        return children, aux

    def flatten(obj):
        return tuple(getattr(obj, n) for n in data_names), tuple(
            getattr(obj, n) for n in meta_names
        )

    def unflatten(aux, children):
        kwargs = dict(zip(data_names, children))
        kwargs.update(zip(meta_names, aux))
        # object.__new__ + setattr to skip __post_init__ validation on
        # placeholder leaves during tree transforms
        obj = object.__new__(cls)
        for k, v in kwargs.items():
            object.__setattr__(obj, k, v)
        return obj

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)
    _QARRAY_REGISTRY[cls.__name__] = cls
    cls._data_field_names = data_names
    cls._meta_field_names = meta_names

    # jax.export serialization support: aux data (the static meta fields)
    # round-trips through the config codec so exported artifacts holding
    # QuantizedArray inputs serialize (jax/_src/export/serialization.py
    # requires explicit registration for custom pytrees)
    try:
        import json as _json

        from jax import export as _jax_export

        def _ser_aux(aux):
            from ao_tpu.core.config import _encode_value

            return _json.dumps([_encode_value(v) for v in aux]).encode()

        def _deser_aux(blob):
            from ao_tpu.core.config import _decode_value

            return tuple(_decode_value(v) for v in _json.loads(bytes(blob)))

        _jax_export.register_pytree_node_serialization(
            cls,
            serialized_name=f"ao_tpu.{cls.__name__}",
            serialize_auxdata=_ser_aux,
            deserialize_auxdata=_deser_aux,
        )
    except Exception:
        pass  # older jax without export serde registration
    return cls


def get_qarray_class(name: str) -> Type[QuantizedArray]:
    return _QARRAY_REGISTRY[name]


def list_qarray_classes():
    return dict(_QARRAY_REGISTRY)
