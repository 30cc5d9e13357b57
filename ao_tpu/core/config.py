"""Config base class + versioned JSON serialization.

TPU-native analog of the reference config core
(ref: torchao/core/config.py — AOBaseConfig:27, config_to_dict:174,
config_from_dict:205, ALLOWED_AO_MODULES allow-list:191).

All workflow configs are plain dataclasses deriving from :class:`AOBaseConfig`.
Serialization encodes dataclasses/enums/dtypes/granularities into a versioned
JSON dict; deserialization only instantiates classes from registered modules
(an allow-list) to avoid arbitrary code execution from untrusted checkpoints.
"""

from __future__ import annotations

import dataclasses
import enum
import importlib
import json
import warnings
from typing import Any, Dict, Set

import jax.numpy as jnp

_CONFIG_FORMAT_VERSION = 1

# Modules whose classes may be reconstructed during deserialization.
ALLOWED_AO_MODULES: Set[str] = {
    "ao_tpu.core.config",
    "ao_tpu.quantization.configs",
    "ao_tpu.quantization.granularity",
    "ao_tpu.quantization.primitives",
    "ao_tpu.training.qat",
    "ao_tpu.training.optim",
    "ao_tpu.sparsity.configs",
    "ao_tpu.algorithms.gptq",
    "ao_tpu.algorithms.awq",
    "ao_tpu.algorithms.smoothquant",
    "ao_tpu.algorithms.sinq",
    "ao_tpu.algorithms.static_quant",
    "ao_tpu.integrations.gguf",
    "ao_tpu.quantization.qarrays.common",
    "ao_tpu.algorithms.codebook",
    "ao_tpu.training.float8",
    "ao_tpu.prototype.mx",
}


class AOBaseConfig:
    """Base class for all workflow configs. Subclasses set ``version`` as a
    class attribute; bumping it signals a BC break in serialized form."""

    version: int = 1


def _encode_value(v: Any) -> Any:
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, enum.Enum):
        return {
            "_type": type(v).__name__,
            "_module": type(v).__module__,
            "_kind": "enum",
            "_data": v.name,
        }
    if isinstance(v, jnp.dtype) or (isinstance(v, type) and issubclass(v, jnp.generic)):
        return {"_kind": "dtype", "_data": jnp.dtype(v).name}
    # NB: the jnp.dtype() probe must come after the dataclass branch —
    # np.dtype(obj) consults obj.dtype, so any dataclass with a `dtype`
    # field would otherwise round-trip as a bare dtype
    if not dataclasses.is_dataclass(v):
        try:
            dt = jnp.dtype(v)
            if not isinstance(v, (list, tuple, dict)):
                return {"_kind": "dtype", "_data": dt.name}
        except TypeError:
            pass
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        data = {
            f.name: _encode_value(getattr(v, f.name)) for f in dataclasses.fields(v)
        }
        out = {
            "_type": type(v).__name__,
            "_module": type(v).__module__,
            "_kind": "dataclass",
            "_data": data,
        }
        if isinstance(v, AOBaseConfig):
            out["_version"] = v.version
        return out
    if isinstance(v, (list, tuple)):
        return {"_kind": "list", "_data": [_encode_value(x) for x in v]}
    if isinstance(v, dict):
        return {"_kind": "dict", "_data": {str(k): _encode_value(x) for k, x in v.items()}}
    raise TypeError(f"cannot serialize config value of type {type(v)}: {v!r}")


def _resolve_class(module: str, name: str):
    if module not in ALLOWED_AO_MODULES:
        raise ValueError(
            f"refusing to deserialize class {name} from non-allow-listed module "
            f"{module}; add it to ao_tpu.core.config.ALLOWED_AO_MODULES"
        )
    mod = importlib.import_module(module)
    return getattr(mod, name)


def _decode_value(v: Any) -> Any:
    if not isinstance(v, dict) or "_kind" not in v:
        return v
    kind = v["_kind"]
    if kind == "enum":
        cls = _resolve_class(v["_module"], v["_type"])
        return cls[v["_data"]]
    if kind == "dtype":
        return jnp.dtype(v["_data"])
    if kind == "list":
        return tuple(_decode_value(x) for x in v["_data"])
    if kind == "dict":
        return {k: _decode_value(x) for k, x in v["_data"].items()}
    if kind == "dataclass":
        cls = _resolve_class(v["_module"], v["_type"])
        kwargs = {k: _decode_value(x) for k, x in v["_data"].items()}
        obj = cls(**kwargs)
        stored = v.get("_version")
        if stored is not None and isinstance(obj, AOBaseConfig) and stored != obj.version:
            warnings.warn(
                f"config {cls.__name__} was serialized with version {stored} but "
                f"the current class version is {obj.version}"
            )
        return obj
    raise ValueError(f"unknown serde kind {kind}")


def config_to_dict(config: AOBaseConfig) -> Dict[str, Any]:
    """(ref: config_to_dict torchao/core/config.py:174)"""
    if not isinstance(config, AOBaseConfig):
        raise TypeError("expected an AOBaseConfig")
    return {
        "_format_version": _CONFIG_FORMAT_VERSION,
        "config": _encode_value(config),
    }


def config_from_dict(d: Dict[str, Any]) -> AOBaseConfig:
    """(ref: config_from_dict torchao/core/config.py:205)"""
    if d.get("_format_version") != _CONFIG_FORMAT_VERSION:
        raise ValueError(f"unsupported config format version {d.get('_format_version')}")
    obj = _decode_value(d["config"])
    if not isinstance(obj, AOBaseConfig):
        raise TypeError("deserialized object is not an AOBaseConfig")
    return obj


def config_to_json(config: AOBaseConfig) -> str:
    return json.dumps(config_to_dict(config))


def config_from_json(s: str) -> AOBaseConfig:
    return config_from_dict(json.loads(s))
