"""Op dispatch: function-granularity analog of the reference's op tables.

(ref: torchao/utils.py:411,659 ``_implements``/``_dispatch__torch_function__``
— here dispatch keys on the QuantizedArray subclass at the ``ao_tpu.ops``
entry points instead of intercepting aten ops.)
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple, Type

_IMPLS: Dict[Tuple[str, type], Callable] = {}


def implements(op_name: str, qarray_cls: type):
    def deco(fn):
        _IMPLS[(op_name, qarray_cls)] = fn
        return fn

    return deco


def lookup(op_name: str, qarray_cls: type) -> Callable:
    for cls in qarray_cls.__mro__:
        impl = _IMPLS.get((op_name, cls))
        if impl is not None:
            return impl
    raise NotImplementedError(
        f"no {op_name!r} implementation for {qarray_cls.__name__}"
    )


def has_impl(op_name: str, qarray_cls: type) -> bool:
    return any((op_name, cls) in _IMPLS for cls in qarray_cls.__mro__)
