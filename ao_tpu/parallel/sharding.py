"""Mesh construction + sharding rules for (quantized) model pytrees.

(ref analog: torchao's L8 distributed composition — DTensor/FSDP2 per-op
overrides, float8_tensor_parallel.py:42, fsdp_utils.py:139. On TPU none of
the per-op slice/cat/copy_ machinery is needed: QuantizedArrays are pytrees,
so `jax.sharding.NamedSharding` on the *leaves* shards qdata/scales together
and pjit inserts the collectives. The only real constraint is that K-axis
(row-parallel) shard boundaries stay aligned with quantization groups and
the packed-byte layout — guaranteed by the group-local packing, checked
here.)

Axes convention:
  * "dp"   — data parallel (batch)
  * "fsdp" — parameter sharding (ZeRO-style), optional
  * "tp"   — tensor parallel (ICI)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ao_tpu.quantization.qarrays.base import QuantizedArray
from ao_tpu.quantization.quantize import path_to_fqn


def make_mesh(
    shape: Sequence[int], axis_names: Sequence[str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def make_hybrid_mesh(
    ici_shape: Sequence[int],
    dcn_shape: Sequence[int] = (1,),
    ici_axes: Sequence[str] = ("tp",),
    dcn_axes: Sequence[str] = ("dp",),
) -> Mesh:
    """Multi-slice mesh: outer axes ride DCN (between hosts/slices), inner
    axes ride ICI. Lay shardings so high-volume collectives (tp all-gather,
    ep all-to-all) stay on inner ICI axes and only gradient/dp reductions
    cross DCN (SURVEY §5 comm-backend note; scaling-book recipe).

    Uses `mesh_utils.create_hybrid_device_mesh` when >1 slice is present,
    plain `create_device_mesh` otherwise.
    """
    from jax.experimental import mesh_utils

    n_dcn = int(np.prod(dcn_shape))
    if n_dcn > 1:
        try:
            arr = mesh_utils.create_hybrid_device_mesh(
                tuple(ici_shape), tuple(dcn_shape)
            )
        except ValueError:
            # no slice topology metadata (CPU / single-slice emulation):
            # plain reshape keeps the axis semantics for testing
            arr = np.asarray(
                jax.devices()[: n_dcn * int(np.prod(ici_shape))]
            ).reshape(tuple(dcn_shape) + tuple(ici_shape))
    else:
        arr = mesh_utils.create_device_mesh(
            tuple(dcn_shape) + tuple(ici_shape)
        )
    return Mesh(arr, tuple(dcn_axes) + tuple(ici_axes))


# Column-parallel (shard output dim N) vs row-parallel (shard input dim K)
_COL_PARALLEL = {"wq", "wk", "wv", "w1", "w3", "up", "gate", "qkv"}
_ROW_PARALLEL = {"wo", "w2", "down", "proj"}


def _leaf_pspec(fqn: str, leaf: Any, tp_axis: str, fsdp_axis: Optional[str]):
    parts = fqn.split(".")
    # QuantizedArray fields appear as the last path component
    field = None
    name = parts[-1]
    if name in ("qdata", "scale", "zero_point", "act_pre_scale", "act_scale",
                "act_zero_point"):
        field = name
        name = parts[-2] if len(parts) >= 2 else name

    ndim = getattr(leaf, "ndim", 0)
    if ndim < 2:
        return P()
    if field in ("act_pre_scale", "act_scale", "act_zero_point"):
        return P()  # tiny, replicate

    if name in _COL_PARALLEL:
        # (K, N) shard N; qdata (K/2, N) and scale (K/g, N) shard dim -1 too
        spec = [None] * ndim
        spec[-1] = tp_axis
        if fsdp_axis and ndim >= 2:
            spec[-2] = fsdp_axis
        return P(*spec)
    if name in _ROW_PARALLEL:
        spec = [None] * ndim
        spec[-2] = tp_axis
        if fsdp_axis:
            spec[-1] = fsdp_axis
        return P(*spec)
    if name == "embed":
        spec = [None] * ndim
        spec[-1] = tp_axis  # shard model dim; vocab gather stays local
        return P(*spec)
    if name == "lm_head":
        spec = [None] * ndim
        spec[-1] = tp_axis
        return P(*spec)
    return P()


def param_pspecs(params: Any, tp_axis: str = "tp",
                 fsdp_axis: Optional[str] = None) -> Any:
    """PartitionSpec pytree matching ``params`` leaf-for-leaf (QuantizedArray
    leaves get per-field specs so qdata and scales shard together)."""

    def spec(path, leaf):
        return _leaf_pspec(path_to_fqn(path), leaf, tp_axis, fsdp_axis)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params: Any, mesh: Mesh, tp_axis: str = "tp",
                 fsdp_axis: Optional[str] = None) -> Any:
    """Device-put params with tensor-parallel NamedShardings. Validates that
    quantization-group boundaries align with the K-shard boundaries."""
    specs = param_pspecs(params, tp_axis, fsdp_axis)
    tp = mesh.shape[tp_axis]

    def check(path, leaf):
        if not isinstance(leaf, QuantizedArray):
            return leaf
        bs = getattr(leaf, "block_size", None)
        if bs and len(bs) >= 2:
            g = bs[-2]
            k = leaf.shape[-2]
            if (k // g) % tp != 0 and k % (g * tp) != 0:
                fqn = path_to_fqn(path)
                raise ValueError(
                    f"{fqn}: K={k} with group={g} cannot shard onto tp={tp} "
                    f"at group-aligned boundaries"
                )
            # magic int4 layout interleaves 4 groups per word block: a
            # row-parallel K shard must hold whole 4-group blocks, else
            # repack to the split-half layout (slower kernel, same numerics)
            fqn = path_to_fqn(path)
            name = fqn.split(".")[-1]
            if (
                getattr(leaf, "layout", None) == "magic"
                and name in _ROW_PARALLEL
                and (k // g) % (4 * tp) != 0
            ):
                import warnings

                warnings.warn(
                    f"{fqn}: magic int4 layout cannot K-shard onto tp={tp} "
                    f"(K={k}, g={g}); repacking to split-half layout"
                )
                return leaf.to_layout("halves")
        return leaf

    params = jax.tree_util.tree_map_with_path(
        check, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params, specs)
