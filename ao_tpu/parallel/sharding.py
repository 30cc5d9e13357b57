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


# ---------------------------------------------------------------------------
# Sharding rules: ordered (regex -> kind) table, FqnToConfig-style.
#
# A rule's regex is matched (re.search) against the leaf's fqn with any
# QuantizedArray field suffix stripped; the first hit wins. Kinds:
#   "col"       — column parallel: shard the output dim (-1) over tp
#   "row"       — row parallel: shard the input dim (-2) over tp
#   "replicate" — explicitly replicate (suppresses the unmatched warning)
# or a concrete PartitionSpec to use verbatim.
#
# Any ≥2-D leaf that matches NO rule is replicated WITH a warning (raise
# under strict=True): a renamed parameter must never silently stop sharding
# (ref contract: torchao testing/utils.py:370-467 TP test harness).
# ---------------------------------------------------------------------------

ShardingRules = Sequence[Tuple[str, Any]]

# Built-in rule set covering the in-repo model families (llama / gemma /
# MoE-llama expert stacks / ViT) plus common HF-style names.
DEFAULT_TP_RULES: ShardingRules = (
    # attention + MLP expansions: shard the output dim
    (r"(^|\.)(wq|wk|wv|w1|w3|up|gate|qkv|fc1|in_proj|query|key|value)$",
     "col"),
    # projections back to the model dim: shard the input dim
    (r"(^|\.)(wo|w2|down|proj|fc2|out_proj|o_proj|down_proj)$", "row"),
    # HF llama-style names
    (r"(^|\.)(q_proj|k_proj|v_proj|gate_proj|up_proj)$", "col"),
    # embedding tables: shard the VOCAB axis (Megatron-style
    # VocabParallelEmbedding — GSPMD lowers the lookup to a masked local
    # gather + one all-reduce) so the residual stream stays tp-REPLICATED.
    # Dim-sharding the table instead makes every layer re-all-gather the
    # normed activation for each of q/k/v/w1/w3: measured 3.2x the
    # collective bytes and 5 extra collectives per layer on the compiled
    # HLO (see parallel/hlo_stats.py + dryrun collective check).
    (r"(^|\.)embed$", "row"),
    # output heads / patch+pos embeds: shard the model/output dim
    # (vocab-parallel logits for lm_head)
    (r"(^|\.)(lm_head|head|patch_embed|pos_embed)$", "col"),
    # conv patchify weights (HWIO): shard output channels
    (r"(^|\.)patch_embed\.kernel$", "col"),
    # MoE router + norms + biases are tiny: replicate silently
    (r"(^|\.)(router|gate_w)$", "replicate"),
    (r"(^|\.)(ln\d*|norm\w*|.*_norm|bias|b)$", "replicate"),
)

_QARRAY_FIELDS = ("qdata", "scale", "zero_point", "act_pre_scale",
                  "act_scale", "act_zero_point", "per_tensor_scale",
                  "act_per_tensor_scale", "weight")


def _match_rule(name: str, rules: ShardingRules):
    import re

    for pattern, kind in rules:
        if re.search(pattern, name):
            return kind
    return None


def _leaf_pspec(fqn: str, leaf: Any, tp_axis: str, fsdp_axis: Optional[str],
                rules: ShardingRules = DEFAULT_TP_RULES,
                strict: bool = False, _warned: Optional[set] = None):
    parts = fqn.split(".")
    # QuantizedArray fields appear as the last path component
    field = None
    name = fqn
    if parts[-1] in _QARRAY_FIELDS:
        field = parts[-1]
        name = ".".join(parts[:-1]) if len(parts) >= 2 else fqn

    ndim = getattr(leaf, "ndim", 0)
    if ndim < 2:
        return P()
    if field in ("act_pre_scale", "act_scale", "act_zero_point",
                 "per_tensor_scale", "act_per_tensor_scale"):
        return P()  # tiny, replicate

    kind = _match_rule(name, rules)
    if kind is None:
        msg = (
            f"sharding rules matched nothing for ≥2-D leaf '{fqn}' "
            f"(shape {getattr(leaf, 'shape', '?')}); it will be REPLICATED "
            f"on the tp mesh. Add a rule (regex -> 'col'/'row'/'replicate'/"
            f"PartitionSpec) or rename the parameter."
        )
        if strict:
            raise ValueError(msg)
        import warnings

        if _warned is None or name not in _warned:
            warnings.warn(msg)
            if _warned is not None:
                _warned.add(name)
        return P()
    if isinstance(kind, P):
        return kind
    if kind == "replicate":
        return P()
    if kind == "col":
        # (K, N) shard N; qdata (K/2, N) and scale (K/g, N) shard dim -1 too
        spec = [None] * ndim
        spec[-1] = tp_axis
        if fsdp_axis and ndim >= 2:
            spec[-2] = fsdp_axis
        return P(*spec)
    if kind == "row":
        spec = [None] * ndim
        spec[-2] = tp_axis
        if fsdp_axis:
            spec[-1] = fsdp_axis
        return P(*spec)
    raise ValueError(f"unknown sharding rule kind {kind!r} for '{fqn}'")


def param_pspecs(params: Any, tp_axis: str = "tp",
                 fsdp_axis: Optional[str] = None,
                 rules: ShardingRules = DEFAULT_TP_RULES,
                 strict: bool = False) -> Any:
    """PartitionSpec pytree matching ``params`` leaf-for-leaf (QuantizedArray
    leaves get per-field specs so qdata and scales shard together).

    ``rules`` is an ordered (regex -> kind) table — see DEFAULT_TP_RULES.
    User rules are consulted FIRST, then the defaults; pass strict=True to
    raise instead of warn on unmatched ≥2-D leaves."""
    if rules is not DEFAULT_TP_RULES:
        rules = tuple(rules) + tuple(DEFAULT_TP_RULES)
    warned: set = set()

    def spec(path, leaf):
        return _leaf_pspec(path_to_fqn(path), leaf, tp_axis, fsdp_axis,
                           rules, strict, warned)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params: Any, mesh: Mesh, tp_axis: str = "tp",
                 fsdp_axis: Optional[str] = None,
                 rules: ShardingRules = DEFAULT_TP_RULES,
                 strict: bool = False) -> Any:
    """Device-put params with tensor-parallel NamedShardings. Validates that
    quantization-group boundaries align with the K-shard boundaries."""
    if rules is not DEFAULT_TP_RULES:
        rules = tuple(rules) + tuple(DEFAULT_TP_RULES)
    tp = mesh.shape[tp_axis]

    def check(path, leaf):
        if not isinstance(leaf, QuantizedArray):
            return leaf
        bs = getattr(leaf, "block_size", None)
        if bs and len(bs) >= 2:
            fqn = path_to_fqn(path)
            # only K-sharded ("row") leaves need group-aligned shard
            # boundaries; replicated / col-sharded leaves keep K whole
            if _match_rule(fqn, rules) != "row":
                return leaf
            g = bs[-2]
            k = leaf.shape[-2]
            if (k // g) % tp != 0 and k % (g * tp) != 0:
                raise ValueError(
                    f"{fqn}: K={k} with group={g} cannot shard onto tp={tp} "
                    f"at group-aligned boundaries"
                )
            # magic int4 layouts interleave groups per word block (4 for
            # "magic", a pair for "magic8"): a row-parallel K shard must
            # hold whole blocks, else repack to the split-half layout
            # (slower kernel, same numerics)
            layout = getattr(leaf, "layout", None)
            blocked = {"magic": 4, "magic8": 2}.get(layout)
            if blocked is not None and (k // g) % (blocked * tp) != 0:
                if not hasattr(leaf, "to_layout"):
                    raise ValueError(
                        f"{fqn}: {type(leaf).__name__} with layout "
                        f"'{layout}' cannot K-shard onto tp={tp} and has "
                        "no to_layout repack — quantize with a shard-"
                        "aligned group count or add to_layout"
                    )
                import warnings

                warnings.warn(
                    f"{fqn}: {layout} int4 layout cannot K-shard onto "
                    f"tp={tp} (K={k}, g={g}); repacking to split-half layout"
                )
                return leaf.to_layout("halves")
        return leaf

    params = jax.tree_util.tree_map_with_path(
        check, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
    # specs AFTER the repack pass: repacking changes qdata's packed shape
    # and the container's static layout, so the spec tree must match the
    # repacked tree leaf-for-leaf (rules already has the defaults appended;
    # param_pspecs appending them again is harmless — first match wins)
    specs = param_pspecs(params, tp_axis, fsdp_axis, rules, strict)

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params, specs)
