"""Mixed-precision search: per-layer bit-width sensitivity analysis and
greedy config assignment.

(ref: torchao/prototype/quantization/mixed_precision/ — per-layer
sensitivity scripts. TPU re-design: the search is a pure function — for
each candidate layer it swaps ONE leaf for its quantized form, reruns the
jitted model, and scores output SQNR; the greedy assignment then spends a
bits-per-weight budget where sensitivity is lowest.)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.quantization.configs import FqnToConfig
from ao_tpu.quantization.primitives import compute_error
from ao_tpu.quantization.quantize import default_filter, path_to_fqn, quantize_


def _weight_fqns(params: Any, filter_fn) -> List[str]:
    fqns = []

    def visit(path, leaf):
        fqn = path_to_fqn(path)
        if filter_fn(fqn, leaf):
            fqns.append(fqn)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return fqns


def sensitivity_search(
    params: Any,
    run_fn: Callable[[Any], jax.Array],
    configs: Dict[str, AOBaseConfig],
    filter_fn: Optional[Callable[[str, Any], bool]] = None,
) -> Dict[str, Dict[str, float]]:
    """Returns {layer_fqn: {config_name: output SQNR dB vs hp}}.

    ``configs`` maps a short name (e.g. "int4_g32") to a config instance;
    ``run_fn(params)`` returns the model output to score (e.g. logits on a
    calibration batch).
    """
    filter_fn = filter_fn or default_filter
    ref = run_fn(params)
    fqns = _weight_fqns(params, filter_fn)
    table: Dict[str, Dict[str, float]] = {}
    for fqn in fqns:
        row = {}
        for name, cfg in configs.items():
            qp = quantize_(params, cfg, filter_fn=lambda f, l, fqn=fqn: f == fqn)
            out = run_fn(qp)
            row[name] = float(compute_error(ref, out))
        table[fqn] = row
    return table


def assign_greedy(
    table: Dict[str, Dict[str, float]],
    configs: Dict[str, AOBaseConfig],
    config_bits: Dict[str, float],
    budget_bits_per_weight: float,
    weight_sizes: Optional[Dict[str, int]] = None,
) -> FqnToConfig:
    """Greedy mixed-precision assignment: start everything at the smallest
    config; repeatedly upgrade the layer with the worst SQNR to its next
    larger config while the average bits/weight stays within budget.

    Returns an FqnToConfig routing ready for ``quantize_``.
    """
    names_by_bits = sorted(config_bits, key=config_bits.get)
    sizes = weight_sizes or {f: 1 for f in table}
    total = sum(sizes.values())
    assign = {f: names_by_bits[0] for f in table}

    def avg_bits():
        return sum(config_bits[assign[f]] * sizes[f] for f in table) / total

    while True:
        # worst layer that can still upgrade
        cands = [
            f for f in table
            if names_by_bits.index(assign[f]) + 1 < len(names_by_bits)
        ]
        if not cands:
            break
        worst = min(cands, key=lambda f: table[f][assign[f]])
        nxt = names_by_bits[names_by_bits.index(assign[worst]) + 1]
        old = assign[worst]
        assign[worst] = nxt
        if avg_bits() > budget_bits_per_weight:
            assign[worst] = old
            break
    return FqnToConfig(fqn_to_config={f: configs[n] for f, n in assign.items()})
