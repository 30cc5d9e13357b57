"""Collective-structure extraction from compiled (SPMD-partitioned) HLO.

The scaling projection (benchmarks/scaling_projection.py) models multi-chip
efficiency from per-layer collective wire bytes. To keep that model honest
it must be anchored to what the compiler actually emitted — not to its own
closed-form guess. This module parses the post-partitioning HLO text of a
jitted step and totals the collective ops and their payload bytes; the
dryrun (``__graft_entry__.dryrun_multichip``) asserts the analytic formula
against these numbers and records them for the projection to consume.

(ref analog: the reference has no such check — its comm structure is
implicit in DTensor placements; on TPU the compiled HLO is the single
source of truth for what travels over ICI, so we assert on it.)
"""

from __future__ import annotations

import re
from typing import Dict, List

# shapes like "bf16[2,16,256]{2,1,0}" possibly inside a tuple
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)
# "%x = <shape-or-tuple> <op>(" — capture everything between '=' and the op
_OP_RE = re.compile(
    r"=\s+(.*?)\s+(" + "|".join(_COLLECTIVES) + r")(?:-start)?\("
)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "f16": 2, "bf16": 2, "f32": 4, "f64": 8,
    "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3": 1, "e4m3": 1, "e5m2": 1,
}


def _shape_bytes(shape_text: str) -> int:
    """Total bytes of all array shapes in a shape/tuple string."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue  # layout annotations etc.
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def parse_collectives(hlo_text: str) -> List[Dict]:
    """One record per collective instruction: {op, bytes, by_dtype}."""
    out = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        shape_text, op = m.group(1), m.group(2)
        # ignore the paired "-done" ops (shape repeats the -start's)
        if f"{op}-done" in line:
            continue
        by_dtype: Dict[str, int] = {}
        for dtype, dims in _SHAPE_RE.findall(shape_text):
            if dtype not in _DTYPE_BYTES:
                continue
            n = 1
            if dims:
                for d in dims.split(","):
                    n *= int(d)
            by_dtype[dtype] = by_dtype.get(dtype, 0) + n * _DTYPE_BYTES[dtype]
        out.append({"op": op, "bytes": sum(by_dtype.values()),
                    "by_dtype": by_dtype})
    return out


def collective_summary(hlo_text: str) -> Dict[str, Dict]:
    """{op_kind: {count, bytes, by_dtype}} over the whole module —
    per-device (the partitioned module is per-participant), per step.
    ``by_dtype`` exposes the wire element types so anchors can assert the
    payload format (bf16/f8 vs promotion-widened f32)."""
    summary: Dict[str, Dict] = {}
    for rec in parse_collectives(hlo_text):
        s = summary.setdefault(rec["op"],
                               {"count": 0, "bytes": 0, "by_dtype": {}})
        s["count"] += 1
        s["bytes"] += rec["bytes"]
        for dt, b in rec["by_dtype"].items():
            s["by_dtype"][dt] = s["by_dtype"].get(dt, 0) + b
    return summary
