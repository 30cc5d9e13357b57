"""Device-time measurement utilities.

Wall-clock timing through the axon TPU tunnel is unreliable (per-call HTTP
round-trips, result memoization), so benchmarks measure *device busy time*
from the jax profiler's xplane trace instead.
(ref analog: torchao's benchmark_model CUDA-event timing, torchao/utils.py:74.)
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Callable

import jax


def device_time_us(fn: Callable, *args, iters: int = 3, warmup: int = 1,
                   mutate=None) -> float:
    """Run ``fn(*args)`` under the profiler and return device busy time per
    iteration (us). ``mutate`` optionally perturbs args between iterations
    to defeat remote-result memoization."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    tmp = tempfile.mkdtemp(prefix="aotpu_prof_")
    with jax.profiler.trace(tmp):
        outs = []
        for i in range(iters):
            if mutate is not None:
                args = mutate(args, i)
            outs.append(fn(*args))
        jax.block_until_ready(outs)

    files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    from xprof.convert import raw_to_tool_data as rtd

    # op_profile busy time (total minus IDLE). framework_op_stats
    # double-counts `while` loop self time against its body's ops, which
    # inflated scan-based decode measurements ~2x.
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    prof = json.loads(data)
    root = prof.get("byProgram", prof)
    busy_ps = 0.0
    for prog in root.get("children", []):
        if prog.get("name") == "IDLE":
            continue
        busy_ps += float(prog.get("metrics", {}).get("rawTime", 0) or 0)
    return busy_ps / 1e6 / iters  # ps → us


def device_op_breakdown(fn: Callable, *args, iters: int = 3, warmup: int = 1,
                        top: int = 20):
    """Per-op device-time breakdown of ``fn(*args)``: list of
    ``{"op", "us", "pct"}`` rows, largest first (us is per-iteration).

    The where-does-the-time-go companion to :func:`device_time_us`
    (ref analog: torchao's ``profiler_runner``, torchao/utils.py:145)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    tmp = tempfile.mkdtemp(prefix="aotpu_prof_")
    with jax.profiler.trace(tmp):
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)

    files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    prof = json.loads(data)
    root = prof.get("byProgram", prof)

    rows = {}

    def walk(node):
        kids = node.get("children") or []
        if not kids:  # leaf op
            ps = float(node.get("metrics", {}).get("rawTime", 0) or 0)
            if ps > 0 and node.get("name") != "IDLE":
                rows[node.get("name", "?")] = (
                    rows.get(node.get("name", "?"), 0.0) + ps)
            return
        for c in kids:
            if c.get("name") == "IDLE":
                continue
            walk(c)

    for prog in root.get("children", []):
        if prog.get("name") == "IDLE":
            continue
        walk(prog)

    total = sum(rows.values()) or 1.0
    out_rows = [
        {"op": k, "us": round(v / 1e6 / iters, 2),
         "pct": round(100.0 * v / total, 1)}
        for k, v in sorted(rows.items(), key=lambda kv: -kv[1])[:top]
    ]
    return out_rows
