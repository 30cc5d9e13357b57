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
