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
from typing import Callable, Tuple

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

    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    rows = json.loads(data)[0]["rows"]
    total = 0.0
    for r in rows:
        c = [v["v"] for v in r["c"]]
        if c[1] == "Device" and c[2] != "IDLE":
            total += float(c[5])  # total self time us
    return total / iters
