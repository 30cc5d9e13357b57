"""Public benchmarking + profiling helpers.

(ref analog: torchao/utils.py:74 ``benchmark_model`` (device-event timing)
and :145 ``profiler_runner`` (torch.profiler → chrome trace). TPU versions:
device busy time comes from the jax profiler's xplane (utils/timing.py) and
traces are written in TensorBoard/xprof format.)
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence

import jax

from ao_tpu.utils.timing import device_time_us

__all__ = ["benchmark_model", "profiler_runner", "memory_footprint"]


def benchmark_model(
    fn: Callable,
    args: Sequence[Any] = (),
    iters: int = 3,
    warmup: int = 1,
    mutate: Optional[Callable] = None,
) -> Dict[str, float]:
    """Time a jitted callable on the current device.

    Returns {"device_us": per-iteration device busy time, "wall_us":
    per-iteration wall time} — on TPU prefer device_us (wall time through a
    remote runtime includes host/transfer overhead). ``mutate(args, i)`` can
    perturb the inputs between iterations to defeat result caching.
    """
    import time

    t0 = time.perf_counter()
    dev_us = device_time_us(fn, *args, iters=iters, warmup=warmup,
                            mutate=mutate)
    wall_us = (time.perf_counter() - t0) / max(iters, 1) * 1e6
    return {"device_us": dev_us, "wall_us": wall_us}


def profiler_runner(path: Optional[str], fn: Callable, *args, **kwargs):
    """Run ``fn`` under the jax profiler, write an xprof/TensorBoard trace
    to ``path`` (default: ./ao_tpu_trace), and return fn's result.

    View with `tensorboard --logdir <path>` or xprof.
    """
    path = path or os.path.join(os.getcwd(), "ao_tpu_trace")
    with jax.profiler.trace(path):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out


def memory_footprint(params: Any) -> Dict[str, float]:
    """Bytes held by a params pytree, split into quantized payloads, scales/
    metadata arrays, and plain high-precision leaves. The quantized-vs-hp
    ratio is the checkpoint/HBM saving the workflow configs buy.

    (ref analog: the reference's README memory-reduction claims and
    `get_model_size_in_bytes`, torchao/utils.py:189.)
    """
    from ao_tpu.quantization.qarrays.base import QuantizedArray

    tot = {"quantized_bytes": 0.0, "scale_bytes": 0.0, "hp_bytes": 0.0}

    def visit(leaf):
        if isinstance(leaf, QuantizedArray):
            for name, v in leaf.data_fields().items():
                if v is None or not hasattr(v, "nbytes"):
                    continue
                if name in ("qdata", "codes", "values", "blocks"):
                    tot["quantized_bytes"] += v.nbytes
                else:
                    tot["scale_bytes"] += v.nbytes
        elif hasattr(leaf, "nbytes"):
            tot["hp_bytes"] += leaf.nbytes
        return leaf

    jax.tree_util.tree_map(
        visit, params, is_leaf=lambda x: isinstance(x, QuantizedArray)
    )
    tot["total_bytes"] = sum(tot.values())
    return tot
