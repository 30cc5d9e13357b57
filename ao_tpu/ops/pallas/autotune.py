"""Measured kernel autotuning with a persistent on-disk cache.

(ref analog: the reference's triton `@autotune` meta-parameter search on its
BSR/blockwise-fp8 kernels (kernel/bsr_triton_ops.py, float8/kernels.py) and
`KernelPreference.AUTO` — there the search runs implicitly per shape at
first call; here tuning is EXPLICIT (`autotune_int4(...)`) because a timing
sweep through a remote TPU runtime is too expensive to hide behind the
first matmul. Results persist in a JSON cache keyed by device kind + shape
and are consulted automatically by the kernel's tile picker.)

Usage:
    from ao_tpu.ops.pallas.autotune import autotune_int4
    best = autotune_int4(m=8, k=4096, n=4096, group_size=128)
    # all later int4 matmuls of this shape use the tuned tiles
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, List, Optional, Tuple

_LOCK = threading.Lock()
_CACHE: Optional[Dict[str, List[int]]] = None


def _cache_path() -> str:
    d = os.environ.get(
        "AO_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "ao_tpu"),
    )
    return os.path.join(d, "autotune.json")


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


def _key(kernel: str, m: int, k: int, n: int, g: int) -> str:
    return f"{kernel}:{_device_kind()}:m{m}:k{k}:n{n}:g{g}"


def _load() -> Dict[str, List[int]]:
    global _CACHE
    with _LOCK:
        if _CACHE is None:
            try:
                with open(_cache_path()) as f:
                    _CACHE = json.load(f)
            except (OSError, ValueError):
                _CACHE = {}
        return _CACHE


def _store(key: str, tiles: Tuple[int, int, int]) -> None:
    cache = _load()
    with _LOCK:
        cache[key] = list(tiles)
        path = _cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=0, sort_keys=True)
        os.replace(tmp, path)


def lookup_tuned(kernel: str, m: int, k: int, n: int,
                 g: int) -> Optional[List[int]]:
    """Tuned tiles for this exact shape on this device kind, or None."""
    return _load().get(_key(kernel, m, k, n, g))


def autotune_int4(
    m: int,
    k: int,
    n: int,
    group_size: int = 128,
    iters: int = 3,
    max_candidates: int = 12,
    verbose: bool = False,
) -> Tuple[Tuple[int, int, int], float]:
    """Time every legal tile combo for the int4 fused dequant-GEMM at this
    shape on the current device, persist the winner, and return
    ((tm, tkp, tn), best_us). Later calls at this shape pick up the tuned
    tiles automatically via the kernel's tile picker."""
    import jax
    import jax.numpy as jnp

    from ao_tpu.ops.pallas.int4_matmul import (
        _int4_wo_matmul_impl, _pick_tiles, candidate_tiles,
    )
    from ao_tpu.utils.timing import device_time_us

    kp = k // 2
    g = group_size
    cands = candidate_tiles(m, kp, n, g)
    # always include (and measure) the heuristic choice first
    heur = _pick_tiles(m, kp, n, g)
    cands = [heur] + [c for c in cands if c != heur]
    if len(cands) > max_candidates:
        # keep the heuristic + an even spread of the rest
        rest = cands[1:]
        step = max(1, len(rest) // (max_candidates - 1))
        cands = [cands[0]] + rest[::step][: max_candidates - 1]

    key0 = jax.random.PRNGKey(0)
    x = jax.random.normal(key0, (m, k), jnp.bfloat16)
    packed = jax.random.randint(
        jax.random.fold_in(key0, 1), (kp, n), 0, 255, jnp.int32
    ).astype(jnp.uint8)
    s = jax.random.uniform(jax.random.fold_in(key0, 2), (k // g, n),
                           jnp.float32, 0.001, 0.02)
    b = -8.0 * s

    def mutate(args, i):
        # perturb x between iterations: defeats remote result memoization
        xx = args[0] + jnp.float32(1e-6) * (i + 1)
        return (xx.astype(jnp.bfloat16),) + args[1:]

    best: Tuple[int, int, int] = heur
    best_us = float("inf")
    for tiles in cands:
        try:
            fn = lambda xx, pp, ss, bb: _int4_wo_matmul_impl(
                xx, pp, ss, bb, group_size=g, out_dtype=jnp.bfloat16,
                tiles=tiles,
            )
            us = device_time_us(fn, x, packed, s, b, iters=iters,
                                mutate=mutate)
        except Exception as e:  # Mosaic rejects some combos at compile
            if verbose:
                print(f"  tiles {tiles}: failed ({type(e).__name__})")
            continue
        if verbose:
            print(f"  tiles {tiles}: {us:.1f} us")
        if us < best_us:
            best, best_us = tiles, us

    _store(_key("int4_wo_matmul", m, k, n, g), best)
    return best, best_us
