"""TPU roofline model: expected kernel times and quantization speedups.

(ref: torchao/testing/training/roofline_utils.py and the expected-speedup
methodology in docs/source/workflows/inference.md:100-132 — predicted
speedup of a quantized GEMM = roofline(bf16) / roofline(quant), where
roofline = max(compute_time, memory_time). TPU re-design: per-generation
peak-FLOPs/HBM tables replace the NVIDIA specs; int8 gets the 2x MXU
throughput where the generation supports it.)

All numbers are public (cloud.google.com/tpu/docs/system-architecture).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class TPUSpec:
    name: str
    bf16_tflops: float  # peak dense bf16 matmul TFLOP/s per chip
    int8_tops: float  # peak int8 TOP/s (== bf16 if no native int8 mma)
    hbm_gbps: float  # HBM bandwidth GB/s per chip
    hbm_gib: float  # HBM capacity GiB
    ici_gbps: float  # per-link ICI bandwidth GB/s (one direction)


TPU_SPECS = {
    "v4": TPUSpec("v4", 275.0, 275.0, 1228.0, 32.0, 50.0),
    "v5e": TPUSpec("v5e", 197.0, 394.0, 819.0, 16.0, 50.0),
    "v5p": TPUSpec("v5p", 459.0, 918.0, 2765.0, 95.0, 100.0),
    "v6e": TPUSpec("v6e", 918.0, 1836.0, 1640.0, 32.0, 100.0),
}


def detect_tpu_spec(default: str = "v5e") -> TPUSpec:
    try:
        kind = jax.devices()[0].device_kind.lower()
        for key in TPU_SPECS:
            if key in kind:
                return TPU_SPECS[key]
        if "lite" in kind and "v5" in kind:
            return TPU_SPECS["v5e"]
    except Exception:
        pass
    return TPU_SPECS[default]


def gemm_roofline_us(
    m: int,
    k: int,
    n: int,
    weight_bits: int = 16,
    act_bits: int = 16,
    out_bits: int = 16,
    spec: Optional[TPUSpec] = None,
    int_compute: bool = False,
) -> dict:
    """Roofline time (µs) for y[m,n] = x[m,k] @ w[k,n].

    Returns {compute_us, memory_us, roofline_us, bound}. Scales/zeros are
    ignored (<1% of bytes at practical group sizes).
    """
    spec = spec or detect_tpu_spec()
    flops = 2.0 * m * k * n
    peak = (spec.int8_tops if int_compute else spec.bf16_tflops) * 1e12
    compute_us = flops / peak * 1e6
    bytes_ = (m * k * act_bits + k * n * weight_bits + m * n * out_bits) / 8.0
    memory_us = bytes_ / (spec.hbm_gbps * 1e9) * 1e6
    roof = max(compute_us, memory_us)
    return {
        "compute_us": compute_us,
        "memory_us": memory_us,
        "roofline_us": roof,
        "bound": "compute" if compute_us >= memory_us else "memory",
    }


def expected_quant_speedup(
    m: int,
    k: int,
    n: int,
    weight_bits: int,
    act_bits: int = 16,
    spec: Optional[TPUSpec] = None,
) -> float:
    """Predicted speedup of a quantized GEMM over bf16 at the roofline
    (ref methodology: inference.md:100-132). Decode (small m) is memory
    bound → speedup ≈ 16/weight_bits; prefill is compute bound → speedup
    comes only from faster math (int8/fp8 2x where supported)."""
    spec = spec or detect_tpu_spec()
    base = gemm_roofline_us(m, k, n, 16, 16, spec=spec)
    q = gemm_roofline_us(
        m, k, n, weight_bits, act_bits, spec=spec,
        int_compute=(act_bits <= 8 and weight_bits <= 8),
    )
    return base["roofline_us"] / q["roofline_us"]


def pct_speed_of_light(
    measured_us: float, m: int, k: int, n: int, **kw
) -> float:
    """measured vs roofline, as a fraction in (0, 1]."""
    roof = gemm_roofline_us(m, k, n, **kw)["roofline_us"]
    return roof / max(measured_us, 1e-9)
