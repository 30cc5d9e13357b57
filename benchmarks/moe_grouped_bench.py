"""MoE grouped-GEMM decode benchmarks: fused int4 expert stacks vs the
dequant+ragged path vs bf16 ragged_dot.

Run on a real TPU: ``python benchmarks/moe_grouped_bench.py [T]``. Prints
one JSON line per (scheme, shape). The fused kernels
(ops/pallas/grouped_matmul.py) read the packed nibbles straight from HBM;
the roofline for the masked dense-per-expert design is

    max(weight-stream DMA, E*T*K*N MXU time)

so %SoL is reported against that (not the pure ragged roofline, which no
int4 path can reach without a gather kernel).

(ref analog: torchao moe benchmarks, benchmarks/prototype/moe_training —
the reference keeps MoE weights in fp8 via _scaled_grouped_mm; it has no
int4 grouped kernel.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from ao_tpu.moe.grouped import grouped_matmul
from ao_tpu.ops import kernels
from ao_tpu.quantization.qarrays.common import ActQuantSpec
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.utils.roofline import detect_tpu_spec
from ao_tpu.utils.timing import device_time_us

N_WEIGHTS = 2  # distinct expert stacks (defeats remote memoization)


def fused_roofline_us(spec, e, t, k, n, weight_bits):
    wbytes = e * k * n * weight_bits / 8
    dma_s = wbytes / (spec.hbm_gbps * 1e9)
    mxu_s = 2 * e * t * k * n / (spec.bf16_tflops * 1e12)
    return max(dma_s, mxu_s) * 1e6


def bench(name, make_qw, e, t, k, n, weight_bits, backend="auto"):
    spec = detect_tpu_spec()
    qws = [
        make_qw(jax.random.normal(jax.random.PRNGKey(10 + i), (e, k, n),
                                  jnp.float32) * 0.02)
        for i in range(N_WEIGHTS)
    ]
    x = jax.random.normal(jax.random.PRNGKey(1), (t, k), jnp.bfloat16)
    # near-uniform routing with a remainder tail
    base = t // e
    gs = jnp.array([base + (1 if i < t - base * e else 0)
                    for i in range(e)], jnp.int32)

    def run(x, gs, *qws):
        with kernels.backend(backend):
            return sum(grouped_matmul(x, q, gs) for q in qws)

    f = jax.jit(run)
    if kernels.on_tpu():
        us = device_time_us(f, x, gs, *qws, iters=10) / N_WEIGHTS
    else:  # CPU smoke: wiring + numerics only, no timing
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            jax.block_until_ready(f(x, gs, *qws))
        us = 0.0
    us = max(us, 1e-6)  # CPU smoke: xplane timing reports 0 off-TPU
    roof = fused_roofline_us(spec, e, t, k, n, weight_bits)
    print(json.dumps({
        "scheme": name, "e": e, "t": t, "k": k, "n": n,
        "us": round(us, 2), "fused_roofline_us": round(roof, 2),
        "pct_sol": round(100 * roof / us, 1),
    }))
    return us


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(json.dumps({"device": str(jax.devices()[0]),
                      "spec": detect_tpu_spec().name}))
    # Mixtral-8x7B expert shapes: w1/w3 (4096 -> 14336), w2 (14336 -> 4096)
    shapes = [(8, 4096, 14336), (8, 14336, 4096)]
    if not kernels.on_tpu():  # CPU smoke: tiny stacks, wiring only
        shapes = [(4, 512, 256)]
    for e, k, n in shapes:
        bench("bf16_ragged", lambda w: w.astype(jnp.bfloat16), e, t, k, n, 16)
        bench("int4_dequant_ragged",
              lambda w: Int4Array.from_hp(w, group_size=128),
              e, t, k, n, 4, backend="xla")
        bench("int4_fused_grouped",
              lambda w: Int4Array.from_hp(w, group_size=128),
              e, t, k, n, 4, backend="pallas")
        bench("w4a8_fused_grouped",
              lambda w: Int4Array.from_hp(
                  w, group_size=128,
                  act_quant=ActQuantSpec("int8", granularity="per_token")),
              e, t, k, n, 4, backend="pallas")


if __name__ == "__main__":
    main()
