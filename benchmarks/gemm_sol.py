"""GEMM %-of-speed-of-light microbenchmarks across quantization schemes.

Run on a real TPU: ``python benchmarks/gemm_sol.py [M]``. Prints one JSON
line per (scheme, shape) with measured µs, roofline µs, and %SoL.

(ref analog: the roofline-expected-speedup tables in
docs/source/workflows/inference.md:100-132 and benchmarks/float8/.
Weights are distinct per iteration to defeat remote-result memoization.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ao_tpu.ops import kernels, linear
from ao_tpu.quantization.qarrays.common import ActQuantSpec
from ao_tpu.quantization.qarrays.float8 import Float8Array
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.utils.roofline import detect_tpu_spec, gemm_roofline_us
from ao_tpu.utils.timing import device_time_us

N_WEIGHTS = 8  # distinct weights per measurement (defeats memoization)


def bench_scheme(name, make_qw, m, k, n, weight_bits, act_bits,
                 int_compute=False):
    qws = [
        make_qw(jax.random.normal(jax.random.PRNGKey(10 + i), (k, n),
                                  jnp.float32) * 0.02)
        for i in range(N_WEIGHTS)
    ]
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)
    # weights as ARGUMENTS (closing over them bakes 100s of MB of
    # constants into the uploaded program)
    f = jax.jit(lambda x, *qws: sum(linear(x, q) for q in qws))
    us = device_time_us(f, x, *qws, iters=10) / N_WEIGHTS
    roof = gemm_roofline_us(m, k, n, weight_bits, act_bits,
                            int_compute=int_compute)
    print(json.dumps({
        "scheme": name, "m": m, "k": k, "n": n,
        "us": round(us, 2), "roofline_us": round(roof["roofline_us"], 2),
        "bound": roof["bound"], "pct_sol": round(
            100 * roof["roofline_us"] / us, 1),
    }))
    return us


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spec = detect_tpu_spec()
    print(json.dumps({"device": str(jax.devices()[0]), "spec": spec.name}))
    shapes = [(4096, 4096), (4096, 14336)]
    for k, n in shapes:
        bench_scheme("bf16", lambda w: w.astype(jnp.bfloat16), m, k, n, 16, 16)
        bench_scheme(
            "int4_wo_g128", lambda w: Int4Array.from_hp(w, group_size=128),
            m, k, n, 4, 16)
        bench_scheme(
            "int8_wo", lambda w: Int8Array.from_hp(w, block_size=(k, 1)),
            m, k, n, 8, 16)
        bench_scheme(
            "w8a8_dyn",
            lambda w: Int8Array.from_hp(w, block_size=(k, 1),
                                        act_quant=ActQuantSpec("int8")),
            m, k, n, 8, 8, int_compute=True)
        bench_scheme(
            "fp8_rowwise_dyn",
            lambda w: Float8Array.from_hp(
                w, block_size=(k, 1),
                act_quant=ActQuantSpec("float8_e4m3fn")),
            m, k, n, 8, 8)


if __name__ == "__main__":
    main()
