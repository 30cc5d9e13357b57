"""Diffusion (DiT-XL/2) denoise-step throughput across quant configs.

``python benchmarks/diffusion_bench.py`` on a real TPU. One JSON line per
config: denoise-step ms + speedup over bf16.

(ref analog: the reference's Flux.1-dev rows — fp8-rowwise 1.21-1.24x,
mxfp8 1.14-1.16x, nvfp4 1.30-1.37x on H100,
docs/source/workflows/inference.md:200-205. A denoise step is
COMPUTE-bound, so on v5e the winners are the int8-MXU paths (w8a8/w4a8,
2x bf16 peak); fp8 has no native MXU there and nvfp4/int4-WO only cut
weight bytes, which a compute-bound step barely reads.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
# explicitly so `JAX_PLATFORMS=cpu` smokes work
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

import ao_tpu
from ao_tpu.models import dit
from ao_tpu.utils.timing import device_time_us


def main():
    cfg = dit.DIT_XL2
    batch = 8  # CFG-guided sampling doubles the effective batch upstream
    if os.environ.get("AO_DIFF_TINY"):  # CPU smoke mode
        cfg = dit.DiTConfig(input_size=8, dim=256, n_layers=2, n_heads=4,
                            n_classes=16)
        batch = 2
    key = jax.random.PRNGKey(0)
    params = dit.init_params(key, cfg)
    # randomize the zero-init leaves so quantization sees real weights
    ks = iter(jax.random.split(jax.random.PRNGKey(7), cfg.n_layers + 2))
    for lp in params["layers"]:
        lp["mod"] = (jax.random.normal(next(ks), lp["mod"].shape, jnp.float32)
                     * (cfg.dim ** -0.5)).astype(cfg.dtype)
    params["final"]["out"] = (
        jax.random.normal(next(ks), params["final"]["out"].shape, jnp.float32)
        * (cfg.dim ** -0.5)).astype(cfg.dtype)

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch, cfg.input_size, cfg.input_size,
                           cfg.in_channels), jnp.float32)
    t = jnp.full((batch,), 500.0, jnp.float32)
    y = jnp.arange(batch, dtype=jnp.int32) % cfg.n_classes

    def bench(p):
        def mutate(args, i):
            return (args[0], args[1] + 0.01 * (i + 1)) + args[2:]

        # jit the denoise step — a sampler always runs it compiled; the
        # first committed run of this bench timed the EAGER forward, which
        # penalizes exactly the configs that add fusable element-wise work
        # (dyn-act quant ran 0.27x; jitted, the same config beats bf16)
        f = jax.jit(lambda p_, x_: dit.forward(p_, x_, t, y, cfg))
        us = device_time_us(f, p, x, iters=3, mutate=mutate)
        # CPU smoke: the op_profile busy-time is 0 off-device
        return max(us / 1e3, 1e-6)  # ms per denoise step

    base_ms = bench(params)
    print(json.dumps({"config": "bf16", "step_ms": round(base_ms, 2),
                      "speedup": 1.0, "img_s": round(batch / (base_ms / 1e3) / 50, 2)}),
          flush=True)

    suites = [
        ("w8a8", ao_tpu.Int8DynamicActivationInt8WeightConfig()),
        ("w4a8_g128",
         ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=128)),
        ("fp8_dyn", ao_tpu.Float8DynamicActivationFloat8WeightConfig()),
        ("int8_wo", ao_tpu.Int8WeightOnlyConfig()),
        ("int4_wo_g128", ao_tpu.Int4WeightOnlyConfig(group_size=128)),
    ]
    for name, qcfg in suites:
        qp = ao_tpu.quantize_(params, qcfg)
        ms = bench(qp)
        print(json.dumps({
            "config": name, "step_ms": round(ms, 2),
            "speedup": round(base_ms / ms, 3),
            # images/s at 50 DDIM steps (guidance off) — absolute anchor
            "img_s": round(batch / (ms / 1e3) / 50, 2),
        }), flush=True)
        del qp
        jax.clear_caches()


if __name__ == "__main__":
    main()
