"""SAM image-encoder throughput benchmark: quantized configs vs bf16.

Run on a real TPU: ``python benchmarks/sam_bench.py [batch]``. Prints one
JSON line per config with images/s and speedup vs bf16.

(ref analog: the reference's segment-anything-fast rows — int8 dynamic
quant + 2:4 sparse SAM at 1.1x inference, README.md:47. The ViT-det
encoder is compute-bound — 4096 tokens/image at dim 768+ — so on TPU the
win comes from the int8 MXU (W8A8 dynamic), not weight streaming; the
weight-only rows document the memory-bound regime instead.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here so
# `JAX_PLATFORMS=cpu python benchmarks/sam_bench.py` works for smokes
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

import ao_tpu
from ao_tpu.models import sam
from ao_tpu.utils.timing import device_time_us


def bench(name, params, cfg, imgs, base_us=None):
    f = jax.jit(lambda p, i: sam.encode_image(p, i, cfg))
    def mutate(args, i):
        p, im = args
        return (p, im * (1.0 + 1e-6 * (i + 1)))
    us = device_time_us(f, params, imgs, iters=6, mutate=mutate)
    n = imgs.shape[0]
    rec = {"config": name,
           "images_per_s": round(n * 1e6 / us, 2) if us > 0 else None,
           "ms_per_batch": round(us / 1e3, 2), "batch": n}
    if base_us is not None and us > 0:
        rec["speedup_vs_bf16"] = round(base_us / us, 3)
    print(json.dumps(rec))
    return us


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    # SAM-B at half spatial resolution: fits v5e HBM alongside activations
    # while keeping the 1024-token-per-image compute-bound regime
    # (AO_TPU_SAM_BENCH_TINY=1 smokes the harness on CPU)
    if os.environ.get("AO_TPU_SAM_BENCH_TINY"):
        cfg, model_name = sam.SAM_TINY, "SAM-TINY/64"
    else:
        cfg, model_name = sam.SAMConfig(image_size=512), "SAM-B/512"
    params = sam.init_params(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(
        jax.random.PRNGKey(1), (batch, cfg.image_size, cfg.image_size, 3),
        jnp.bfloat16)
    print(json.dumps({"model": model_name, "note": "encoder images/s"}))

    base = bench("bf16", params, cfg, imgs)
    for name, config in [
        ("int8_dyn_w8a8", ao_tpu.Int8DynamicActivationInt8WeightConfig()),
        ("int8_wo", ao_tpu.Int8WeightOnlyConfig()),
        ("int4_wo_g128", ao_tpu.Int4WeightOnlyConfig(group_size=128)),
        ("w4a8_g128", ao_tpu.Int8DynamicActivationInt4WeightConfig(
            group_size=128)),
        ("fp8_dyn", ao_tpu.Float8DynamicActivationFloat8WeightConfig()),
    ]:
        try:
            qp = ao_tpu.quantize_(params, config)
        except Exception as e:  # pragma: no cover - config coverage varies
            print(json.dumps({"config": name, "error": str(e)[:120]}))
            continue
        bench(name, qp, cfg, imgs, base)


if __name__ == "__main__":
    main()
