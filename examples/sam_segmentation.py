"""Quantize a SAM-class segmentation model and run promptable mask decode.

python examples/sam_segmentation.py

The ViT-det image encoder does ~98% of the FLOPs and runs ONCE per image;
mask decoding re-runs per prompt against the cached embedding. Quantize
with an int8-MXU config (the encoder is compute-bound), encode once, then
decode several point prompts — the workflow the reference's
segment-anything benchmarks serve (torchao README.md:47).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# tiny demo model; CPU avoids tunnel roundtrips
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import ao_tpu
from ao_tpu.models import sam


def main():
    cfg = sam.SAMConfig(image_size=128, patch_size=8, dim=128, n_layers=4,
                        n_heads=4, window_size=4, global_attn_layers=(1, 3),
                        neck_dim=64, decoder_heads=4, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = sam.init_params(key, cfg)
    images = jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.image_size, cfg.image_size, 3),
        jnp.float32)

    ref_emb = sam.encode_image(params, images, cfg)

    qp = ao_tpu.quantize_(params, ao_tpu.Int8DynamicActivationInt8WeightConfig())
    encode = jax.jit(lambda p, i: sam.encode_image(p, i, cfg))
    emb = encode(qp, images)
    print(f"encoder SQNR vs fp32: {ao_tpu.compute_error(ref_emb, emb):.1f} dB")

    decode = jax.jit(
        lambda p, e, c, l: sam.decode_masks(
            p, e, sam.encode_points(p, c, l, cfg), cfg))
    # three prompts against the SAME cached embedding
    for i, (x, y) in enumerate([(32.0, 32.0), (96.0, 64.0), (64.0, 100.0)]):
        coords = jnp.array([[[x, y]]])
        labels = jnp.array([[1]])
        masks, iou = decode(qp, emb, coords, labels)
        best = int(jnp.argmax(iou[0]))
        area = float((masks[0, best] > 0).mean())
        print(f"prompt {i} at ({x:.0f},{y:.0f}): best mask #{best}, "
              f"predicted iou {float(iou[0, best]):.3f}, area {area:.2%}")


if __name__ == "__main__":
    main()
