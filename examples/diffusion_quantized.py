"""Quantize a DiT diffusion model and sample with the int8-MXU config.

python examples/diffusion_quantized.py

A denoise step is compute-bound (weights are read once per latent
batch), so the right configs are the int8-MXU ones (w8a8 / W4A8) — the
weight-only configs that win LLM decode barely move a diffusion step.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# tiny demo model; CPU avoids tunnel roundtrips for the sampler loop
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import ao_tpu
from ao_tpu.models import dit
from ao_tpu.quantization.primitives import compute_error


def main():
    cfg = dit.DiTConfig(input_size=8, dim=256, n_layers=4, n_heads=4,
                        n_classes=10)
    key = jax.random.PRNGKey(0)
    params = dit.init_params(key, cfg)
    # randomize the adaLN-Zero / output zero-inits so the net is non-trivial
    ks = iter(jax.random.split(jax.random.PRNGKey(7), cfg.n_layers + 2))
    for lp in params["layers"]:
        lp["mod"] = (jax.random.normal(next(ks), lp["mod"].shape)
                     * (cfg.dim ** -0.5)).astype(cfg.dtype)
    params["final"]["out"] = (
        jax.random.normal(next(ks), params["final"]["out"].shape)
        * (cfg.dim ** -0.5)).astype(cfg.dtype)

    labels = jnp.array([0, 1, 2, 3], jnp.int32)
    ref = dit.sample(params, cfg, key, labels, steps=8, guidance_scale=2.0)

    for name, qcfg in [
        ("w8a8", ao_tpu.Int8DynamicActivationInt8WeightConfig()),
        ("w4a8", ao_tpu.Int8DynamicActivationInt4WeightConfig(group_size=32)),
    ]:
        qp = ao_tpu.quantize_(params, qcfg)
        out = dit.sample(qp, cfg, key, labels, steps=8, guidance_scale=2.0)
        sqnr = float(compute_error(ref, out))
        print(f"{name}: sampled latents {tuple(out.shape)}, "
              f"SQNR vs bf16 trajectory {sqnr:.1f} dB")


if __name__ == "__main__":
    main()
