"""ViT model family: quantized + sparse vision transformer.

(ref analog: the reference's ViT-L 2:4-sparse and SAM/Flux quantized
vision pipelines — README.md:246, sparsity/README.md:28.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import vit
from ao_tpu.ops.conv import quantize_conv_weight
from ao_tpu.sparsity.configs import SemiSparseWeightConfig, sparsify_

sqnr = ao_tpu.compute_error


@pytest.fixture(scope="module")
def model():
    cfg = vit.VIT_TINY
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    return cfg, params, images


class TestViT:
    def test_forward_shape(self, model):
        cfg, params, images = model
        logits = vit.forward(params, images, cfg)
        assert logits.shape == (2, cfg.n_classes)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_jit_forward_matches_eager(self, model):
        cfg, params, images = model
        ref = vit.forward(params, images, cfg)
        out = jax.jit(lambda p, x: vit.forward(p, x, cfg))(params, images)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-4, atol=1e-4)

    def test_int8_weight_only(self, model):
        cfg, params, images = model
        ref = vit.forward(params, images, cfg)
        qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())
        out = vit.forward(qp, images, cfg)
        assert float(sqnr(ref, out)) > 25.0

    def test_int4_weight_only(self, model):
        cfg, params, images = model
        ref = vit.forward(params, images, cfg)
        qp = ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(
            group_size=32))
        out = vit.forward(qp, images, cfg)
        assert float(sqnr(ref, out)) > 12.0

    def test_patch_embed_conv_quantized(self, model):
        cfg, params, images = model
        ref = vit.forward(params, images, cfg)
        qp = dict(params)
        qp["patch_embed"] = dict(params["patch_embed"])
        qp["patch_embed"]["kernel"] = quantize_conv_weight(
            params["patch_embed"]["kernel"], ao_tpu.Int8WeightOnlyConfig())
        out = vit.forward(qp, images, cfg)
        assert float(sqnr(ref, out)) > 25.0

    def test_semi_sparse_24(self, model):
        cfg, params, images = model
        sp = sparsify_(params, SemiSparseWeightConfig())
        out = vit.forward(sp, images, cfg)
        assert bool(jnp.all(jnp.isfinite(out)))
        # every sparsified weight keeps at most 2 of each 4 along K (axis -2)
        w1 = np.asarray(sp["layers"][0]["mlp"]["w1"].dequantize(jnp.float32))
        k, n = w1.shape
        nonzero = (w1.reshape(k // 4, 4, n) != 0).sum(axis=1)
        assert nonzero.max() <= 2

    def test_train_step(self, model):
        cfg, params, images = model
        labels = jnp.asarray([1, 7])

        def loss_fn(p):
            logits = vit.forward(p, images, cfg)
            lp = jax.nn.log_softmax(logits)
            return -lp[jnp.arange(2), labels].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert bool(jnp.isfinite(loss))
        g = grads["layers"][0]["attn"]["wq"]
        assert float(jnp.abs(g).max()) > 0.0
