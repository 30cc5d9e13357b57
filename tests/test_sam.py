"""SAM-family model tests: pipeline shapes, windowed attention equivalence,
quantization SQNR through the whole pipeline, TP sharding rules.

(ref analog: the reference's segment-anything benchmark checks — quantized/
sparse SAM keeps mask quality, README.md:47.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.models import sam


@pytest.fixture(scope="module")
def tiny():
    cfg = sam.SAM_TINY
    params = sam.init_params(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(
        jax.random.PRNGKey(1), (2, cfg.image_size, cfg.image_size, 3),
        jnp.float32)
    coords = jnp.array([[[10.0, 20.0], [40.0, 50.0]],
                        [[5.0, 5.0], [0.0, 0.0]]])
    labels = jnp.array([[1, 0], [1, -1]])
    return cfg, params, imgs, coords, labels


class TestForward:
    def test_pipeline_shapes(self, tiny):
        cfg, params, imgs, coords, labels = tiny
        emb = sam.encode_image(params, imgs, cfg)
        g = cfg.grid
        assert emb.shape == (2, g, g, cfg.neck_dim)
        sparse = sam.encode_points(params, coords, labels, cfg)
        assert sparse.shape == (2, 2, cfg.neck_dim)
        masks, iou = sam.decode_masks(params, emb, sparse, cfg)
        assert masks.shape == (2, cfg.n_mask_tokens, 4 * g, 4 * g)
        assert iou.shape == (2, cfg.n_mask_tokens)
        assert np.isfinite(np.asarray(masks)).all()
        assert np.isfinite(np.asarray(iou)).all()

    def test_jit_forward(self, tiny):
        cfg, params, imgs, coords, labels = tiny
        f = jax.jit(lambda p, i, c, l: sam.forward(p, i, c, l, cfg))
        masks, iou = f(params, imgs, coords, labels)
        m2, i2 = sam.forward(params, imgs, coords, labels, cfg)
        np.testing.assert_allclose(np.asarray(masks), np.asarray(m2),
                                   rtol=1e-4, atol=1e-4)

    def test_window_partition_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 12, 5))
        w = sam._window_partition(x, 4)
        assert w.shape == (2 * 2 * 3, 16, 5)
        back = sam._window_merge(w, 4, 2, 8, 12)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_pad_points_ignored_position(self, tiny):
        """A pad point (-1) must contribute identically wherever it sits."""
        cfg, params, _, _, _ = tiny
        c1 = jnp.array([[[10.0, 20.0], [1.0, 2.0]]])
        c2 = jnp.array([[[10.0, 20.0], [60.0, 30.0]]])
        l = jnp.array([[1, -1]])
        s1 = sam.encode_points(params, c1, l, cfg)
        s2 = sam.encode_points(params, c2, l, cfg)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


class TestQuantized:
    @pytest.mark.parametrize("config,min_db", [
        (ao_tpu.Int8WeightOnlyConfig(), 25.0),
        (ao_tpu.Int4WeightOnlyConfig(group_size=32), 9.0),
        (ao_tpu.Float8WeightOnlyConfig(), 20.0),
        # w8a8 exercises the producer-epilogue quant paths (global-attn
        # LN-quant + MLP LN/GELU-quant, fused_act.py)
        (ao_tpu.Int8DynamicActivationInt8WeightConfig(), 18.0),
    ])
    def test_quantized_masks_close(self, tiny, config, min_db):
        cfg, params, imgs, coords, labels = tiny
        ref_masks, ref_iou = sam.forward(params, imgs, coords, labels, cfg)
        qp = ao_tpu.quantize_(params, config)
        # every encoder attention/mlp weight must actually be quantized
        n_q = sum(
            1 for leaf in jax.tree.leaves(
                qp, is_leaf=lambda l: hasattr(l, "qdata"))
            if hasattr(leaf, "qdata"))
        assert n_q >= 6 * cfg.n_layers
        masks, iou = sam.forward(qp, imgs, coords, labels, cfg)
        assert ao_tpu.compute_error(ref_masks, masks) > min_db
        # mask ranking survives: best-iou mask index mostly unchanged
        assert ao_tpu.compute_error(ref_iou, iou) > min_db - 3

    def test_quantized_conv_weights(self, tiny):
        from ao_tpu.ops.conv import quantize_conv_weight

        cfg, params, imgs, coords, labels = tiny
        ref, _ = sam.forward(params, imgs, coords, labels, cfg)
        qp = jax.tree_util.tree_map_with_path(
            lambda path, leaf: quantize_conv_weight(
                leaf, ao_tpu.Int8WeightOnlyConfig())
            if (hasattr(leaf, "ndim") and leaf.ndim == 4
                and "kernel" in str(path[-1])) else leaf,
            params,
        )
        masks, _ = sam.forward(qp, imgs, coords, labels, cfg)
        assert ao_tpu.compute_error(ref, masks) > 25


class TestSharding:
    def test_tp_rules_cover_all_leaves(self, tiny):
        """No ≥2-D leaf may fall through the SAM rule set (the silent-
        replication contract, parallel/sharding.py)."""
        from ao_tpu.parallel.sharding import param_pspecs

        cfg, params, _, _, _ = tiny
        specs = param_pspecs(params, rules=sam.TP_RULES, strict=True)
        flat = jax.tree.leaves(specs)
        assert len(flat) == len(jax.tree.leaves(params))

    def test_tp_forward_8dev(self, tiny):
        from jax.sharding import Mesh, NamedSharding

        from ao_tpu.parallel.sharding import shard_params

        cfg, params, imgs, coords, labels = tiny
        ref, _ = sam.forward(params, imgs, coords, labels, cfg)
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = Mesh(np.array(devs[:8]).reshape(1, 8), ("dp", "tp"))
        sharded = shard_params(params, mesh, rules=sam.TP_RULES)
        f = jax.jit(lambda p, i, c, l: sam.forward(p, i, c, l, cfg))
        masks, _ = f(sharded, imgs, coords, labels)
        assert ao_tpu.compute_error(ref, masks) > 35
