"""Distributed collectives tests on the 8-device CPU mesh: fp8-on-the-wire
gathers, quantized-pytree collectives, TP linear styles, FSDP fp8 gather,
ring collective-matmul.

(ref analog: test/float8/test_dtensor.sh + test_fsdp2 — numerics of
distributed composition checked against the single-device reference.)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import ao_tpu
from ao_tpu.parallel.collectives import (
    all_gather_fp8,
    all_gather_quantized,
    fsdp_all_gather_fp8,
    precompute_fp8_weight_scales,
    ring_allgather_matmul,
    tp_colwise_linear,
    tp_rowwise_linear,
)
from ao_tpu.quantization.qarrays.int8 import Int8Array

sqnr = ao_tpu.compute_error

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _mesh(n=8, name="tp"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def _smap(mesh, in_specs, out_specs, fn):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


class TestQuantizedCollectives:
    def test_all_gather_fp8_close_to_hp(self):
        mesh = _mesh()
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P("tp", None)))
        y = _smap(mesh, P("tp", None), P(None),
                  lambda xl: all_gather_fp8(xl, "tp"))(xs)
        # every device sees the full gathered array, fp8-rounded once
        assert y.shape == (64, 32)
        assert sqnr(x, np.asarray(y)) > 25

    def test_all_gather_quantized_int8_weight(self):
        mesh = _mesh()
        w = jax.random.normal(jax.random.PRNGKey(1), (128, 32), jnp.float32)
        qw = Int8Array.from_hp(w, block_size=(16, 1))  # scale (8, 32)

        def run(qdata, scale):
            q = jax.lax.all_gather(qdata, "tp", axis=0, tiled=True)
            s = jax.lax.all_gather(scale, "tp", axis=0, tiled=True)
            return q, s

        qd = jax.device_put(qw.qdata, NamedSharding(mesh, P("tp", None)))
        sc = jax.device_put(qw.scale, NamedSharding(mesh, P("tp", None)))
        q, s = _smap(mesh, (P("tp", None), P("tp", None)),
                     (P(None), P(None)), run)(qd, sc)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(qw.qdata))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(qw.scale))

    def test_fsdp_fp8_gather(self):
        mesh = _mesh()
        w = jax.random.normal(jax.random.PRNGKey(2), (64, 16), jnp.float32)
        scales = precompute_fp8_weight_scales({"w": w})
        ws = jax.device_put(w, NamedSharding(mesh, P("tp", None)))

        y = _smap(mesh, (P("tp", None), P(None)), P(None),
                  lambda wl, s: fsdp_all_gather_fp8(wl, s, "tp"))(
            ws, scales["w"])
        assert y.shape == w.shape
        assert sqnr(w, np.asarray(y)) > 25


class TestTPStyles:
    def test_colwise_then_rowwise_matches_dense(self):
        """The canonical megatron block: colwise W1 (sharded N), activation
        stays sharded, rowwise W2 (sharded K) + psum — must equal the
        unsharded two-layer matmul."""
        mesh = _mesh()
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 32), jnp.float32)
        w1 = jax.random.normal(jax.random.PRNGKey(1), (32, 64), jnp.float32)
        w2 = jax.random.normal(jax.random.PRNGKey(2), (64, 32), jnp.float32)
        ref = (x @ w1) @ w2

        w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "tp")))
        w2s = jax.device_put(w2, NamedSharding(mesh, P("tp", None)))

        def block(x, w1l, w2l):
            h = tp_colwise_linear(x, w1l, "tp")  # (16, 64/8) local
            return tp_rowwise_linear(h, w2l, "tp")  # psum → (16, 32)

        y = _smap(mesh, (P(None), P(None, "tp"), P("tp", None)), P(None),
                  block)(x, w1s, w2s)
        assert sqnr(ref, np.asarray(y)) > 35

    def test_tp_with_quantized_shards(self):
        """Per-shard int8 quantization composes with TP (vLLM loading
        pattern: shard first, quantize each shard)."""
        mesh = _mesh()
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 32), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 64), jnp.float32)
        ref = x @ w

        # shard N into 8, quantize each shard independently
        shards = jnp.split(w, 8, axis=1)
        qshards = [Int8Array.from_hp(s, block_size=(32, 1)) for s in shards]
        qd = jnp.stack([q.qdata for q in qshards])  # (8, 32, 8)
        sc = jnp.stack([q.scale for q in qshards])  # (8, 1, 8)

        def block(x, qd, sc):
            qw = Int8Array(
                qdata=qd[0], scale=sc[0], zero_point=None, act_scale=None,
                act_zero_point=None, act_pre_scale=None,
                block_size=(32, 1), _shape=(32, 8),
            )
            return tp_colwise_linear(x, qw, "tp", gather_output=True)

        y = _smap(mesh, (P(None), P("tp", None, None), P("tp", None, None)),
                  P(None), block)(x, qd, sc)
        assert sqnr(ref, np.asarray(y)) > 25


class TestRingCollectiveMatmul:
    def test_matches_gather_then_matmul(self):
        mesh = _mesh()
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16), jnp.float32)
        ref = x @ w
        xs = jax.device_put(x, NamedSharding(mesh, P("tp", None)))

        y = _smap(mesh, (P("tp", None), P(None)), P(None),
                  lambda xl, w: ring_allgather_matmul(xl, w, "tp"))(xs, w)
        assert y.shape == ref.shape
        assert sqnr(ref, np.asarray(y)) > 35

    def test_with_quantized_weight(self):
        mesh = _mesh()
        x = jax.random.normal(jax.random.PRNGKey(2), (64, 32), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(3), (32, 16), jnp.float32)
        qw = Int8Array.from_hp(w, block_size=(32, 1))
        ref = x @ qw.dequantize(jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P("tp", None)))

        y = _smap(mesh, (P("tp", None),), P(None),
                  lambda xl: ring_allgather_matmul(xl, qw, "tp"))(xs)
        assert sqnr(ref, np.asarray(y)) > 30
