"""MoE subsystem tests: grouped quantized matmul, the MoE layer under
quantize_, fp8/mxfp8 grouped-matmul training numerics, and EP quantized
all-to-all on the 8-device CPU mesh.

(ref test strategy analog: test/prototype/moe_training/ — SQNR bounds vs a
high-precision reference, grad checks, and multi-device collectives.)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import ao_tpu
from ao_tpu.moe import (
    MoEConfig,
    a2a_combine_quantized,
    a2a_dispatch_quantized,
    fp8_grouped_matmul,
    grouped_matmul,
    init_moe_params,
    moe_forward,
    mxfp8_grouped_matmul,
)
from ao_tpu.quantization.qarrays.float8 import Float8Array
from ao_tpu.quantization.qarrays.int4 import Int4Array
from ao_tpu.quantization.qarrays.int8 import Int8Array
from ao_tpu.quantization.qarrays.common import ActQuantSpec

sqnr = ao_tpu.compute_error


def _ref_grouped(x, w, gs):
    """Loop-free reference: dense per-expert mask matmul in f64-ish f32."""
    e = w.shape[0]
    ids = jnp.repeat(jnp.arange(e), gs, total_repeat_length=x.shape[0])
    wt = w.astype(jnp.float32)[ids]  # (T, K, N)
    return jnp.einsum("tk,tkn->tn", x.astype(jnp.float32), wt)


def _mk(seed=0, t=96, k=64, n=48, e=4):
    key = jax.random.PRNGKey(seed)
    kx, kw, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (t, k), jnp.float32)
    w = jax.random.normal(kw, (e, k, n), jnp.float32) * 0.1
    # random group sizes summing to t
    props = jax.random.dirichlet(kg, jnp.ones(e))
    gs = jnp.floor(props * t).astype(jnp.int32)
    gs = gs.at[0].add(t - jnp.sum(gs))
    return x, w, gs


class TestGroupedMatmul:
    def test_plain(self):
        x, w, gs = _mk()
        y = grouped_matmul(x, w, gs)
        assert sqnr(_ref_grouped(x, w, gs), y) > 35

    def test_int8_weight_only(self):
        x, w, gs = _mk()
        qw = Int8Array.from_hp(w, block_size=(1, w.shape[1], 1))
        y = grouped_matmul(x, qw, gs)
        assert sqnr(_ref_grouped(x, w, gs), y) > 25

    def test_int8_dynamic_act(self):
        x, w, gs = _mk()
        qw = Int8Array.from_hp(
            w, block_size=(1, w.shape[1], 1), act_quant=ActQuantSpec("int8")
        )
        y = grouped_matmul(x, qw, gs)
        assert sqnr(_ref_grouped(x, w, gs), y) > 20

    def test_fp8_dynamic_act(self):
        x, w, gs = _mk()
        qw = Float8Array.from_hp(
            w, block_size=(1, w.shape[1], 1),
            act_quant=ActQuantSpec("float8_e4m3fn"),
        )
        y = grouped_matmul(x, qw, gs)
        assert sqnr(_ref_grouped(x, w, gs), y) > 20

    def test_int4_groupwise(self):
        x, w, gs = _mk()
        qw = Int4Array.from_hp(w, group_size=32)
        y = grouped_matmul(x, qw, gs)
        assert sqnr(_ref_grouped(x, w, gs), y) > 12

    def test_jit_and_empty_groups(self):
        x, w, _ = _mk()
        gs = jnp.array([96, 0, 0, 0], jnp.int32)  # all tokens on expert 0
        y = jax.jit(grouped_matmul)(x, w, gs)
        ref = x @ w[0].astype(jnp.float32)
        assert sqnr(ref, y) > 35


class TestMoELayer:
    def test_forward_matches_dense_expert_sum(self):
        cfg = MoEConfig(dim=64, ffn_dim=96, n_experts=4, top_k=2)
        params = init_moe_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, cfg.dim), jnp.float32)
        y = jax.jit(lambda p, x: moe_forward(p, x, cfg))(params, x)
        assert y.shape == x.shape

        # dense reference: every token through every expert, weighted
        from ao_tpu.moe.layer import route

        x2 = x.reshape(-1, cfg.dim)
        topw, topi = route(x2, params["router"], cfg)
        ref = jnp.zeros_like(x2)
        for e in range(cfg.n_experts):
            g = x2 @ params["w_gate"][e]
            u = x2 @ params["w_up"][e]
            o = (jax.nn.silu(g) * u) @ params["w_down"][e]
            wgt = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
            ref = ref + o * wgt[:, None]
        assert sqnr(ref.reshape(x.shape), y) > 30

    def test_quantized_experts_int8_and_int4(self):
        cfg = MoEConfig(dim=64, ffn_dim=96, n_experts=4, top_k=2)
        params = init_moe_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, cfg.dim), jnp.float32)
        y_hp = moe_forward(params, x, cfg)

        def only_experts(fqn, leaf):
            return fqn.startswith("w_") and leaf.ndim == 3

        for config, bound in [
            (ao_tpu.Int8WeightOnlyConfig(), 22),
            (ao_tpu.Int4WeightOnlyConfig(group_size=32), 11),
        ]:
            qp = ao_tpu.quantize_(params, config, filter_fn=only_experts)
            assert isinstance(qp["w_gate"], object) and qp["w_gate"] is not params["w_gate"]
            yq = jax.jit(lambda p, x: moe_forward(p, x, cfg))(qp, x)
            assert sqnr(y_hp, yq) > bound, type(config).__name__


class TestFp8GroupedTraining:
    def test_forward_sqnr(self):
        x, w, gs = _mk(t=128, k=64, n=64)
        y = fp8_grouped_matmul(x, w, gs)
        assert sqnr(_ref_grouped(x, w, gs), y) > 20

    def test_grads_close_to_hp(self):
        x, w, gs = _mk(t=128, k=64, n=64)

        def loss_q(x, w):
            return jnp.sum(fp8_grouped_matmul(x, w, gs) ** 2)

        def loss_hp(x, w):
            return jnp.sum(_ref_grouped(x, w, gs) ** 2)

        gx_q, gw_q = jax.grad(loss_q, argnums=(0, 1))(x, w)
        gx_hp, gw_hp = jax.grad(loss_hp, argnums=(0, 1))(x, w)
        assert sqnr(gx_hp, gx_q) > 15
        assert sqnr(gw_hp, gw_q) > 15

    def test_mxfp8_forward_and_grads(self):
        x, w, gs = _mk(t=100, k=64, n=64)  # t deliberately not /32
        y = mxfp8_grouped_matmul(x, w, gs)
        assert sqnr(_ref_grouped(x, w, gs), y) > 18

        def loss_q(x, w):
            return jnp.sum(mxfp8_grouped_matmul(x, w, gs) ** 2)

        def loss_hp(x, w):
            return jnp.sum(_ref_grouped(x, w, gs) ** 2)

        gx_q, gw_q = jax.grad(loss_q, argnums=(0, 1))(x, w)
        gx_hp, gw_hp = jax.grad(loss_hp, argnums=(0, 1))(x, w)
        assert sqnr(gx_hp, gx_q) > 13
        assert sqnr(gw_hp, gw_q) > 13


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
class TestExpertParallelA2A:
    def _mesh(self, n=4):
        return Mesh(np.array(jax.devices()[:n]), ("ep",))

    def test_dispatch_roundtrip_fp8(self):
        mesh = self._mesh()
        n = 4
        x = jax.random.normal(jax.random.PRNGKey(0), (n * n * 8, 32), jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P("ep", None)))

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P("ep", None),
            out_specs=P("ep", None),
        )
        def disp(xl):
            return a2a_dispatch_quantized(xl, "ep", "float8")

        y = disp(xs)
        # a2a is an involution: dispatching twice returns the original
        # (up to two fp8 quantization roundtrips)
        y2 = disp(y)
        assert sqnr(x, np.asarray(y2)) > 25

    def test_combine_is_exact_forward(self):
        mesh = self._mesh()
        n = 4
        x = jax.random.normal(jax.random.PRNGKey(1), (n * n * 4, 16), jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P("ep", None)))

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P("ep", None),
            out_specs=P("ep", None),
        )
        def comb(xl):
            return a2a_combine_quantized(xl, "ep", "float8")

        y = comb(comb(xs))
        np.testing.assert_allclose(np.asarray(y), x, rtol=0, atol=0)

    def test_dispatch_bwd_is_hp(self):
        mesh = self._mesh()
        n = 4
        x = jax.random.normal(jax.random.PRNGKey(2), (n * n * 4, 16), jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P("ep", None)))

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P("ep", None),
            out_specs=P(), check_vma=False,
        )
        def loss(xl):
            y = a2a_dispatch_quantized(xl, "ep", "float8")
            return jax.lax.psum(jnp.sum(y * y), "ep")

        g = jax.grad(lambda x: jax.shard_map(
            lambda xl: jax.lax.psum(
                jnp.sum(a2a_dispatch_quantized(xl, "ep", "float8") ** 2), "ep"
            ),
            mesh=mesh, in_specs=P("ep", None), out_specs=P(),
            check_vma=False,
        )(x).sum())(x)
        # gradient of sum(q(a2a(x))^2) ≈ 2 * a2a_rev(a2a(x)) = 2x (up to quant)
        assert sqnr(2 * x, np.asarray(g)) > 20

    def test_mxfp8_payload(self):
        mesh = self._mesh()
        n = 4
        x = jax.random.normal(jax.random.PRNGKey(3), (n * n * 4, 64), jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P("ep", None)))

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P("ep", None),
            out_specs=P("ep", None),
        )
        def disp(xl):
            return a2a_dispatch_quantized(xl, "ep", "mxfp8")

        y2 = disp(disp(xs))
        assert sqnr(x, np.asarray(y2)) > 22


class TestGPTQMoE:
    def test_gptq_3d_expert_quantization(self):
        """observe MoE expert weights through grouped forwards → convert
        yields per-expert GPTQ int4 that beats plain RTN on skewed data.
        (ref: gptq 3-D variant prototype/gptq/api.py:600)"""
        e, k, n, t = 4, 64, 48, 512
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (e, k, n), jnp.float32) * 0.1
        params = {"w_gate": w}

        cfg4 = ao_tpu.Int4WeightOnlyConfig(group_size=32)
        obs = ao_tpu.quantize_(
            params, ao_tpu.GPTQConfig(base_config=cfg4, step="observe")
        )
        # calibration: correlated activations (GPTQ's advantage case)
        base = jax.random.normal(jax.random.PRNGKey(1), (t, k))
        mix = jax.random.normal(jax.random.PRNGKey(2), (k, k)) * 0.2
        x = base + base @ mix
        gs = jnp.full((e,), t // e, jnp.int32)
        _ = grouped_matmul(x, obs["w_gate"], gs)  # eager, accumulates H

        conv = ao_tpu.quantize_(
            obs, ao_tpu.GPTQConfig(base_config=cfg4, step="convert")
        )
        qw = conv["w_gate"]
        assert isinstance(qw, Int4Array) and qw.shape == (e, k, n)

        y_ref = _ref_grouped(x, w, gs)
        y_gptq = grouped_matmul(x, qw, gs)
        rtn = Int4Array.from_hp(w, group_size=32)
        y_rtn = grouped_matmul(x, rtn, gs)
        s_gptq = sqnr(y_ref, y_gptq)
        s_rtn = sqnr(y_ref, y_rtn)
        assert s_gptq > s_rtn, (float(s_rtn), float(s_gptq))
