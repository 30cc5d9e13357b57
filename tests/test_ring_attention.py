"""Ring attention (context parallel) tests on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import ao_tpu
from ao_tpu.ops.attention import sdpa_reference
from ao_tpu.parallel.ring_attention import ring_attention

sqnr = ao_tpu.compute_error

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _run(causal, quantize_comm, n=8, b=2, h=4, s=128, d=32):
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d), jnp.float32)
    sh = NamedSharding(mesh, P(None, None, "sp", None))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))

    fn = jax.jit(jax.shard_map(
        functools.partial(ring_attention, axis_name="sp", causal=causal,
                          quantize_comm=quantize_comm),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
        check_vma=False,
    ))
    out = fn(qs, ks, vs)
    ref = sdpa_reference(q, k, v, causal=causal)
    return ref, np.asarray(out)


class TestRingAttention:
    def test_causal_matches_full(self):
        ref, out = _run(causal=True, quantize_comm=False)
        assert sqnr(ref, out) > 35

    def test_non_causal(self):
        ref, out = _run(causal=False, quantize_comm=False)
        assert sqnr(ref, out) > 35

    def test_quantized_ring_payload(self):
        ref, out = _run(causal=True, quantize_comm=True)
        # int8 K/V on the wire: bounded quantization error
        assert sqnr(ref, out) > 22

    def test_long_vs_short_ring(self):
        """2-way and 8-way rings agree with each other."""
        ref2, out2 = _run(causal=True, quantize_comm=False, n=2)
        ref8, out8 = _run(causal=True, quantize_comm=False, n=8)
        np.testing.assert_allclose(out2, out8, rtol=2e-2, atol=2e-3)
