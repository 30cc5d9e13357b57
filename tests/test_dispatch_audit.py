"""Dispatch audits: the int4-WO prefill gate holds at EVERY entry point.

The fused int4-WO Pallas kernels re-read the packed weight per M-tile,
which flips from a win to a loss around M~2k (kernels.py gate at
M<=1024, commit 520f415). These tests pin that engine bucketed prefill,
chunked prefill, and one-shot generate() all route int4-WO matmuls
through the gated path at prefill M — no fused magic kernel above the
threshold — by forcing the pallas backend on CPU and recording every M
the fused kernels are OFFERED. (ref idiom: the reference's
integration-contract tests, testing/utils.py:470-693.)
"""

import jax
import jax.numpy as jnp
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.ops import kernels

GATE_M = 1024


@pytest.fixture
def record_pallas_calls(monkeypatch):
    """Force the pallas dispatch branch on CPU and record the M of every
    fused int4-WO kernel invocation; compute via the XLA fallback so
    numerics still flow."""
    from ao_tpu.ops.pallas import int4_matmul as pk

    calls = []

    def rec_magic(x, packed, scale, zp, group_size, zp_domain):
        calls.append(("magic", x.shape[0]))
        return kernels._int4_wo_matmul_xla(
            x, packed, scale, zp, group_size, zp_domain, "magic")

    def rec_halves(x, packed, scale, zp, group_size, zp_domain):
        calls.append(("halves", x.shape[0]))
        return kernels._int4_wo_matmul_xla(
            x, packed, scale, zp, group_size, zp_domain, "halves")

    monkeypatch.setattr(pk, "int4_wo_magic_pallas", rec_magic)
    monkeypatch.setattr(pk, "int4_wo_matmul_pallas", rec_halves)
    monkeypatch.setattr(kernels, "_BACKEND", "pallas")
    return calls


CFG = llama.LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=4,
                        n_kv_heads=2, ffn_dim=512, tie_embeddings=True)


def _qparams():
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    return ao_tpu.quantize_(params, ao_tpu.Int4WeightOnlyConfig(group_size=32))


def test_gate_constant_matches_kernels_source():
    """The audit's threshold must equal the dispatch's."""
    import inspect

    src = inspect.getsource(kernels.int4_wo_matmul)
    assert f"x.shape[0] <= {GATE_M}" in src


def test_oneshot_generate_prefill_gated(record_pallas_calls):
    from ao_tpu.serving.decode import generate

    qp = _qparams()
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, GATE_M + 16), 0,
                                CFG.vocab_size)
    toks = generate(qp, prompt, CFG, 2, GATE_M + 64)
    assert toks.shape == (1, 2)
    offered = [m for _, m in record_pallas_calls]
    assert offered, "pallas dispatch never exercised (decode M)"
    assert max(offered) <= GATE_M, (
        f"fused int4-WO kernel offered prefill M={max(offered)} > {GATE_M}")


def test_engine_bucketed_and_chunked_prefill_gated(record_pallas_calls):
    from ao_tpu.serving.engine import Engine, ServeConfig

    qp = _qparams()
    eng = Engine(qp, CFG, ServeConfig(
        max_batch=2, max_seq=4096, prefill_buckets=(2048,), eos_id=-1))
    # bucketed prefill: a 1.5k prompt pads into the 2048 bucket (M=2048);
    # max_new_tokens > 1 so decode steps run (they exercise the pallas
    # offer at M=batch)
    eng.submit(list(range(1500)), max_new_tokens=3)
    # chunked prefill: longer than the largest bucket
    eng.submit(list(range(2500)), max_new_tokens=3)
    eng.run()
    offered = [m for _, m in record_pallas_calls]
    assert offered, "pallas dispatch never exercised"
    assert max(offered) <= GATE_M, (
        f"fused int4-WO kernel offered prefill M={max(offered)} > {GATE_M}")
