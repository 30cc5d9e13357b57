"""Analytic multi-chip scaling projection for int4-WO Llama decode.

One real chip is available in this environment, so the BASELINE target
(≥85% scaling efficiency 1 chip → host → multi-host) cannot be measured
directly; this benchmark models it honestly from MEASURED single-chip
numbers plus the ICI/DCN link specs — the "How to Scale Your Model"
recipe: per-chip HBM time shrinks with the TP shard, each layer pays one
all-reduce of the activation over the TP ring.

Model (Llama decode, batch B, TP over n chips on one host):
  * weight-streaming time  = measured single-chip decode-step device time
    × (1/n)   [weights and KV are the streamed bytes; both shard over n]
  * per-layer collective   = 2 rings of (B × dim × 2B) bytes over ICI
    (reduce-scatter + all-gather of the attention and MLP partial sums),
    latency-hidden only partially: we charge the full wire time
  * host boundary (n > 8)  = the DCN hop multiplies link time by
    ici_gbps / dcn_gbps for the outer axis

Run: python benchmarks/scaling_projection.py   (one chip, ~2 min)
Prints one JSON line with projected efficiency per chip count.
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
from ao_tpu.models import llama
from ao_tpu.utils.roofline import detect_tpu_spec
from ao_tpu.utils.timing import device_time_us

DCN_GBPS = 25.0  # per-host DCN bandwidth, conservative


def measure_single_chip_step():
    """Measured device time of one int4-WO decode step (4-layer 8B dims,
    batch 8) — the unit the projection scales."""
    cfg = llama.LlamaConfig(
        vocab_size=32000, dim=4096, n_layers=4, n_heads=32, n_kv_heads=8,
        ffn_dim=14336, tie_embeddings=True,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qp = ao_tpu.quantize_({"p": params},
                          ao_tpu.Int4WeightOnlyConfig(group_size=128))["p"]
    del params
    caches = llama.init_kv_caches(cfg, 8, 1024)
    pos = jnp.full((8, 1), 100, jnp.int32)
    f = jax.jit(lambda p, c, t: llama.forward(
        p, t, cfg, positions=pos, kv_caches=c,
        cache_index=jnp.full((8,), 100, jnp.int32))[0])
    tok = jnp.ones((8, 1), jnp.int32)
    mut = lambda a, i: (a[0], a[1], (a[2] + i) % 100 + 1)
    us = device_time_us(f, qp, caches, tok, iters=3, mutate=mut)
    return us, cfg


def load_hlo_anchor():
    """Collective structure extracted from the compiled TP forward by
    ``dryrun_multichip`` (per-step all-reduce count per layer + payload
    bytes/elem). When present, the projection's formula is ANCHORED: the
    per-layer collective count and payload element size come from the
    compiler's own output, not this file's assumptions."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "collective_stats.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        st = json.load(f)
    # cross-check: the dryrun's own formula must reproduce the HLO payload
    c = st["cfg"]
    elems = c["batch_local"] * c["seq"] * c["dim"]
    per_ar = st["per_allreduce_payload_bytes"]
    assert 1.0 <= per_ar / elems <= 4.5, st
    return {
        "allreduce_per_layer": st["allreduce_per_layer"],
        "bytes_per_elem": st["payload_bytes_per_elem"],
        "source": path,
    }


def project(step_us, cfg, batch=8, anchor=None):
    spec = detect_tpu_spec()
    # per-layer collective structure: HLO-anchored when the dryrun has
    # recorded it, else the analytic default (2 all-reduces of bf16
    # activations per layer)
    ar_per_layer = anchor["allreduce_per_layer"] if anchor else 2.0
    bytes_per_elem = anchor["bytes_per_elem"] if anchor else 2.0
    rows = {}
    for n in (1, 2, 4, 8, 16, 32):
        compute_us = step_us / n
        # each all-reduce moves B*dim*bytes_per_elem payload around the
        # ring: ring all-reduce wire bytes ≈ 2*(n-1)/n * size
        size = batch * cfg.dim * bytes_per_elem
        wire = 2 * (n - 1) / n * size
        link_gbps = spec.ici_gbps if n <= 8 else DCN_GBPS
        coll_us = cfg.n_layers * ar_per_layer * wire / (link_gbps * 1e3)
        total = compute_us + coll_us
        eff = step_us / (n * total)
        rows[n] = {"step_us": round(total, 1),
                   "collective_us": round(coll_us, 1),
                   "efficiency": round(eff, 3)}
    return spec.name, rows


def main():
    anchor = load_hlo_anchor()
    step_us, cfg = measure_single_chip_step()
    name, rows = project(step_us, cfg, anchor=anchor)
    ok8 = rows[8]["efficiency"] >= 0.85
    print(json.dumps({
        "metric": "projected TP scaling efficiency (int4-WO decode)",
        "measured_1chip_step_us": round(step_us, 1),
        "chip_spec": name,
        "hlo_anchor": anchor or "none (run dryrun_multichip first)",
        "projection": rows,
        "meets_85pct_at_8_chips": ok8,
    }))


if __name__ == "__main__":
    main()
