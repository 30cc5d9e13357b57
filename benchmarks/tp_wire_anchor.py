"""Anchor the TP wire model on REAL v5e HLO via topology AOT compilation.

The CPU-mesh dryrun cannot anchor wire byte counts honestly: XLA:CPU
legalizes bf16 collectives by widening payloads to f32 and f8 to f16, so
the round-4 anchor recorded 4.0 B/elem for what the TPU actually ships as
bf16 — and the scaling projection failed its >=85% target on a backend
artifact. The axon PJRT plugin supports
``jax.experimental.topologies.get_topology_desc("tpu", "v5e:2x4")``, so we
can AOT-compile the explicit-TP forward (ao_tpu.parallel.tp_llama — bf16
all-to-all reduce-scatter + fp8 all-gather, cast-before-comm like the
reference's float8_tensor_parallel.py:42,107,170) for a real 8-chip v5e
topology and read the collective payloads out of the partitioned TPU HLO.

Asserts on the v5e-8 HLO:
  * every all-to-all payload is bf16 (2 B/elem)
  * the wire-reduce all-gathers are f8e4m3fn (1 B/elem)
  * all-reduces carry only the tiny f32 per-token fp8 scales

Writes benchmarks/results/tp_wire_anchor.json for
benchmarks/scaling_projection.py to consume. Run (chip/tunnel env):
    python benchmarks/tp_wire_anchor.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.parallel import tp_llama
from ao_tpu.parallel.hlo_stats import collective_summary
from ao_tpu.parallel.sharding import param_pspecs

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "tp_wire_anchor.json")


def compile_and_summarize(dp: int, tp: int, gather_logits: bool):
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    mesh = Mesh(np.array(topo.devices).reshape(dp, tp), ("dp", "tp"))
    # dims chosen so the magic int4 layout's 4-group word blocks stay
    # aligned with an 8-way K shard ((K/g) % (4*tp) == 0 for the
    # row-parallel wo/w2) — the bench builds abstract shards directly and
    # must respect the same constraint shard_params enforces by repacking
    cfg = llama.LlamaConfig(
        vocab_size=2048, dim=1024, n_layers=2, n_heads=8, n_kv_heads=8,
        ffn_dim=2048, tie_embeddings=True)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = ao_tpu.quantize_(params,
                               ao_tpu.Int4WeightOnlyConfig(group_size=32))
    specs = param_pspecs(qparams, "tp")
    qleaves, treedef = jax.tree.flatten(qparams)
    # flatten_up_to keeps each PartitionSpec whole (P is a tuple subclass,
    # so a naive tree.leaves(specs) would shred it and scramble the zip)
    sleaves = treedef.flatten_up_to(specs)
    absq = treedef.unflatten([
        jax.ShapeDtypeStruct(l.shape, l.dtype,
                             sharding=NamedSharding(mesh, s))
        for l, s in zip(qleaves, sleaves)])
    batch, seq = 8, 16
    abst = jax.ShapeDtypeStruct((batch, seq), jnp.int32,
                                sharding=NamedSharding(mesh, P("dp", None)))

    def run(p, t):
        def body(pl, tl):
            logits, _ = tp_llama.tp_forward_local(
                pl, tl, cfg, wire="fp8", gather_logits=gather_logits)
            if not gather_logits:
                return tp_llama.tp_greedy_token(logits, "tp")
            return logits

        return jax.shard_map(
            body, mesh=mesh, in_specs=(specs, P("dp", None)),
            out_specs=P("dp", None) if not gather_logits
            else P("dp", None, None),
            check_vma=False)(p, t)

    hlo = jax.jit(run).lower(absq, abst).compile().as_text()
    summary = collective_summary(hlo)
    t_local, d = batch // dp * seq, cfg.dim
    return cfg, t_local, d, summary


def check_and_normalize(cfg, t, d, summary, tp):
    """Assert wire dtypes on the TPU HLO and reduce to a per-layer model."""
    L = cfg.n_layers
    a2a = summary["all-to-all"]
    assert set(a2a["by_dtype"]) == {"bf16"}, (
        f"all-to-all payload must be bf16 on the wire: {a2a['by_dtype']}")
    # 2 per layer + 1 for the vocab-parallel embedding reduce
    assert a2a["count"] == 2 * L + 1, a2a
    a2a_bpe = a2a["bytes"] / a2a["count"] / (t * d)

    ag = summary["all-gather"]
    f8 = ag["by_dtype"].get("f8e4m3fn", 0)
    assert f8 > 0.5 * ag["bytes"] or ag["by_dtype"].get("bf16", 0) > 0, ag
    n_f8_ag = 2 * L + 1
    ag_bpe = f8 / n_f8_ag / (t * d)
    assert 0.9 <= ag_bpe <= 1.1, (
        f"fp8 all-gather should cost ~1 B/elem, got {ag_bpe}")

    ar = summary.get("all-reduce", {"count": 0, "bytes": 0, "by_dtype": {}})
    # scale reductions only: f32 per-token scalars, not activations
    ar_per_tok = ar["bytes"] / max(ar["count"], 1) / t
    assert ar_per_tok <= 8.0, (
        f"all-reduce carries {ar_per_tok} B/token — a widened activation "
        f"payload leaked back in")

    other_ag = ag["bytes"] - f8  # logits gather (bf16) or none
    return {
        "tp": tp,
        "hlo_collectives": summary,
        "per_layer": {
            "all_to_all": {"count": 2, "bytes_per_elem": round(a2a_bpe, 3),
                           "wire_factor": "(n-1)/n"},
            "all_gather_fp8": {"count": 2, "bytes_per_elem": round(ag_bpe, 3),
                               "wire_factor": "(n-1)/n"},
            "scale_allreduce": {"count": 2,
                                "bytes_per_token": round(ar_per_tok, 2),
                                "wire_factor": "2(n-1)/n"},
        },
        "per_step": {
            # embedding wire-reduce = one extra per-layer set
            "embed_sets": 1,
            "other_allgather_bytes": other_ag,
        },
        "tokens_local": t,
        "dim": d,
        "n_layers": L,
    }


def main():
    rows = {}
    # dp4 x tp2: matches the dryrun mesh; dp1 x tp8: the BASELINE 8-chip TP
    for dp, tp in ((4, 2), (1, 8)):
        cfg, t, d, summary = compile_and_summarize(dp, tp,
                                                   gather_logits=False)
        rows[f"dp{dp}xtp{tp}"] = check_and_normalize(cfg, t, d, summary, tp)
    out = {
        "metric": "TP wire anchor (real v5e-8 topology AOT HLO)",
        "wire_design": "bf16 all-to-all reduce-scatter + fp8 all-gather "
                       "(cast-before-comm) + vocab-parallel greedy sampling",
        "anchors": rows,
        "value": rows["dp1xtp8"]["per_layer"]["all_to_all"]["bytes_per_elem"],
        "unit": "B/elem on the all-to-all wire (bf16=2.0; was 4.0 f32 "
                "under the promoted all-reduce)",
        "vs_baseline": None,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write(json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "anchors"}))
    print(f"anchor written to {OUT}")


if __name__ == "__main__":
    main()
