"""Distributed composition: pipeline-parallel int4 stages x data parallel,
plus a TP-sharded serving engine — all validated on a virtual CPU mesh.

python examples/distributed_pipeline.py   (works with no TPU: 8 CPU devices)

On a real pod, drop the CPU forcing and build the mesh over jax.devices();
nothing else changes — that is the point of the pytree/pjit design.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.ops.linear import linear
from ao_tpu.parallel.pipeline import (
    pipeline_apply, shard_stage_params, stack_stage_params,
)
from ao_tpu.parallel.sharding import make_mesh, shard_params
from ao_tpu.serving.engine import Engine, ServeConfig
from jax.sharding import PartitionSpec as P


def pipeline_demo():
    """4 pipeline stages of int4-quantized residual blocks x dp=2, with a
    GPipe backward pass through the same schedule."""
    S, dp, d, hidden, n_mb = 4, 2, 256, 512, 8
    mesh = make_mesh((S, dp), ("pp", "dp"))

    stages = []
    for i in range(S):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i))
        stages.append({
            "w1": jax.random.normal(k1, (d, hidden), jnp.float32) * 0.05,
            "w2": jax.random.normal(k2, (hidden, d), jnp.float32) * 0.05,
        })
    qstages = [ao_tpu.quantize_(s, ao_tpu.Int4WeightOnlyConfig(group_size=64))
               for s in stages]
    stacked = shard_stage_params(stack_stage_params(qstages), mesh)

    def block(sp, x):
        return x + linear(jnp.tanh(linear(x, sp["w1"])), sp["w2"])

    mbs = jax.random.normal(jax.random.PRNGKey(99), (n_mb, dp * 2, d),
                            jnp.float32)
    out = jax.jit(lambda sp, x: pipeline_apply(
        block, sp, x, mesh, mb_spec=P(None, "dp", None)))(stacked, mbs)
    print(f"pipeline fwd: {n_mb} microbatches through {S} int4 stages x "
          f"dp={dp} -> {out.shape}, utilization {n_mb}/{n_mb + S - 1} = "
          f"{n_mb / (n_mb + S - 1):.0%}")

    # GPipe training: grad through the schedule (remat = re-forward memory)
    fstacked = shard_stage_params(stack_stage_params(stages), mesh)

    @jax.jit
    def grads(sp):
        return jax.grad(lambda sp: jnp.sum(pipeline_apply(
            block, sp, mbs, mesh, mb_spec=P(None, "dp", None),
            remat=True) ** 2))(sp)

    g = grads(fstacked)
    print("GPipe backward: grad leaves", [l.shape for l in jax.tree.leaves(g)])


def tp_serving_demo():
    """The SAME engine code serves TP-sharded quantized params — XLA
    inserts the collectives from the shardings."""
    cfg = llama.LlamaConfig(vocab_size=512, dim=128, n_layers=2, n_heads=4,
                            n_kv_heads=2, ffn_dim=256, tie_embeddings=True)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = ao_tpu.quantize_(params,
                               ao_tpu.Int4WeightOnlyConfig(group_size=32))
    mesh = make_mesh((1, 2), ("dp", "tp"))
    with mesh:
        eng = Engine(shard_params(qparams, mesh), cfg, ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(8,),
            kv_quant="int4"))  # int4 weights AND int4 KV, TP-sharded
        eng.submit([1, 2, 3, 4], 8)
        done = eng.run()
    print("tp=2 int4-weights int4-KV serving:", done[0].generated)


if __name__ == "__main__":
    pipeline_demo()
    tp_serving_demo()
