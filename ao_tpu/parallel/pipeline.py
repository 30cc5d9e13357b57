"""GPipe-style pipeline parallelism over a mesh axis.

(SURVEY §2.7: the reference has NO pipeline parallelism of its own — PP is
delegated to torchtitan — so this module is beyond-parity capability a
production TPU stack needs alongside dp/tp/sp/ep. TPU-native design: stage
weights are STACKED along a new leading axis sharded over the ``pp`` mesh
axis, so inside ``shard_map`` each device holds exactly its stage's slice.
The schedule is one ``lax.scan`` of length M + S - 1 (M microbatches, S
stages): each step every stage applies its block to the activation on hand,
then the activation ``ppermute``s to the next stage — a software systolic
loop whose ICI transfer XLA's latency-hiding scheduler overlaps with the
block compute. ``jax.grad`` straight through the scan gives the GPipe
backward (the transpose of ``ppermute`` is the reverse permute) with no
bespoke schedule code; ``remat=True`` checkpoints each stage application so
saved activation memory is one block-input per live microbatch — GPipe's
re-forward strategy. Quantized stage params pipeline unchanged: Int4/Int8/
fp8/NF4 containers are pytrees, so stacking and pp-sharding apply leaf-wise
and each stage runs the same fused Pallas kernels it would run unsharded.)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(stage_params: Sequence[Any]) -> Any:
    """Stack per-stage parameter pytrees along a new leading ``stage`` axis.

    All stages must share a tree structure and per-leaf shapes (the usual
    homogeneous-transformer-blocks case). Quantized containers stack too:
    their qdata/scale leaves gain the stage axis while static metadata
    (dtype names, group sizes) must already agree across stages.
    """
    return jax.tree.map(lambda *ls: jnp.stack(ls), *stage_params)


def stage_pspecs(stacked_params: Any, axis_name: str = "pp") -> Any:
    """PartitionSpecs placing the leading stage axis of every leaf on
    ``axis_name`` (everything else replicated — compose with tp by editing
    individual specs)."""
    return jax.tree.map(
        lambda l: P(axis_name, *([None] * (l.ndim - 1))), stacked_params
    )


def shard_stage_params(stacked_params: Any, mesh: Mesh,
                       axis_name: str = "pp") -> Any:
    """Device-put the stacked stage params with the stage axis on ``axis_name``."""
    return jax.tree.map(
        lambda l, s: jax.device_put(l, NamedSharding(mesh, s)),
        stacked_params, stage_pspecs(stacked_params, axis_name),
    )


def pipeline_stage_loop(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    microbatches: jax.Array,
    axis_name: str = "pp",
    remat: bool = False,
) -> jax.Array:
    """The pipeline schedule — call INSIDE ``shard_map`` with the leading
    axis of every ``stacked_params`` leaf sharded on ``axis_name``.

    ``stage_fn(params_i, x) -> y`` must preserve the activation shape/dtype
    (standard for transformer blocks). ``microbatches`` is (M, mb, ...) and
    must be identical on every pp rank (replicated in_spec, or sharded only
    along non-pp axes). Returns the last stage's outputs (M, mb, ...),
    replicated across the pp axis.

    Utilization is M / (M + S - 1); use M >= S microbatches to amortize the
    pipeline bubble.
    """
    S = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    last = S - 1
    M = microbatches.shape[0]
    perm = [(i, (i + 1) % S) for i in range(S)]

    # this device's stage slice (leading stacked dim is 1 under shard_map)
    params = jax.tree.map(lambda l: l[0], stacked_params)
    fn = jax.checkpoint(stage_fn) if remat else stage_fn

    state = jnp.zeros_like(microbatches[0])
    outs = jnp.zeros_like(microbatches)

    def step(carry, t):
        state, outs = carry
        # stage 0 ingests microbatch t while it exists; later stages keep
        # the activation that just arrived on the ring
        feed = jax.lax.dynamic_index_in_dim(
            microbatches, jnp.minimum(t, M - 1), 0, keepdims=False)
        x = jnp.where(stage == 0, feed, state)
        y = fn(params, x)
        # the last stage emits microbatch t-(S-1) once the fill completes
        oidx = jnp.clip(t - last, 0, M - 1)
        collect = jnp.logical_and(stage == last, t >= last)
        cur = jax.lax.dynamic_index_in_dim(outs, oidx, 0, keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(collect, y, cur), oidx, 0)
        state = jax.lax.ppermute(y, axis_name, perm)
        return (state, outs), None

    (_, outs), _ = jax.lax.scan(step, (state, outs), jnp.arange(M + last))
    # replicate the collected outputs (held by the last stage) to all ranks
    return jax.lax.psum(
        jnp.where(stage == last, outs, jnp.zeros_like(outs)), axis_name)


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    microbatches: jax.Array,
    mesh: Mesh,
    axis_name: str = "pp",
    mb_spec: Optional[P] = None,
    remat: bool = False,
) -> jax.Array:
    """Run (M, mb, ...) microbatches through the S-stage pipeline on ``mesh``.

    Wraps :func:`pipeline_stage_loop` in ``shard_map``. ``mb_spec`` shards
    the microbatch array over OTHER mesh axes (e.g. ``P(None, "dp")`` to
    data-shard each microbatch while stages pipeline over pp); it must not
    mention ``axis_name``. Differentiable — take ``jax.grad`` of a loss on
    the returned outputs for GPipe training.
    """
    S = mesh.shape[axis_name]
    lead = jax.tree.leaves(stacked_params)[0].shape[0]
    if lead != S:
        raise ValueError(
            f"stacked stage axis is {lead} but mesh axis {axis_name!r} has "
            f"{S} devices")
    mb_spec = mb_spec if mb_spec is not None else P()
    for entry in mb_spec:
        names = entry if isinstance(entry, tuple) else (entry,)
        if axis_name in names:
            raise ValueError(f"mb_spec must not shard over {axis_name!r}")

    loop = functools.partial(
        pipeline_stage_loop, stage_fn, axis_name=axis_name, remat=remat)
    fn = jax.shard_map(
        loop, mesh=mesh,
        in_specs=(stage_pspecs(stacked_params, axis_name), mb_spec),
        out_specs=mb_spec,
        check_vma=False,
    )
    return fn(stacked_params, microbatches)


# ---------------------------------------------------------------------------
# Flagship-model helper: pipeline the Llama block stack
# ---------------------------------------------------------------------------

def split_llama_stages(params, n_stages: int):
    """Split ``params["layers"]`` into ``n_stages`` equal stage chunks and
    stack them for :func:`pipeline_apply`: every leaf becomes
    (n_stages, layers_per_stage, ...). Quantized layer weights stack like
    any other pytree leaf. Embedding / final norm / lm head stay outside
    the pipeline (they are a tiny fraction of the FLOPs and run replicated
    or tp-sharded)."""
    layers = params["layers"]
    n_layers = len(layers)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible into "
                         f"{n_stages} stages")
    per = n_layers // n_stages
    stages = [
        jax.tree.map(lambda *ls: jnp.stack(ls), *layers[s * per:(s + 1) * per])
        for s in range(n_stages)
    ]
    return stack_stage_params(stages)


def llama_stage_fn(cfg):
    """stage_fn for :func:`pipeline_apply` applying one stage's stacked
    Llama blocks to (B, S, D) hidden states via ``lax.scan`` (full-sequence
    forward: pipeline parallelism targets training / prefill; decode uses
    tp + the fused kernels)."""
    from ao_tpu.models import llama

    def fn(stage_layers, x):
        b, s, _ = x.shape
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        freqs = llama.rope_freqs(cfg)
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]

        def body(x, layer):
            h = llama.rms_norm(x, layer["ln1"], cfg.norm_eps)
            attn_out, _ = llama.attention(
                layer["attn"], h, cfg, positions, freqs, mask)
            x = x + attn_out
            h = llama.rms_norm(x, layer["ln2"], cfg.norm_eps)
            return x + llama.mlp(layer["mlp"], h, cfg), None

        x, _ = jax.lax.scan(body, x, stage_layers)
        return x

    return fn


def pipeline_llama_forward(params, stacked_stages, tokens, cfg, mesh,
                           axis_name: str = "pp",
                           mb_spec: Optional[P] = None,
                           remat: bool = False):
    """Full-sequence Llama forward with the block stack pipelined:
    ``tokens`` (M, B, S) microbatches → logits (M, B, S, V). Embedding and
    head run outside the pipeline on every rank; the S-stage schedule only
    carries the (B, S, D) hidden state around the ring. Differentiable —
    wrap in a loss for GPipe pipeline training."""
    from ao_tpu.models import llama
    from ao_tpu.ops.embedding import embedding as embedding_op
    from ao_tpu.ops.linear import linear
    from ao_tpu.quantization.qarrays.base import QuantizedArray

    m, b, s = tokens.shape
    x = jax.vmap(lambda t: embedding_op(params["embed"], t,
                                        out_dtype=cfg.dtype))(tokens)
    hid_spec = mb_spec if mb_spec is not None else P()
    x = pipeline_apply(llama_stage_fn(cfg), stacked_stages, x, mesh,
                       axis_name=axis_name, mb_spec=hid_spec, remat=remat)
    x = llama.rms_norm(x, params["norm"], cfg.norm_eps)
    if cfg.tie_embeddings:
        emb = params["embed"]
        table = (emb.dequantize(cfg.dtype)
                 if isinstance(emb, QuantizedArray) else emb)
        logits = linear(x, table.T)
    else:
        logits = linear(x, params["lm_head"])
    return logits.astype(jnp.float32)
