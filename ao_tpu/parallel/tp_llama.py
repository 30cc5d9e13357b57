"""Explicit wire-format tensor-parallel Llama forward.

The auto-sharded (GSPMD) TP forward is correct but lets the compiler pick
the collective payload format — and XLA's all-reduce promotion pass widens
the bf16 partial-sum all-reduces to f32 on the wire (4 B/elem measured in
the dryrun's HLO anchor), which fails the >=85% @ 8 chips scaling target
(projected 0.764). This module is the cast-before-comm redesign
(ref: float8_tensor_parallel.py:42,107 ``Float8ColwiseParallel``/
``Float8RowwiseParallel``, :170 ``PrepareFloat8ModuleInput`` — the
reference's entire fp8-TP design exists to control the wire format):

  * Megatron structure: wq/wk/wv/w1/w3 column-sharded, wo/w2 row-sharded,
    embedding vocab-sharded, lm_head vocab-sharded.
  * Each row-parallel partial sum is reduced by
    :func:`ao_tpu.parallel.collectives.reduce_gather_wire`: a bf16
    all-to-all reduce-scatter (all-to-all is pure data movement, so no
    backend promotion can widen the payload) + an fp8 all-gather of the
    summed chunks. 3 B/elem on the wire vs the promoted all-reduce's 8.
  * Attention/MLP compute is UNCHANGED — same `ao_tpu.ops.linear` entry
    points, so quantized (int4/int8/fp8) weight shards take the same
    kernels as the single-chip path.

Used by ``__graft_entry__.dryrun_multichip`` to anchor
``benchmarks/results/collective_stats.json`` (consumed by
``benchmarks/scaling_projection.py``) and tested for numerics + payload
dtypes on the 8-device CPU mesh in ``tests/test_tp_wire.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ao_tpu.parallel.collectives import reduce_gather_wire
from ao_tpu.parallel.sharding import (
    DEFAULT_TP_RULES, _match_rule, param_pspecs, shard_params,
)
from ao_tpu.quantization.qarrays.base import QuantizedArray
from ao_tpu.quantization.quantize import path_to_fqn


def _localize_metadata(params: Any, n: int,
                       rules=DEFAULT_TP_RULES) -> Any:
    """Fix up QuantizedArray ``_shape`` metadata for the per-device view
    inside shard_map: the field arrays arrive as local shards but the
    static logical shape still claims the global size."""

    def fix(path, leaf):
        if not isinstance(leaf, QuantizedArray):
            return leaf
        fqn = path_to_fqn(path)
        kind = _match_rule(fqn, rules)
        shape = list(leaf.shape)
        if kind == "col":
            shape[-1] //= n
        elif kind == "row":
            shape[-2] //= n
        else:
            return leaf
        return leaf.replace(_shape=tuple(shape))

    return jax.tree_util.tree_map_with_path(
        fix, params, is_leaf=lambda x: isinstance(x, QuantizedArray))


def _local_cfg(cfg, n: int):
    assert cfg.n_heads % n == 0 and cfg.n_kv_heads % n == 0, (
        f"heads ({cfg.n_heads}/{cfg.n_kv_heads}) must divide tp={n}")
    return dataclasses.replace(
        cfg, n_heads=cfg.n_heads // n, n_kv_heads=cfg.n_kv_heads // n,
        qk_head_dim=cfg.head_dim)


def _vocab_parallel_embed(table, tokens: jax.Array, tp_axis: str,
                          out_dtype) -> jax.Array:
    """Masked local lookup on a vocab-sharded table -> per-device partial
    (invalid rows contribute zeros; the wire reduce completes the sum)."""
    from ao_tpu.ops.embedding import embedding as embedding_op

    v_local = table.shape[0]
    off = jax.lax.axis_index(tp_axis) * v_local
    local = tokens - off
    valid = (local >= 0) & (local < v_local)
    x = embedding_op(table, jnp.clip(local, 0, v_local - 1),
                     out_dtype=out_dtype)
    return x * valid[..., None].astype(x.dtype)


def _wire(partial: jax.Array, tp_axis: str, wire: str) -> jax.Array:
    b, s, d = partial.shape
    out = reduce_gather_wire(partial.reshape(b * s, d), tp_axis, wire=wire)
    return out.reshape(b, s, d)


def tp_greedy_token(logits_local: jax.Array, tp_axis: str) -> jax.Array:
    """Greedy sampling over vocab-SHARDED logits (B, S, V/n) without ever
    gathering the full logits row: per-shard (max, argmax), then an
    all-gather of n tiny (B, S) pairs and a global argmax — for V=128k at
    tp=8 this is ~2000x fewer wire bytes than gathering logits (Megatron
    vocab-parallel sampling). Returns global token ids (B, S) int32."""
    n = jax.lax.axis_size(tp_axis)
    v_local = logits_local.shape[-1]
    local_max = jnp.max(logits_local, axis=-1)
    local_arg = jnp.argmax(logits_local, axis=-1).astype(jnp.int32)
    maxes = jax.lax.all_gather(local_max, tp_axis, axis=0)   # (n, B, S)
    args = jax.lax.all_gather(local_arg, tp_axis, axis=0)
    win = jnp.argmax(maxes, axis=0)                          # (B, S)
    arg = jnp.take_along_axis(args, win[None], axis=0)[0]
    return win.astype(jnp.int32) * v_local + arg


def tp_forward_local(params, tokens: jax.Array, cfg, *, tp_axis: str = "tp",
                     wire: str = "fp8", use_flash: bool = False,
                     positions: Optional[jax.Array] = None,
                     kv_caches: Optional[list] = None,
                     cache_index=None, gather_logits: bool = True):
    """The per-device body (call INSIDE shard_map over ``tp_axis``).

    params: local shards (Megatron layout per DEFAULT_TP_RULES);
    tokens (B_local, S). Returns replicated logits (B_local, S, V) — or
    vocab-SHARDED logits (B, S, V/n) when ``gather_logits=False`` (decode
    serving: sample with :func:`tp_greedy_token` instead of paying a
    B x V x 2B gather per step).
    """
    from ao_tpu.models import llama

    n = jax.lax.axis_size(tp_axis)
    params = _localize_metadata(params, n)
    lcfg = _local_cfg(cfg, n)
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    freqs = llama.rope_freqs(cfg)

    x = _wire(_vocab_parallel_embed(params["embed"], tokens, tp_axis,
                                    cfg.dtype),
              tp_axis, wire).astype(cfg.dtype)

    if kv_caches is None:
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        new_caches = None
    else:
        c0 = kv_caches[0][0]
        t = c0.max_seq if hasattr(c0, "max_seq") else c0.shape[1]
        key_pos = jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
        mask = key_pos <= positions[:, None, :, None]
        new_caches = []

    for i, layer in enumerate(params["layers"]):
        h = llama.rms_norm(x, layer["ln1"], cfg.norm_eps)
        attn_partial, new_c = llama.attention(
            layer["attn"], h, lcfg, positions, freqs, mask,
            kv_cache=None if kv_caches is None else kv_caches[i],
            cache_index=cache_index, use_flash=use_flash)
        x = x + _wire(attn_partial, tp_axis, wire).astype(x.dtype)
        h = llama.rms_norm(x, layer["ln2"], cfg.norm_eps)
        x = x + _wire(llama.mlp(layer["mlp"], h, lcfg), tp_axis,
                      wire).astype(x.dtype)
        if new_caches is not None:
            new_caches.append(new_c)

    x = llama.rms_norm(x, params["norm"], cfg.norm_eps)
    if cfg.tie_embeddings:
        emb = params["embed"]
        if isinstance(emb, QuantizedArray):
            w_head = emb.dequantize(cfg.dtype).T
        else:
            w_head = emb.T
        logits = jnp.matmul(x, w_head.astype(x.dtype))
    else:
        from ao_tpu.ops import linear

        logits = linear(x, params["lm_head"])
    if not gather_logits:
        return logits.astype(jnp.float32), new_caches
    # vocab-sharded logits -> replicated, one bf16 gather per step
    logits = jax.lax.all_gather(
        logits.astype(jnp.bfloat16), tp_axis, axis=logits.ndim - 1,
        tiled=True)
    return logits.astype(jnp.float32), new_caches


def tp_shard_llama_params(params, mesh: Mesh, tp_axis: str = "tp"):
    """Megatron-shard a (possibly quantized) Llama param tree onto the
    mesh (DEFAULT_TP_RULES: wq/wk/wv/w1/w3 col, wo/w2 row, embed vocab)."""
    return shard_params(params, mesh, tp_axis)


def tp_forward(params_sharded, tokens, cfg, mesh: Mesh, *,
               dp_axis: str = "dp", tp_axis: str = "tp", wire: str = "fp8",
               use_flash: bool = False):
    """jit-able explicit-TP forward over a (dp, tp) mesh. ``params_sharded``
    from :func:`tp_shard_llama_params`; tokens sharded on ``dp_axis``.
    Returns replicated-on-tp logits (B, S, V) f32."""
    specs = param_pspecs(params_sharded, tp_axis)

    def body(p, toks):
        logits, _ = tp_forward_local(p, toks, cfg, tp_axis=tp_axis,
                                     wire=wire, use_flash=use_flash)
        return logits

    shmap = jax.shard_map(
        body, mesh=mesh,
        in_specs=(specs, P(dp_axis, None)),
        out_specs=P(dp_axis, None, None),
        check_vma=False,
    )
    return shmap(params_sharded, tokens)
