"""PAT: pruning-aware training via proximal gradient methods.

(ref: torchao/prototype/pat/ — ``PruneOptimizer`` wraps a base torch
optimizer and, after each step, applies a proximal map that induces
structured sparsity (Lasso / group Lasso) or low-rank structure (nuclear
norm) directly during training, with a warmup phase, cumulative-step-size
regularization ("AProx", optim/pruneopt.py:199 ``gamma += lr``), optional
hard minimum-sparsity / N:M constraints with a cubic ramp
(optim/pruneopt.py:163), and a final "healing" phase where the pruned mask
freezes and the survivors keep training.

TPU re-design: an optax transformation in the style of
``parq_optimizer`` — the proximal map is pure pytree arithmetic fused into
the update (``new_p = prox(p + inner_update)``; emitted update =
``new_p - p``), the phase logic is branch-free ``jnp.where`` on the step
counter so the whole train step stays inside one jit, and rules are routed
by fqn regex exactly like ``FqnToConfig``/sharding rules instead of torch
param_groups.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

PROX_TYPES = ("lasso", "group_lasso", "nuclear_norm", "min_sparsity",
              "min_rank", "nm_sparse")
GROUP_TYPES = ("elem", "layer", "dim0", "dim1", "heads", "kelem")


@dataclasses.dataclass(frozen=True)
class PruneRule:
    """How one family of parameters is pruned.

    prox: proximal map —
      * ``lasso``          soft-threshold each element (unstructured)
      * ``group_lasso``    shrink whole groups by ``max(0, 1-τλγ/‖g‖)``
      * ``nuclear_norm``   soft-threshold singular values (low-rank)
      * ``min_sparsity``   hard constraint: zero the smallest groups until
                           ``min_sparsity`` of groups are zero (rms score)
      * ``min_rank``       hard constraint on singular values kept
      * ``nm_sparse``      N:M structured: keep ``n_nonzero`` largest
                           |elements| in every block of ``block_m`` along
                           the reduction (first) axis
    group: what a "group" is — ``elem`` (each element), ``layer`` (whole
      tensor), ``dim0``/``dim1`` (slices along that axis), ``heads``
      (dim1 split into ``num_heads``), ``kelem`` (flat chunks of ``k``).
      Ignored by the SVD and N:M proxes.
    """

    prox: str = "group_lasso"
    group: str = "dim1"
    reg_lambda: float = 0.0
    min_sparsity: Optional[float] = None
    min_sparsity_schedule: bool = False
    n_nonzero: int = 2
    block_m: int = 4
    num_heads: Optional[int] = None
    k: Optional[int] = None

    def __post_init__(self):
        if self.prox not in PROX_TYPES:
            raise ValueError(f"unknown prox {self.prox!r} (one of {PROX_TYPES})")
        if self.group not in GROUP_TYPES:
            raise ValueError(f"unknown group {self.group!r} (one of {GROUP_TYPES})")
        if self.prox in ("min_sparsity", "min_rank") and self.min_sparsity is None:
            raise ValueError(f"{self.prox} requires min_sparsity")


def _group_norms(p: jax.Array, rule: PruneRule) -> jax.Array:
    """Per-group L2 norms, shaped to broadcast against ``p``."""
    if rule.group == "elem":
        return jnp.abs(p)
    if rule.group == "layer":
        return jnp.sqrt(jnp.sum(p.astype(jnp.float32) ** 2))
    if rule.group == "dim0":
        axes = tuple(range(1, p.ndim))
        return jnp.sqrt(jnp.sum(p.astype(jnp.float32) ** 2, axis=axes,
                                keepdims=True))
    if rule.group == "dim1":
        axes = (0,) + tuple(range(2, p.ndim))
        return jnp.sqrt(jnp.sum(p.astype(jnp.float32) ** 2, axis=axes,
                                keepdims=True))
    if rule.group == "heads":
        h = rule.num_heads
        if h is None or p.shape[-1] % h:
            raise ValueError(f"heads grouper needs num_heads dividing "
                             f"{p.shape[-1]}")
        ph = p.reshape(-1, h, p.shape[-1] // h)
        n = jnp.sqrt(jnp.sum(ph.astype(jnp.float32) ** 2, axis=(0, 2)))
        return jnp.repeat(n, p.shape[-1] // h)[None, :]
    if rule.group == "kelem":
        k = rule.k
        if not k or p.size % k:
            raise ValueError(f"kelem grouper needs k dividing {p.size}")
        n = jnp.sqrt(jnp.sum(
            p.reshape(-1, k).astype(jnp.float32) ** 2, axis=1))
        return jnp.repeat(n, k).reshape(p.shape)
    raise ValueError(rule.group)


def _group_size(p: jax.Array, rule: PruneRule) -> float:
    return {
        "elem": 1,
        "layer": p.size,
        "dim0": p.size // p.shape[0],
        "dim1": p.size // p.shape[1] if p.ndim > 1 else 1,
        "heads": p.size // (rule.num_heads or 1),
        "kelem": rule.k or 1,
    }[rule.group]


def _apply_prox(p: jax.Array, rule: PruneRule, gamma: jax.Array) -> jax.Array:
    """One proximal step on ``p`` (pure).  ``gamma`` is the cumulative sum
    of learning rates (AProx, ref optim/pruneopt.py:199)."""
    f32 = p.astype(jnp.float32)
    if rule.prox in ("lasso", "group_lasso"):
        # group soft-threshold: p *= max(0, 1 - λ·τ·γ/‖group‖),
        # τ = sqrt(group size) (ref optim/group_lasso.py tau())
        norms = _group_norms(p, rule)
        tau = jnp.sqrt(float(_group_size(p, rule)))
        thresh = rule.reg_lambda * tau * gamma
        mult = jnp.maximum(1.0 - thresh / jnp.maximum(norms, 1e-30), 0.0)
        return (f32 * mult).astype(p.dtype)
    if rule.prox == "nuclear_norm":
        if p.ndim != 2:
            raise ValueError("nuclear_norm prox needs 2-D params")
        u, s, vt = jnp.linalg.svd(f32, full_matrices=False)
        s = jnp.maximum(s - rule.reg_lambda * gamma, 0.0)
        return (u @ (s[:, None] * vt)).astype(p.dtype)
    if rule.prox == "min_sparsity":
        # hard per-tensor constraint: zero the lowest-rms groups so that at
        # least ``min_sparsity`` of groups are zero (ref optim/min_sparsity.py)
        norms = _group_norms(p, rule)
        flat = norms.reshape(-1)
        cutoff = jnp.quantile(flat, jnp.clip(gamma, 0.0, 1.0))
        keep = norms > cutoff
        return (f32 * keep).astype(p.dtype)
    if rule.prox == "min_rank":
        if p.ndim != 2:
            raise ValueError("min_rank prox needs 2-D params")
        u, s, vt = jnp.linalg.svd(f32, full_matrices=False)
        n = s.shape[0]
        # zero the smallest ceil(min_sparsity·n) singular values
        idx = jnp.arange(n, dtype=jnp.float32)
        keep = idx < jnp.ceil((1.0 - jnp.clip(gamma, 0.0, 1.0)) * n)
        return (u @ ((s * keep)[:, None] * vt)).astype(p.dtype)
    if rule.prox == "nm_sparse":
        m, nnz = rule.block_m, rule.n_nonzero
        if p.ndim != 2 or p.shape[0] % m:
            raise ValueError(f"nm_sparse needs 2-D with dim0 % {m} == 0")
        blocks = jnp.abs(f32).reshape(p.shape[0] // m, m, p.shape[1])
        # rank of each element inside its block (descending |.|)
        order = jnp.argsort(-blocks, axis=1)
        ranks = jnp.argsort(order, axis=1)
        keep = (ranks < nnz).reshape(p.shape)
        return (f32 * keep).astype(p.dtype)
    raise ValueError(rule.prox)


def _hard(rule: PruneRule) -> bool:
    return rule.prox in ("min_sparsity", "min_rank", "nm_sparse")


def _ramped_target(rule: PruneRule, step, warmup: int, heal: int):
    """Cubic sparsity ramp 0→target ending at the last pruning step
    (ref optim/pruneopt.py:163 ``_effective_min_sparsity``)."""
    target = rule.min_sparsity if rule.min_sparsity is not None else 0.0
    if not rule.min_sparsity_schedule:
        return jnp.asarray(target, jnp.float32)
    t = (step - warmup) / max(heal - warmup, 1)
    t = jnp.clip(t.astype(jnp.float32), 0.0, 1.0)
    return target * (1.0 - (1.0 - t) ** 3)


class PruneState(NamedTuple):
    latent: optax.Params      # un-pruned master weights (the inner
    #                           optimizer updates THESE; visible = prox)
    inner: optax.OptState
    step: jax.Array
    gamma: jax.Array          # cumulative learning rate (AProx)
    masks: optax.Params       # healing masks (all-ones until heal start)


def prune_optimizer(
    inner: optax.GradientTransformation,
    rules: Union[PruneRule, dict],
    learning_rate: Union[float, Callable],
    warmup_steps: int = 0,
    healing_start_step: Optional[int] = None,
    prox_freq: int = 1,
) -> optax.GradientTransformation:
    """Wrap ``inner`` with PAT proximal pruning (ref: prototype/pat
    ``PruneOptimizer``).

    Like the reference (pruneopt.py:342-348 save/restore latent), the
    wrapped optimizer holds *latent* (un-pruned) master weights: the inner
    optimizer steps the latent from gradients taken at the pruned visible
    params, and each visible param is ``prox(latent, gamma)`` with the
    *cumulative* learning rate ``gamma`` (AProx) — the prox never
    compounds on an already-shrunk weight, so useful groups' latent norms
    outgrow the threshold while dead groups get cleanly zeroed.

    ``rules`` is a single :class:`PruneRule` applied to every ≥2-D float
    leaf, or a ``{regex: PruneRule}`` dict routed by fqn (first match wins,
    like the sharding rule table).  ``learning_rate`` must mirror the inner
    optimizer's schedule — optax bakes the lr into update magnitudes, so
    the AProx accumulator needs it re-stated here.

    Phases (all branch-free inside jit):
      step ≤ warmup_steps                 — plain inner updates
      warmup < step < healing_start_step  — prox every ``prox_freq`` steps
      step ≥ healing_start_step           — mask frozen: incoming grads of
        pruned coords are masked before the inner step (ref
        pruneopt.py:310-325) and survivors keep training
    """
    heal = healing_start_step if healing_start_step is not None else 2**31 - 1
    if warmup_steps >= heal:
        raise ValueError(f"{warmup_steps=} must be < {healing_start_step=}")
    lr_fn = learning_rate if callable(learning_rate) else (
        lambda _: jnp.asarray(learning_rate, jnp.float32))

    def rule_for(fqn: str, leaf) -> Optional[PruneRule]:
        if not (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)):
            return None
        if isinstance(rules, PruneRule):
            return rules
        for pat, rule in rules.items():
            if re.search(pat, fqn):
                return rule
        return None

    def _routed(params):
        from ao_tpu.quantization.quantize import path_to_fqn

        leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
        return [(path_to_fqn(path), leaf, rule_for(path_to_fqn(path), leaf))
                for path, leaf in leaves], treedef

    def init(params):
        routed, treedef = _routed(params)
        # scalar placeholder keeps the pytree structure identical to params
        masks = jax.tree_util.tree_unflatten(
            treedef,
            [jnp.ones_like(leaf, jnp.bool_) if rule is not None
             else jnp.ones((), jnp.bool_)
             for _, leaf, rule in routed])
        return PruneState(
            latent=jax.tree_util.tree_map(jnp.asarray, params),
            inner=inner.init(params),
            step=jnp.zeros((), jnp.int32),
            gamma=jnp.zeros((), jnp.float32),
            masks=masks,
        )

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("prune_optimizer requires params in update()")
        step = state.step + 1
        gamma = state.gamma + lr_fn(step)
        routed, treedef = _routed(params)
        mask_leaves = treedef.flatten_up_to(state.masks)
        grad_leaves = treedef.flatten_up_to(updates)

        in_warmup = step <= warmup_steps
        do_prox = jnp.logical_and(
            jnp.logical_and(~in_warmup, step < heal),
            jnp.logical_or(step % prox_freq == 0, step == heal - 1))
        healing = step >= heal

        # healing masks the incoming grads of pruned coords (ref
        # pruneopt.py:310-325 grad.masked_fill_)
        masked_grads = jax.tree_util.tree_unflatten(treedef, [
            jnp.where(healing, g * mask, g) if rule is not None else g
            for (fqn, p, rule), mask, g in
            zip(routed, mask_leaves, grad_leaves)])

        # during pruning the inner optimizer steps the LATENT weights;
        # during healing it steps the pruned visible weights (ref
        # pruneopt.py:325 "run base optimizer only during warmup/healing")
        latent_leaves = treedef.flatten_up_to(state.latent)
        base = jax.tree_util.tree_unflatten(treedef, [
            jnp.where(healing, p, lat) if rule is not None else lat
            for (fqn, p, rule), lat in zip(routed, latent_leaves)])
        inner_updates, inner_state = inner.update(
            masked_grads, state.inner, base)
        stepped_tree = optax.apply_updates(base, inner_updates)
        stepped_leaves = treedef.flatten_up_to(stepped_tree)

        new_upds, new_masks, new_lat = [], [], []
        for (fqn, p, rule), mask, st in zip(routed, mask_leaves,
                                            stepped_leaves):
            if rule is None:
                new_upds.append((st - p).astype(p.dtype))
                new_masks.append(mask)
                new_lat.append(st)
                continue
            g = (_ramped_target(rule, step, warmup_steps, heal - 1)
                 if _hard(rule) else gamma)
            proxed = _apply_prox(st, rule, g)
            candidate = jnp.where(do_prox, proxed, st)
            # freeze the mask at the last pruning step; during healing the
            # pruned coordinates stay exactly zero while survivors train.
            # min_rank instead REAPPLIES its projection through healing —
            # dense low-rank weights have no literal zeros to mask (ref
            # pruneopt.py:280 _prox_through_heal defaults on for MinRank)
            mask_new = jnp.where(healing, mask, candidate != 0)
            healed = proxed if rule.prox == "min_rank" else st * mask
            final = jnp.where(
                in_warmup, st, jnp.where(healing, healed, candidate))
            new_upds.append((final.astype(jnp.float32)
                             - p.astype(jnp.float32)).astype(p.dtype))
            new_masks.append(mask_new)
            new_lat.append(jnp.where(healing, final, st))
        return (
            jax.tree_util.tree_unflatten(treedef, new_upds),
            PruneState(
                latent=jax.tree_util.tree_unflatten(treedef, new_lat),
                inner=inner_state, step=step, gamma=gamma,
                masks=jax.tree_util.tree_unflatten(treedef, new_masks),
            ),
        )

    return optax.GradientTransformation(init, update)


def sparsity_summary(params, rules: Union[PruneRule, dict]) -> dict:
    """fqn → fraction of zero groups, for the rules' grouping (host-side
    reporting; ref pruneopt ``relative_sparsity`` tracking)."""
    from ao_tpu.quantization.quantize import path_to_fqn

    if isinstance(rules, PruneRule):
        match = lambda fqn: rules  # noqa: E731
    else:
        def match(fqn):
            for pat, rule in rules.items():
                if re.search(pat, fqn):
                    return rule
            return None

    out = {}
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in leaves:
        fqn = path_to_fqn(path)
        rule = match(fqn) if (hasattr(leaf, "ndim") and getattr(
            leaf, "ndim", 0) >= 2) else None
        if rule is None:
            continue
        if rule.prox in ("nuclear_norm", "min_rank"):
            s = jnp.linalg.svd(jnp.asarray(leaf, jnp.float32),
                               compute_uv=False)
            out[fqn] = float(jnp.mean(s <= 1e-7 * jnp.max(s)))
        else:
            norms = _group_norms(jnp.asarray(leaf), rule)
            out[fqn] = float(jnp.mean(norms == 0))
    return out


def to_low_rank(w: jax.Array, rank: Optional[int] = None, rtol: float = 1e-5):
    """Factor a (nuclear-norm-pruned) matrix into ``(A, B)`` with
    ``w ≈ A @ B`` for deploy-time low-rank linears (ref: pat low-rank
    extraction).  ``rank=None`` keeps singular values > rtol·max."""
    u, s, vt = jnp.linalg.svd(jnp.asarray(w, jnp.float32),
                              full_matrices=False)
    if rank is None:
        rank = int(jnp.sum(s > rtol * s[0]))
    rank = max(rank, 1)
    root = jnp.sqrt(s[:rank])
    return (u[:, :rank] * root[None, :]).astype(w.dtype), \
        (root[:, None] * vt[:rank]).astype(w.dtype)
