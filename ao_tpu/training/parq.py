"""PARQ: optimizer-level QAT via proximal quantization mappings.

(ref: torchao/prototype/parq/ — PARQ wraps a base optimizer and, after each
step, pulls the weights toward the quantization grid with a proximal
operator whose strength ramps 0→1 over training ("ProxPARQ"); at ramp end
weights sit exactly on the grid (hard quantization), so convert is a no-op
rounding. TPU re-design: an optax transformation — the proximal map is
fused into the update pytree, no optimizer subclassing.)

Usage::

    opt = parq_optimizer(optax.adamw(1e-3),
                         lambda_schedule=optax.linear_schedule(0., 1., 1000),
                         quant_fn=make_fake_quant_int(bits=4))
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ao_tpu.quantization import primitives as P


def make_fake_quant_int(bits: int = 4, per_channel: bool = True):
    """Symmetric integer-grid fake quantizer w[k,n] → grid of 2^bits levels
    (per out-channel absmax scale)."""
    qmax = 2 ** (bits - 1) - 1
    qmin = -(2 ** (bits - 1))

    def fq(w: jax.Array) -> jax.Array:
        if w.ndim < 2 or not per_channel:
            axes = None
            amax = jnp.max(jnp.abs(w))
        else:
            amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)),
                           keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / qmax
        q = jnp.clip(jnp.round(w / scale), qmin, qmax)
        return (q * scale).astype(w.dtype)

    return fq


def make_fake_quant_ternary():
    """BitNet-style ternary grid {-γ, 0, γ}, γ = mean|W|."""

    def fq(w: jax.Array) -> jax.Array:
        gamma = jnp.maximum(jnp.mean(jnp.abs(w)), 1e-12)
        return (jnp.clip(jnp.round(w / gamma), -1, 1) * gamma).astype(w.dtype)

    return fq


class ParqState(NamedTuple):
    latent: optax.Params  # the un-quantized master weights
    inner: optax.OptState
    step: jax.Array


def parq_optimizer(
    inner: optax.GradientTransformation,
    lambda_schedule: Callable[[jax.Array], jax.Array],
    quant_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    filter_fn: Optional[Callable[[jax.Array], bool]] = None,
) -> optax.GradientTransformation:
    """Wrap ``inner`` with the PARQ latent-weight proximal scheme (ref:
    prototype/parq QuantOptimizer — the optimizer holds un-quantized latent
    weights; the model's visible params are the proximal interpolation):

        latent ← latent + inner_update(g)        # g from the visible params
        visible = (1-λ)·latent + λ·quant(latent),  λ = lambda_schedule(step)

    emitted as the update (visible - params). At λ=1 the visible weights sit
    exactly on the grid while the latent trajectory stays smooth — the
    BinaryConnect/QAT trick that makes hard quantization trainable.
    ``filter_fn(leaf)`` selects which params get the prox (default ndim≥2).
    """
    quant_fn = quant_fn or make_fake_quant_int(4)
    filter_fn = filter_fn or (lambda leaf: hasattr(leaf, "ndim") and leaf.ndim >= 2)

    def init(params):
        return ParqState(
            latent=jax.tree_util.tree_map(jnp.asarray, params),
            inner=inner.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("parq_optimizer requires params in update()")
        inner_updates, inner_state = inner.update(
            updates, state.inner, state.latent
        )
        latent = optax.apply_updates(state.latent, inner_updates)
        lam = lambda_schedule(state.step)

        def prox(lat, w):
            if not filter_fn(w):
                return (lat - w).astype(w.dtype)
            vis = (1.0 - lam) * lat + lam * quant_fn(lat)
            return (vis - w).astype(w.dtype)

        new_updates = jax.tree_util.tree_map(prox, latent, params)
        return new_updates, ParqState(
            latent=latent, inner=inner_state, step=state.step + 1
        )

    return optax.GradientTransformation(init, update)


def paretoq_optimizer(
    inner: optax.GradientTransformation,
    bits: int,
    total_steps: int,
    ramp_fraction: float = 0.8,
) -> optax.GradientTransformation:
    """ParetoQ-style extreme-low-bit QAT recipe (ref: prototype/paretoq —
    1-4-bit training built on the PARQ machinery): linear λ ramp over the
    first ``ramp_fraction`` of training, ternary grid at "1.58 bits"
    (bits=2 uses the ternary grid, as the paper's best sub-2-bit recipe),
    symmetric integer grid at 3-4 bits."""
    if bits <= 2:
        fq = make_fake_quant_ternary()
    else:
        fq = make_fake_quant_int(bits)
    sched = optax.linear_schedule(0.0, 1.0, int(total_steps * ramp_fraction))
    return parq_optimizer(inner, sched, quant_fn=fq)
