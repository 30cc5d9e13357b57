"""CPU-offloaded optimizer: keep optimizer states in host RAM, freeing HBM
for weights/activations.

(ref: torchao/optim ``CPUOffloadOptimizer`` — optimizer states live on CPU,
gradients stream device→host and the step runs there, overlapping the d2h
copy with backward. JAX re-design: an optax wrapper whose state pytree is
pinned to the host platform with `jax.device_put`; the update function runs
as a CPU-jitted program on host copies of the grads, and only the update
pytree returns to the accelerator. On a 16 GiB v5e this moves 2x-param
bytes (Adam m/v) off HBM.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _cpu_device():
    return jax.devices("cpu")[0]


def cpu_offload(
    inner: optax.GradientTransformation,
    grad_dtype=jnp.float32,
) -> optax.GradientTransformation:
    """Wrap ``inner`` so its state lives on the host CPU device.

    Per step: grads are copied d2h (cast to ``grad_dtype`` on device first —
    halve the wire bytes with bf16 if the inner optimizer tolerates it), the
    inner update runs CPU-jitted, and the resulting updates are returned
    (JAX moves them h2d lazily at first use, overlapping with other work).
    """
    cpu = _cpu_device()
    # inputs are committed to the CPU device, so the jitted update runs
    # there (computation follows committed data)
    inner_update = jax.jit(inner.update)

    def init(params):
        host_params = jax.device_put(
            jax.tree_util.tree_map(lambda x: x.astype(grad_dtype), params), cpu
        )
        return jax.device_put(inner.init(host_params), cpu)

    def update(updates, state, params=None):
        host_grads = jax.device_put(
            jax.tree_util.tree_map(lambda g: g.astype(grad_dtype), updates), cpu
        )
        host_params = (
            jax.device_put(
                jax.tree_util.tree_map(lambda p: p.astype(grad_dtype), params),
                cpu,
            )
            if params is not None
            else None
        )
        new_updates, new_state = inner_update(host_grads, state, host_params)
        return new_updates, new_state

    return optax.GradientTransformation(init, update)


def hbm_savings_report(params, optimizer_states: int = 2) -> dict:
    """Bytes the offload keeps out of HBM (Adam: m+v = 2x param f32)."""
    pbytes = sum(
        x.size * 4 for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "size")
    )
    return {
        "param_bytes_f32": pbytes,
        "offloaded_state_bytes": pbytes * optimizer_states,
    }
