"""Low-bit optimizers: AdamW with 8-bit / 4-bit / fp8 quantized state.

(ref: torchao/optim/ — AdamW8bit/4bit/Fp8 adam.py, OptimState8bit block-256
dynamic-exponent codebook, OptimState4bit block-128, OptimStateFp8; the
single compiled ``single_param_adam`` step :163. TPU re-design: an optax
``GradientTransformation`` whose state pytree holds blockwise-quantized
moments; each update dequantizes, applies AdamW in f32, requantizes —
all inside one jit. The reference's dynamic-exponent codebook becomes
sqrt-domain block-absmax quantization for the (non-negative) second
moment — same goal (resolution for small values against a large block
max) without codebook gathers; the signed first moment stays linear.)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

_SENTINEL_SMALL = 4096  # params with fewer elems stay fp32 (ref: min numel)


@dataclasses.dataclass(frozen=True)
class QSpec:
    bits: int = 8
    block: int = 256
    signed: bool = True  # exp_avg is signed; exp_avg_sq is unsigned
    sqrt_domain: bool = False  # quantize sqrt(x) (second moment)

    @property
    def qmax(self) -> int:
        return 2 ** (self.bits - 1) - 1 if self.signed else 2 ** self.bits - 1


class QState(NamedTuple):
    qdata: jax.Array  # int8 codes (4-bit packed two-per-int8 when bits=4)
    scale: jax.Array  # f32 per block


def _quantize_state(t: jax.Array, spec: QSpec):
    if spec.sqrt_domain:
        t = jnp.sqrt(jnp.maximum(t, 0.0))
    flat = t.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % spec.block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, spec.block)
    if spec.signed:
        scale = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1, keepdims=True), 1e-12) / spec.qmax
        q = jnp.clip(jnp.round(blocks / scale), -spec.qmax, spec.qmax)
    else:
        scale = jnp.maximum(jnp.max(blocks, axis=1, keepdims=True), 1e-12) / spec.qmax
        q = jnp.clip(jnp.round(blocks / scale), 0, spec.qmax)
    if spec.bits == 4:
        q = q.astype(jnp.int32)
        half = spec.block // 2
        lo, hi = q[:, :half], q[:, half:]
        if spec.signed:
            lo, hi = lo + 8, hi + 8
        packed = (lo | (hi << 4)).astype(jnp.uint8)
        return QState(packed, scale[:, 0])
    return QState(q.astype(jnp.int8 if spec.signed else jnp.uint8), scale[:, 0])


def _dequantize_state(st: QState, spec: QSpec, n: int, shape) -> jax.Array:
    if spec.bits == 4:
        p = st.qdata.astype(jnp.int32)
        lo = (p & 0xF) - (8 if spec.signed else 0)
        hi = (p >> 4) - (8 if spec.signed else 0)
        blocks = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)
    else:
        blocks = st.qdata.astype(jnp.float32)
    vals = blocks * st.scale[:, None]
    if spec.sqrt_domain:
        vals = vals * vals
    return vals.reshape(-1)[:n].reshape(shape)


def _quantize_state_fp8(t: jax.Array):
    # per-block scale then e4m3 cast (ref: OptimStateFp8)
    flat = t.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % 256
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, 256)
    scale = jnp.maximum(jnp.max(jnp.abs(blocks), axis=1, keepdims=True), 1e-12) / 448.0
    q = (blocks / scale).astype(jnp.float8_e4m3fn)
    return QState(q, scale[:, 0])


def _dequantize_state_fp8(st: QState, n: int, shape) -> jax.Array:
    vals = st.qdata.astype(jnp.float32) * st.scale[:, None]
    return vals.reshape(-1)[:n].reshape(shape)


class LowBitAdamState(NamedTuple):
    count: jax.Array
    mu: Any  # pytree of QState | jax.Array (small params)
    nu: Any


def adamw_lowbit(
    learning_rate: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    state_bits: int = 8,  # 8 | 4 | "fp8"
) -> optax.GradientTransformation:
    """optax AdamW with quantized first/second moments.

    (ref: AdamW8bit/AdamW4bit/AdamWFp8 torchao/optim/adam.py)
    """
    if state_bits == 4:
        mu_spec, nu_spec = QSpec(4, 128, True), QSpec(4, 128, False, True)
    elif state_bits == 8:
        mu_spec, nu_spec = QSpec(8, 256, True), QSpec(8, 256, False, True)
    elif state_bits == "fp8":
        mu_spec = nu_spec = None  # fp8 path keys off state_bits directly
    else:
        raise ValueError(state_bits)

    def q_mu(t):
        if t.size < _SENTINEL_SMALL:
            return t.astype(jnp.float32)
        if state_bits == "fp8":
            return _quantize_state_fp8(t)
        return _quantize_state(t, mu_spec)

    def q_nu(t):
        if t.size < _SENTINEL_SMALL:
            return t.astype(jnp.float32)
        if state_bits == "fp8":
            return _quantize_state_fp8(t)
        return _quantize_state(t, nu_spec)

    def dq(st, n, spec, shape):
        if isinstance(st, jax.Array):
            return st
        if state_bits == "fp8":
            return _dequantize_state_fp8(st, n, shape)
        return _dequantize_state(st, spec, n, shape)

    # moment states are stored as flat tuples aligned with the flattened
    # params order (QState is itself a pytree, so nesting it positionally
    # inside the params tree would break multi-tree maps)
    def init(params):
        leaves = jax.tree.leaves(params)
        zeros = [jnp.zeros(p.shape, jnp.float32) for p in leaves]
        return LowBitAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=tuple(q_mu(z) for z in zeros),
            nu=tuple(q_nu(z) for z in zeros),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw_lowbit requires params")
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        g_leaves, treedef = jax.tree.flatten(grads)
        p_leaves = treedef.flatten_up_to(params)

        updates, new_mu, new_nu = [], [], []
        for g, p, mu_st, nu_st in zip(g_leaves, p_leaves, state.mu, state.nu):
            g = g.astype(jnp.float32)
            n = g.size
            mu = dq(mu_st, n, mu_spec, g.shape) * b1 + (1 - b1) * g
            nu = dq(nu_st, n, nu_spec, g.shape) * b2 + (1 - b2) * g * g
            step = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            if weight_decay:
                step = step + weight_decay * p.astype(jnp.float32)
            updates.append((-learning_rate * step).astype(p.dtype))
            new_mu.append(q_mu(mu))
            new_nu.append(q_nu(nu))

        return (
            jax.tree.unflatten(treedef, updates),
            LowBitAdamState(count, tuple(new_mu), tuple(new_nu)),
        )

    return optax.GradientTransformation(init, update)
