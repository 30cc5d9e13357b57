"""HQQ — Half-Quadratic Quantization proximal solver, jit-compiled.

(ref: torchao/quantization/quant_primitives.py:1901
``_choose_qparams_and_quantize_affine_hqq`` and the proximal loop
``optimize_weights_proximal_legacy`` :1818. Hyperparameters match the
reference: lp_norm 0.7, beta 1e1, kappa 1.01, 20 iterations.)

Re-design: the per-group loop is expressed blockwise over the whole weight
at once (no per-layer python loops) inside ``lax.fori_loop`` — one XLA
program quantizes the entire tensor, vmapped free of charge over groups.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ao_tpu.quantization import primitives as P


def _shrink_lp(x: jax.Array, beta: float, lp_norm: float) -> jax.Array:
    """Proximal operator for the l_p norm (p < 1).
    (ref: quant_primitives.py:1830 shrink_lp_op)"""
    ax = jnp.abs(x)
    return jnp.sign(x) * jax.nn.relu(ax - (1.0 / beta) * ax ** (lp_norm - 1.0))


def choose_qparams_hqq(
    hp: jax.Array,
    block_size: Tuple[int, ...],
    quant_min: int = 0,
    quant_max: int = 15,
    lp_norm: float = 0.7,
    beta: float = 1e1,
    kappa: float = 1.01,
    iters: int = 20,
    zero_point_domain: P.ZeroPointDomain = P.ZeroPointDomain.FLOAT,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (scale, zero_point, q) with q unsigned in [quant_min, quant_max].

    For ``ZeroPointDomain.FLOAT`` the zero point is converted to the
    tinygemm parametrization dq = (q - mid) * scale + zp
    (ref conversion: quant_primitives.py:1988-2003 scale_ao/zero_ao).
    """
    w = hp.astype(jnp.float32)
    wb = P.to_blocks(w, block_size)  # (..., blocks interleaved)
    axes = tuple(range(1, wb.ndim, 2))

    max_v = jnp.max(wb, axis=axes, keepdims=True)
    min_v = jnp.min(wb, axis=axes, keepdims=True)
    scale = jnp.maximum((max_v - min_v) / float(quant_max - quant_min), P.EPS)
    zero = -min_v / scale  # float zero in the q = round(w/s + zero) form

    def q_of(w_, s_, z_):
        return jnp.clip(jnp.round(w_ / s_ + z_), quant_min, quant_max)

    def body(i, carry):
        zero, beta_i = carry
        wq = q_of(wb, scale, zero)
        wr = (wq - zero) * scale
        we = _shrink_lp(wb - wr, beta_i, lp_norm)
        zero = jnp.mean(wq - (wb - we) / scale, axis=axes, keepdims=True)
        return zero, beta_i * kappa

    zero, _ = jax.lax.fori_loop(0, iters, body, (zero, beta))
    q = q_of(wb, scale, zero).astype(jnp.uint8)

    # drop the singleton block axes from the qparams
    sq = jnp.squeeze(scale, axis=axes)
    zq = jnp.squeeze(zero, axis=axes)
    q = q.reshape(hp.shape)

    if zero_point_domain is P.ZeroPointDomain.FLOAT:
        # match dequantize_affine_tinygemm's parametrization dq = u*s + zp
        # (u = q - quant_min): (q - zero)*s == u*s + (quant_min - zero)*s
        zp_f = (float(quant_min) - zq) * sq
        return sq.astype(jnp.bfloat16), zp_f.astype(jnp.bfloat16), q
    if zero_point_domain is P.ZeroPointDomain.INT:
        return sq, jnp.round(zq).astype(jnp.int32), q
    raise ValueError(zero_point_domain)
