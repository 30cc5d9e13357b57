"""SpinQuant: fused Hadamard rotations applied to model weights before
quantization (https://arxiv.org/abs/2405.16406).

(ref: torchao/prototype/spinquant/spinquant.py ``apply_spinquant`` — R1
residual-stream rotation, R2 per-head V/O rotation, R4 online rotation
before down_proj; R3 and Cayley-optimized rotations are not implemented in
the reference either. TPU re-design: Hadamard matrices are *generated*
(Sylvester + Paley I/II constructions) instead of shipped as a JSON blob,
and the online R4 transform is a Kronecker-factored pair of small einsums
H_n = H_a ⊗ H_b so it rides the MXU — no O(n²) matrix materialization and
no log-n butterfly chain of VPU shuffles.)

Why rotations help: outlier channels dominate per-group ranges; an
orthonormal rotation spreads outlier energy across all channels, shrinking
quantization error, while leaving the function computed by the network
unchanged (rotations cancel between producer and consumer weights, and
RMSNorm commutes with rotations once its scale is folded into the adjacent
linear).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Hadamard matrix constructions (unnormalized, entries ±1)
# ---------------------------------------------------------------------------


def _sylvester(k: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int8)
    for _ in range(k):
        h = np.block([[h, h], [h, -h]])
    return h


def _legendre_symbols(q: int) -> np.ndarray:
    """χ(a) for a in 0..q-1 (χ(0)=0), q an odd prime."""
    chi = -np.ones(q, dtype=np.int8)
    chi[0] = 0
    chi[(np.arange(1, q) ** 2) % q] = 1
    return chi


def _jacobsthal(q: int) -> np.ndarray:
    chi = _legendre_symbols(q)
    i = np.arange(q)
    return chi[(i[:, None] - i[None, :]) % q]


def _paley_I(q: int) -> np.ndarray:
    """Hadamard of order q+1 for prime q ≡ 3 (mod 4)."""
    n = q + 1
    c = np.zeros((n, n), dtype=np.int8)  # skew conference matrix
    c[0, 1:] = 1
    c[1:, 0] = -1
    c[1:, 1:] = _jacobsthal(q)
    return c + np.eye(n, dtype=np.int8)


def _paley_II(q: int) -> np.ndarray:
    """Hadamard of order 2(q+1) for prime q ≡ 1 (mod 4)."""
    n = q + 1
    c = np.zeros((n, n), dtype=np.int8)  # symmetric conference matrix
    c[0, 1:] = 1
    c[1:, 0] = 1
    c[1:, 1:] = _jacobsthal(q)
    eye = np.eye(n, dtype=np.int8)
    return np.block([[c + eye, c - eye], [c - eye, -c - eye]])


# odd base orders we can construct, and how
_PALEY_I_PRIMES = {12: 11, 20: 19, 24: 23, 44: 43, 48: 47, 60: 59, 68: 67,
                   72: 71, 80: 79, 84: 83, 104: 103, 108: 107}
_PALEY_II_PRIMES = {28: 13, 36: 17, 60: 29, 76: 37, 84: 41, 108: 53}


@functools.lru_cache(maxsize=32)
def hadamard_matrix(n: int) -> np.ndarray:
    """Unnormalized ±1 Hadamard matrix of order n (raises if unknown)."""
    if n == 1:
        return np.array([[1]], dtype=np.int8)
    k = 0
    m = n
    while m % 2 == 0:
        m //= 2
        k += 1
    if m == 1:
        return _sylvester(k)
    if k == 0:
        raise ValueError(f"no Hadamard construction for odd order {n}")
    # n = base * 2^j with base the smallest constructible even order
    # containing the odd part m
    base = None
    for cand in sorted(set(_PALEY_I_PRIMES) | set(_PALEY_II_PRIMES)):
        if cand % m == 0 and (cand // m) & (cand // m - 1) == 0 and cand <= n:
            base = cand
            break
    if base is None:
        raise ValueError(f"no Hadamard construction for order {n}")
    if base in _PALEY_I_PRIMES:
        hb = _paley_I(_PALEY_I_PRIMES[base])
    else:
        hb = _paley_II(_PALEY_II_PRIMES[base])
    rest = n // base
    j = int(np.log2(rest))
    assert base * 2 ** j == n, (n, base)
    return np.kron(hb, _sylvester(j)).astype(np.int8)


def hadamard_factors(n: int):
    """Kronecker factorization H_n = H_a ⊗ H_b with both factors small
    enough for MXU-friendly einsums; returns normalized fp32 arrays."""
    m = n
    k = 0
    while m % 2 == 0:
        m //= 2
        k += 1
    if m == 1:
        ka = k // 2
        a, b = 2 ** ka, 2 ** (k - ka)
    else:
        # put the non-power-of-2 base in the first factor
        base = None
        for cand in sorted(set(_PALEY_I_PRIMES) | set(_PALEY_II_PRIMES)):
            if cand % m == 0 and (cand // m) & (cand // m - 1) == 0 and cand <= n:
                base = cand
                break
        if base is None:
            raise ValueError(f"no Hadamard construction for order {n}")
        a, b = base, n // base
        # rebalance: move powers of two from b into a while a stays small
        while b > 4 * a and b % 2 == 0:
            a, b = a * 2, b // 2
    ha = hadamard_matrix(a).astype(np.float32) / np.sqrt(a)
    hb = hadamard_matrix(b).astype(np.float32) / np.sqrt(b)
    return jnp.asarray(ha), jnp.asarray(hb)


def hadamard_transform(x: jax.Array, axis: int = -1) -> jax.Array:
    """Apply the normalized Hadamard transform H_n (n = size of ``axis``)
    as two Kronecker-factored einsums (ref: matmul_hadU hadamard_utils.py —
    FWHT + had_K matmul; here both halves are MXU matmuls)."""
    axis = axis % x.ndim
    n = x.shape[axis]
    ha, hb = hadamard_factors(n)
    a, b = ha.shape[0], hb.shape[0]
    xm = jnp.moveaxis(x, axis, -1)
    lead = xm.shape[:-1]
    xr = xm.reshape(*lead, a, b).astype(jnp.float32)
    y = jnp.einsum("...ab,ac->...cb", xr, ha)
    y = jnp.einsum("...cb,bd->...cd", y, hb)
    y = y.reshape(*lead, n).astype(x.dtype)
    return jnp.moveaxis(y, -1, axis)


def random_hadamard_matrix(n: int, key: jax.Array) -> jax.Array:
    """Normalized random Hadamard: diag(±1) · H / √n (ref:
    hadamard_utils.py ``random_hadamard_matrix`` — sign-randomized rows keep
    orthonormality while decorrelating from the weights)."""
    h = jnp.asarray(hadamard_matrix(n).astype(np.float32)) / float(np.sqrt(n))
    signs = jax.random.rademacher(key, (n, 1)).astype(jnp.float32)
    return signs * h


# ---------------------------------------------------------------------------
# Applying rotations to a Llama param pytree (weights stored (K, N))
# ---------------------------------------------------------------------------


def _rot_in(w: jax.Array, r: jax.Array) -> jax.Array:
    """Rotate the input space of a linear: y = (x r) @ w' == x @ w ⇒
    w' = rᵀ w."""
    return (r.T @ w.astype(jnp.float32)).astype(w.dtype)


def _rot_out(w: jax.Array, r: jax.Array) -> jax.Array:
    """Rotate the output space: w' = w r."""
    return (w.astype(jnp.float32) @ r).astype(w.dtype)


def _fold_norm(scale: jax.Array, w: jax.Array) -> jax.Array:
    """Fold an RMSNorm elementwise scale into the following linear."""
    return (scale.astype(jnp.float32)[:, None] * w.astype(jnp.float32)).astype(
        w.dtype
    )


def apply_spinquant(
    params: Dict[str, Any],
    cfg,
    key: Optional[jax.Array] = None,
    use_r1: bool = False,
    use_r2: bool = False,
    use_r4: bool = True,
) -> Dict[str, Any]:
    """Rotate a Llama param pytree in place of the reference's module walk.

    * R1: random Hadamard on the residual stream — folds RMSNorm scales
      into adjacent linears first (RMSNorm without scale commutes with
      rotations), then ``embed @ R1``, inputs of wq/wk/wv/w1/w3 and outputs
      of wo/w2 rotated, lm_head input rotated.
    * R2: per-head random Hadamard on V outputs / O inputs (cancels inside
      attention because attention mixes tokens, not head channels).
    * R4: deterministic Hadamard on the down_proj contraction dim; the
      activation side is applied online in ``models/llama.mlp`` (marker key
      "r4" in the mlp dict), the weight side is fused here.

    Returns a NEW params pytree; function is exact up to float roundoff.
    """
    if (use_r1 or use_r2) and key is None:
        raise ValueError("R1/R2 need a PRNG key for the random Hadamard")
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    d = cfg.dim
    layers = []
    r1 = random_hadamard_matrix(d, jax.random.fold_in(key, 0)) if use_r1 else None
    r2 = (
        random_hadamard_matrix(cfg.head_dim, jax.random.fold_in(key, 1))
        if use_r2
        else None
    )

    new = dict(params)
    if use_r1:
        new["embed"] = _rot_out(params["embed"], r1)
        if "lm_head" in params:
            new["lm_head"] = _rot_in(
                _fold_norm(params["norm"], params["lm_head"]), r1
            )
            new["norm"] = jnp.ones_like(params["norm"])
        # tied embeddings: final norm cannot be folded into embedᵀ while the
        # embedding lookup also uses it — keep R1 restricted to untied models
        elif getattr(cfg, "tie_embeddings", False):
            raise ValueError("R1 requires untied embeddings (norm folding)")

    for layer in params["layers"]:
        lay = {k: v for k, v in layer.items()}
        attn = dict(layer["attn"])
        mlp_ = dict(layer["mlp"])
        if use_r1:
            for k in ("wq", "wk", "wv"):
                attn[k] = _rot_in(_fold_norm(layer["ln1"], attn[k]), r1)
            attn["wo"] = _rot_out(attn["wo"], r1)
            for k in ("w1", "w3"):
                mlp_[k] = _rot_in(_fold_norm(layer["ln2"], mlp_[k]), r1)
            mlp_["w2"] = _rot_out(mlp_["w2"], r1)
            lay["ln1"] = jnp.ones_like(layer["ln1"])
            lay["ln2"] = jnp.ones_like(layer["ln2"])
        if use_r2:
            hd = cfg.head_dim
            wv = attn["wv"].astype(jnp.float32)
            kvh = wv.shape[1] // hd
            wv = wv.reshape(d, kvh, hd) @ r2
            attn["wv"] = wv.reshape(d, kvh * hd).astype(layer["attn"]["wv"].dtype)
            wo = attn["wo"].astype(jnp.float32)
            h = wo.shape[0] // hd
            wo = jnp.einsum("ab,hbd->had", r2.T, wo.reshape(h, hd, d))
            attn["wo"] = wo.reshape(h * hd, d).astype(layer["attn"]["wo"].dtype)
        if use_r4:
            f = mlp_["w2"].shape[0]
            # weight side of hᴴ @ w2: w2' = Hᵀ w2, via the same factored
            # transform applied along axis 0
            mlp_["w2"] = hadamard_transform(
                mlp_["w2"].astype(jnp.float32), axis=0
            ).astype(layer["mlp"]["w2"].dtype)
            mlp_["r4"] = ()  # static marker read by models/llama.mlp
        lay["attn"] = attn
        lay["mlp"] = mlp_
        layers.append(lay)
    new["layers"] = layers
    return new
