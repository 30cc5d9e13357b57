"""GPTQ — Hessian-aware post-training quantization, jit-compiled.

(ref: torchao/prototype/gptq/api.py:311 ``gptq_quantize`` / :64 GPTQConfig;
the algorithm is Frantar et al.'s Algorithm 1 re-expressed for XLA:
the column-sequential loop runs as a blocked ``lax.fori_loop`` over the
*input* dimension (rows in our (K, N) layout) with the lazy batch update
applied per block. All math in float32 — the reference hit fast-math
division drift here (api.py:285-305), so divisions stay explicit.)

Flow (two-step, like the reference):
  1. ``quantize_(params, GPTQConfig(base, step="observe"))`` wraps weights
     in ObservedArray(kind="gptq"); eager calibration forwards accumulate
     H = E[2 x xᵀ].
  2. ``quantize_(params, GPTQConfig(base, step="convert"))`` runs the
     solver and emits the base config's QuantizedArray with GPTQ-chosen
     integer values + frozen per-group qparams.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ao_tpu.core.config import AOBaseConfig
from ao_tpu.core.registry import register_quantize_handler
from ao_tpu.algorithms.observe import ObservedArray
from ao_tpu.quantization import primitives as P


@dataclasses.dataclass
class GPTQConfig(AOBaseConfig):
    """(ref: GPTQConfig prototype/gptq/api.py:64)"""

    base_config: Optional[AOBaseConfig] = None
    step: str = "observe"  # "observe" | "convert"
    percdamp: float = 0.01
    block_size: int = 128  # lazy-update block along the input dim
    version: int = 1


@functools.partial(
    jax.jit, static_argnames=("group_size", "quant_max", "blocksize", "mode")
)
def gptq_quantize(
    w: jax.Array,  # (K, N) input-dim-major
    hessian: jax.Array,  # (K, K)
    group_size: int,
    quant_max: int = 15,
    percdamp: float = 0.01,
    blocksize: int = 128,
    mode: str = "affine",  # "affine" | "fp8" | "nvfp4"
    pts: Optional[jax.Array] = None,  # nvfp4 per-tensor scale (scalar)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (q (K, N), scale (K/g, N), zp (K/g, N)).

    mode="affine": q uint in [0, quant_max], FLOAT-domain zp
    (dq = q * scale + zp).
    mode="fp8": q holds e4m3-grid *values* (f32), symmetric per-group scale
    s = absmax/448, zp unused (dq = q * s). Use group_size=K for rowwise.
    mode="nvfp4": q holds e2m1 codes 0..15, scale is the e4m3-snapped block
    scale (pre per-tensor), dq = decode(q) * scale * pts. (ref two-level
    NVFP4 emission: prototype/gptq/api.py:537-595.)
    """
    k, n = w.shape
    g = group_size
    w = w.astype(jnp.float32)
    h = hessian.astype(jnp.float32)
    if pts is None:
        pts = jnp.float32(1.0)

    # dead input channels: H_ii == 0 → pin weight to 0 (ref api.py:390)
    dead = jnp.diag(h) == 0.0
    h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
    w = jnp.where(dead[:, None], 0.0, w)

    # damped inverse-Hessian Cholesky (upper), ref api.py:396-403
    damp = percdamp * jnp.mean(jnp.diag(h))
    h = h + damp * jnp.eye(k, dtype=jnp.float32)
    hinv = jnp.linalg.inv(h)
    # upper cholesky factor of H^-1: chol returns lower L with L Lᵀ = Hinv
    hinv_u = jnp.linalg.cholesky(hinv, upper=True)

    nb = k // blocksize
    gpb = blocksize // g  # groups per block (g must divide blocksize)

    def block_body(bi, carry):
        wmat, qall, sall, zall = carry
        b0 = bi * blocksize
        wblk = jax.lax.dynamic_slice(wmat, (b0, 0), (blocksize, n))
        hblk = jax.lax.dynamic_slice(hinv_u, (b0, b0), (blocksize, blocksize))

        def row_body(r, inner):
            wblk, err, qblk, sblk, zblk = inner
            # freeze qparams at group boundaries from the *updated* rows
            def fresh_qparams(_):
                gi = r // g
                grp = jax.lax.dynamic_slice(wblk, (gi * g, 0), (g, n))
                if mode == "affine":
                    mx = jnp.max(grp, axis=0, keepdims=True)
                    mn = jnp.min(grp, axis=0, keepdims=True)
                    s = jnp.maximum((mx - mn) / float(quant_max), P.EPS)
                    z = mn  # dq = q*s + z, q in [0, quant_max]
                elif mode == "fp8":
                    amax = jnp.max(jnp.abs(grp), axis=0, keepdims=True)
                    s = jnp.maximum(amax / 448.0, P.EPS)
                    z = jnp.zeros_like(s)
                elif mode == "nvfp4":
                    amax = jnp.max(jnp.abs(grp), axis=0, keepdims=True)
                    s = jnp.clip(amax / 6.0 / pts, 1e-12, 448.0)
                    # snap to the e4m3 grid the container stores
                    s = s.astype(jnp.float8_e4m3fn).astype(jnp.float32)
                    z = jnp.zeros_like(s)
                else:
                    raise ValueError(mode)
                sblk2 = jax.lax.dynamic_update_slice(sblk, s, (gi, 0))
                zblk2 = jax.lax.dynamic_update_slice(zblk, z, (gi, 0))
                return sblk2, zblk2

            sblk, zblk = jax.lax.cond(
                r % g == 0, fresh_qparams, lambda _: (sblk, zblk), None
            )
            gi = r // g
            s = jax.lax.dynamic_slice(sblk, (gi, 0), (1, n))
            z = jax.lax.dynamic_slice(zblk, (gi, 0), (1, n))

            wrow = jax.lax.dynamic_slice(wblk, (r, 0), (1, n))
            if mode == "affine":
                q = jnp.clip(jnp.round((wrow - z) / s), 0, quant_max)
                dq = q * s + z
            elif mode == "fp8":
                # clip: GPTQ error propagation can push rows past the range
                # frozen at the group boundary (e4m3fn overflows to NaN)
                v = jnp.clip(wrow / s, -448.0, 448.0)
                q = v.astype(jnp.float8_e4m3fn).astype(jnp.float32)
                dq = q * s
            else:  # nvfp4
                from ao_tpu.quantization.qarrays.fp4 import (
                    decode_fp4_e2m1,
                    encode_fp4_e2m1,
                )

                st = jnp.maximum(s * pts, 1e-12)
                q = encode_fp4_e2m1(wrow / st).astype(jnp.float32)
                dq = decode_fp4_e2m1(q.astype(jnp.uint8)) * st
            d = jax.lax.dynamic_slice(hblk, (r, r), (1, 1))[0, 0]
            e = (wrow - dq) / d  # (1, n)

            # propagate error to later rows in this block
            col = jax.lax.dynamic_slice(hblk, (r, 0), (1, blocksize))[0]  # row r of hblk
            rows = jax.lax.broadcasted_iota(jnp.int32, (blocksize, 1), 0)
            mask = (rows > r).astype(jnp.float32)
            wblk = wblk - (col[:, None] * mask) * e

            err = jax.lax.dynamic_update_slice(err, e, (r, 0))
            qblk = jax.lax.dynamic_update_slice(qblk, q, (r, 0))
            return wblk, err, qblk, sblk, zblk

        init = (
            wblk,
            jnp.zeros((blocksize, n), jnp.float32),
            jnp.zeros((blocksize, n), jnp.float32),
            jnp.zeros((gpb, n), jnp.float32),
            jnp.zeros((gpb, n), jnp.float32),
        )
        wblk, err, qblk, sblk, zblk = jax.lax.fori_loop(0, blocksize, row_body, init)

        # lazy batch update of the tail rows:  W[b1:] -= Hinv[b0:b1, b1:]ᵀ Err
        # (ref api.py:530)
        tail = jax.lax.dynamic_slice(hinv_u, (b0, 0), (blocksize, k))
        cols = jax.lax.broadcasted_iota(jnp.int32, (blocksize, k), 1)
        tail = jnp.where(cols >= b0 + blocksize, tail, 0.0)
        wmat = wmat - tail.T @ err

        qall = jax.lax.dynamic_update_slice(qall, qblk, (b0, 0))
        sall = jax.lax.dynamic_update_slice(sall, sblk, (b0 // g, 0))
        zall = jax.lax.dynamic_update_slice(zall, zblk, (b0 // g, 0))
        wmat = jax.lax.dynamic_update_slice(wmat, wblk, (b0, 0))
        return wmat, qall, sall, zall

    init = (
        w,
        jnp.zeros((k, n), jnp.float32),
        jnp.zeros((k // g, n), jnp.float32),
        jnp.zeros((k // g, n), jnp.float32),
    )
    _, q, s, z = jax.lax.fori_loop(0, nb, block_body, init)
    return q, s, z


def _convert_one(obs: ObservedArray, config: GPTQConfig):
    from ao_tpu.quantization.configs import (
        Int4WeightOnlyConfig,
        Int8WeightOnlyConfig,
    )
    from ao_tpu.quantization.qarrays.int4 import Int4Array, pack_int4
    from ao_tpu.quantization.qarrays.int8 import Int8Array

    w = obs.weight
    if w.ndim == 3:
        # MoE expert stack (E, K, N): per-expert Hessians, vmapped solver
        # (ref: gptq 3-D variant prototype/gptq/api.py:600)
        h = obs.stats.grouped_hessian
    else:
        h = obs.stats.hessian
    if h is None:
        raise ValueError("GPTQ convert before any calibration forward")
    base = config.base_config
    k = w.shape[-2]

    if isinstance(base, Int4WeightOnlyConfig):
        g = base.group_size
        bs = max(config.block_size, g)
        if k % bs != 0 or bs % g != 0:
            bs = g
        if w.ndim == 3:
            q, s, z = jax.vmap(
                lambda we, he: gptq_quantize(we, he, g, 15, config.percdamp, bs)
            )(w, h)
        else:
            q, s, z = gptq_quantize(w, h, g, 15, config.percdamp, bs)
        u = q.astype(jnp.uint8)
        return Int4Array(
            qdata=pack_int4(u, g, axis=-2),
            scale=s.astype(jnp.bfloat16),
            zero_point=z.astype(jnp.bfloat16),
            act_pre_scale=None,
            block_size=(1,) * (w.ndim - 2) + (g, 1),
            zero_point_domain=P.ZeroPointDomain.FLOAT,
            act_quant=None,
            _shape=tuple(w.shape),
            _dequant_dtype="bfloat16",
        )
    if isinstance(base, Int8WeightOnlyConfig):
        # per-channel int8: one group spanning all of K (single block so the
        # group-boundary freeze happens exactly once)
        if w.ndim == 3:
            q, s, z = jax.vmap(
                lambda we, he: gptq_quantize(we, he, k, 255, config.percdamp, k)
            )(w, h)
        else:
            q, s, z = gptq_quantize(w, h, k, 255, config.percdamp, k)
        qi = (q - 128.0).astype(jnp.int8)
        # dq = q*s + z = (qi+128)*s + z → affine with zp: (qi - zp)*s,
        # zp = -(z/s) - 128
        zp = (-z / s - 128.0).astype(jnp.float32)
        return Int8Array(
            qdata=qi,
            scale=s,
            zero_point=zp,
            act_scale=None,
            act_zero_point=None,
            act_pre_scale=None,
            block_size=(1,) * (w.ndim - 2) + (k, 1),
            act_quant=None,
            _shape=tuple(w.shape),
            _dequant_dtype="bfloat16",
        )
    from ao_tpu.prototype.mx import NVFP4WeightOnlyConfig
    from ao_tpu.quantization.configs import (
        Float8WeightOnlyConfig,
        IntxWeightOnlyConfig,
    )

    if isinstance(base, NVFP4WeightOnlyConfig):
        # two-level scales like the reference's NVFP4 GPTQ emission
        # (prototype/gptq/api.py:537-595): per-tensor f32 x per-16 e4m3
        from ao_tpu.quantization.qarrays.fp4 import pack_fp4
        from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array

        g = 16
        bs = max(config.block_size, g)
        if k % bs != 0 or bs % g != 0:
            bs = g

        def solve(we, he):
            pts = jnp.maximum(jnp.max(jnp.abs(we)) / (448.0 * 6.0), 1e-12)
            q, s, _ = gptq_quantize(
                we, he, g, 15, config.percdamp, bs, mode="nvfp4", pts=pts
            )
            return q, s, pts

        if w.ndim == 3:
            q, s, pts = jax.vmap(solve)(w, h)
        else:
            q, s, pts = solve(w, h)
        return NVFP4Array(
            qdata=pack_fp4(q.astype(jnp.uint8), g, axis=-2),
            scale=s.astype(jnp.float8_e4m3fn),
            per_tensor_scale=pts.astype(jnp.float32),
            act_per_tensor_scale=None,
            block_size=(1,) * (w.ndim - 2) + (g, 1),
            act_quant=False,
            _shape=tuple(w.shape),
            _dequant_dtype="bfloat16",
        )

    if isinstance(base, Float8WeightOnlyConfig):
        # rowwise (per-output-channel) symmetric e4m3, group spanning K
        from ao_tpu.quantization.qarrays.float8 import Float8Array

        if w.ndim == 3:
            q, s, _ = jax.vmap(
                lambda we, he: gptq_quantize(
                    we, he, k, 0, config.percdamp, k, mode="fp8"
                )
            )(w, h)
        else:
            q, s, _ = gptq_quantize(
                w, h, k, 0, config.percdamp, k, mode="fp8"
            )
        return Float8Array(
            qdata=q.astype(jnp.float8_e4m3fn),  # values already on-grid
            scale=s.astype(jnp.float32),
            act_scale=None,
            act_pre_scale=None,
            block_size=(1,) * (w.ndim - 2) + (k, 1),
            act_quant=None,
            _shape=tuple(w.shape),
            _dequant_dtype="bfloat16",
        )

    if isinstance(base, IntxWeightOnlyConfig):
        from ao_tpu.quantization.qarrays.intx import IntxArray, pack_bitplanes

        bits = base.bit_width
        g = base.group_size
        qmax_u = (1 << bits) - 1
        half = 1 << (bits - 1)
        bs = max(config.block_size, g)
        if k % bs != 0 or bs % g != 0:
            bs = g
        if w.ndim == 3:
            q, s, z = jax.vmap(
                lambda we, he: gptq_quantize(
                    we, he, g, qmax_u, config.percdamp, bs
                )
            )(w, h)
        else:
            q, s, z = gptq_quantize(w, h, g, qmax_u, config.percdamp, bs)
        qi = (q - float(half)).astype(jnp.int8)
        zp = (-z / s - float(half)).astype(jnp.float32)
        if base.packed:
            qdata = pack_bitplanes(q.astype(jnp.uint8), bits, axis=-2)
        else:
            qdata = qi
        return IntxArray(
            qdata=qdata,
            scale=s.astype(jnp.float32),
            zero_point=zp,
            block_size=(1,) * (w.ndim - 2) + (g, 1),
            bits=bits,
            packed=base.packed,
            act_quant=None,
            _shape=tuple(w.shape),
            _dequant_dtype="bfloat16",
        )

    raise NotImplementedError(
        f"GPTQ convert for base config {type(base).__name__}"
    )


@register_quantize_handler(GPTQConfig)
def _gptq_transform(weight, config: GPTQConfig):
    if config.step == "observe":
        if isinstance(weight, ObservedArray):
            return weight
        return ObservedArray.wrap(weight, "gptq")
    if config.step == "convert":
        if not isinstance(weight, ObservedArray):
            return weight  # leaf that was never observed
        return _convert_one(weight, config)
    raise ValueError(config.step)
