"""Decode-attention %-of-speed-of-light across KV-cache dtypes.

Run on a real TPU: ``python benchmarks/attn_sol.py``. One JSON line per
(kv dtype, context length): measured µs, KV-stream roofline µs, %SoL, and
the XLA dequant+sdpa reference time.

Single-query decode attention is pure KV-streaming: the roofline is
(K+V bytes + scales) / HBM bandwidth. int8/fp8 caches halve the stream
(int4 quarters it), which is why `kv_quant` pays exactly when contexts get
long (`benchmarks/decode_suite.py` long4k rows are the e2e view). Caches
are built exactly as `init_quant_kv_caches` builds them: K transposed
("kt", int8/fp8) so the score dots run transpose-free on the MXU —
int8 runs i8×i8→i32 dots against an in-kernel-quantized q and never
converts the cache at all.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
# explicitly so `JAX_PLATFORMS=cpu` smokes work
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from ao_tpu.utils.roofline import detect_tpu_spec
from ao_tpu.utils.timing import device_time_us

N_CACHES = 4  # distinct caches per measurement (defeats memoization)
B, H, HKV, D = 8, 32, 8, 128


def _mk_cache(key, t, dtype_name, layout):
    hp = jax.random.normal(key, (B, t, HKV, D), jnp.float32)
    if dtype_name == "bf16":
        return hp.astype(jnp.bfloat16), None
    from ao_tpu.serving.kvcache import QuantKVCache

    c = QuantKVCache.create(B, t, HKV, D, dtype_name, layout=layout)
    c = c.update(hp, 0)
    return c.qdata, c.scale


def _dequant(qd, sc, layout):
    """Token-major hp view for the XLA reference (any layout)."""
    if layout in ("ktp", "ptok"):
        from ao_tpu.ops.pallas import parity_slot, parity_window

        t = sc.shape[2]
        pcols = parity_slot(jnp.arange(t), parity_window(t))
        unfold = jnp.float32(2.0 ** (-60 if layout == "ktp" else -120))
        scp = (sc[..., pcols] * unfold).transpose(0, 2, 1)[..., None]
        if layout == "ktp":
            x = qd[..., pcols].transpose(0, 3, 1, 2)
        else:  # ptok stores flat token-natural (B, T, Hkv*D)
            x = qd.reshape(qd.shape[0], t, scp.shape[2], -1)
        return x.astype(jnp.float32) * scp
    x = (qd.astype(jnp.float32).transpose(0, 3, 1, 2) if layout == "kt"
         else qd.astype(jnp.float32))
    return x * sc.transpose(0, 2, 1)[..., None]


def _xla_ref(q, kd, ks, vd, vs, lengths, k_layout, v_layout):
    if ks is None:
        k = kd.astype(jnp.float32)
        v = vd.astype(jnp.float32)
    else:
        k = _dequant(kd, ks, k_layout)
        v = _dequant(vd, vs, v_layout)
    k = jnp.repeat(k, H // HKV, axis=2)
    v = jnp.repeat(v, H // HKV, axis=2)
    s = jnp.einsum("bhd,bthd->bht", q.astype(jnp.float32), k) * D ** -0.5
    mask = jnp.arange(k.shape[1])[None, None] < lengths[:, None, None]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bht,bthd->bhd", p, v)


def prefill_rows():
    """Quantized PREFILL attention vs the bf16 flash kernel (VERDICT r4
    next-step 7: `quantized_sdpa` was correctness-tested but had zero
    perf evidence; the reference's analog is a measured FA3 fp8 win,
    prototype/attention/api.py:68). Measured per (dtype, rotate, S)."""
    from ao_tpu.ops.attention import quantized_sdpa
    from ao_tpu.ops.pallas.flash_attention import flash_attention

    for s in (1024, 2048):
        ks = jax.random.split(jax.random.PRNGKey(s), 3)
        q = jax.random.normal(ks[0], (B, H, s, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, H, s, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, H, s, D), jnp.bfloat16)

        def mutate(args, i):
            return (args[0] + jnp.bfloat16(i * 1e-3),) + args[1:]

        fl = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
        us_flash = device_time_us(fl, q, k, v, iters=6, mutate=mutate)
        print(json.dumps({"kv": "prefill_bf16_flash", "T": s,
                          "us": round(us_flash, 1)}), flush=True)
        for dt, rot in (("int8", False), ("int8", True),
                        ("float8_e4m3fn", False)):
            f = jax.jit(lambda q, k, v, dt=dt, rot=rot: quantized_sdpa(
                q, k, v, dtype=dt, causal=True, rotate=rot))
            us = device_time_us(f, q, k, v, iters=6, mutate=mutate)
            print(json.dumps({
                "kv": f"prefill_sdpa_{dt}{'_rot' if rot else ''}", "T": s,
                "us": round(us, 1),
                "vs_flash": round(us_flash / us, 3),
            }), flush=True)


def main():
    from ao_tpu.ops.pallas.decode_attention import decode_attention

    spec = detect_tpu_spec()
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, D), jnp.bfloat16)

    for t in (512, 2048, 4096):
        lengths = jnp.full((B,), t, jnp.int32)
        for dt, bpe in (("bf16", 2.0), ("int8", 1.0),
                        ("float8_e4m3fn", 1.0), ("int4", 0.5)):
            # int8 K rides the transposed layout (i8 MXU dots); fp8 uses
            # the parity pair (ktp K + ptok V, byte-splice decode)
            if dt == "int8":
                k_layout, v_layout = "kt", "tokens"
            elif dt == "float8_e4m3fn":
                k_layout, v_layout = "ktp", "ptok"
            elif dt == "int4":
                k_layout, v_layout = "ck4", "ptok4"
            else:
                k_layout, v_layout = "tokens", "tokens"
            caches = [
                (_mk_cache(jax.random.PRNGKey(100 + 2 * i), t, dt, k_layout),
                 _mk_cache(jax.random.PRNGKey(101 + 2 * i), t, dt, v_layout))
                for i in range(N_CACHES)
            ]

            def run(q, *flat):
                out = 0.0
                for i in range(N_CACHES):
                    (kd, ks), (vd, vs) = flat[2 * i], flat[2 * i + 1]
                    out = out + decode_attention(
                        q, kd, vd, lengths, k_scale=ks, v_scale=vs,
                        k_layout=k_layout)
                return out

            f = jax.jit(run)
            us = device_time_us(f, q, *[c for pair in caches for c in pair],
                                iters=10) / N_CACHES

            scale_bytes = 0 if dt == "bf16" else 2 * B * t * HKV * 4
            kv_bytes = 2 * B * t * HKV * D * bpe + scale_bytes
            roof_us = kv_bytes / (spec.hbm_gbps * 1e9) * 1e6

            (kd, ks), (vd, vs) = caches[0]
            if dt == "int4":
                us_xla = None  # word-unpack reference is not a fair XLA path
            else:
                fx = jax.jit(lambda q, kd, ks, vd, vs: _xla_ref(
                    q, kd, ks, vd, vs, lengths, k_layout, v_layout))
                us_xla = round(device_time_us(fx, q, kd, ks, vd, vs,
                                              iters=10), 2)

            print(json.dumps({
                "kv": dt, "T": t, "us": round(us, 2),
                "roofline_us": round(roof_us, 2),
                "pct_sol": round(100 * roof_us / max(us, 1e-9), 1),
                "xla_ref_us": us_xla,
            }), flush=True)

    prefill_rows()


if __name__ == "__main__":
    main()
