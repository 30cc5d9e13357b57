"""2:4-sparse int8 fused-kernel roofline — the measured PROOF that 2:4
sparsity has no decode-bandwidth win on TPU v5e.

The reference gets +25% tok/s from int4+2:4 via CUTLASS sparse tensor-core
gemms (torchao/sparsity/README.md:28, csrc/cuda/rowwise_scaled_linear_
sparse_cutlass/). On v5e there is no sparse MXU path, so a fused kernel
must EXPAND the compressed values with VPU selects:

    dense_r = where(m0 == r, v0, 0) + where(m1 == r, v1, 0),  r in 0..3

That is >=5 lane-ops per DENSE element (2 cmp + 2 sel + 1 add at one
32-bit lane each): for K=N=4096 that is ~84M lane-ops ~= 21us of VPU time,
while the DMA saved vs dense int8 is only (16.8 - 10.5)MB / ~660GB/s
~= 9.5us. The expansion can never pay for itself; measured below the
fused sparse kernel runs ~32.7us vs 24us for the DENSE int8-WO linear
(and 14.5us for int4-WO, the better 0.5-byte/weight option). int4+2:4 is
strictly worse still (nibble unpack + expansion). Conclusion: on v5e,
Sparse24 containers ship for the memory/checkpoint win only, and their
linears dequantize — a proven hardware negative, not a missing kernel.
(Mosaic note: the two-select-sum form crashes the compiler; the 8-dot
single-select form below is the workaround.)

Run: python benchmarks/sparse24_roofline.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
# explicitly so `JAX_PLATFORMS=cpu` smokes work
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ao_tpu.utils.timing import device_time_us

M, K, N, tn = 8, 4096, 4096, 512
kq = K // 4


def make(seed):
    r = np.random.default_rng(seed)
    w = r.standard_normal((K, N), np.float32) * 0.02
    blocks = w.reshape(kq, 4, N)
    order = np.argsort(-np.abs(blocks), axis=1)
    m0 = np.minimum(order[:, 0], order[:, 1])
    m1 = np.maximum(order[:, 0], order[:, 1])
    v0f = np.take_along_axis(blocks, m0[:, None], axis=1)[:, 0]
    v1f = np.take_along_axis(blocks, m1[:, None], axis=1)[:, 0]
    dense = np.zeros_like(blocks)
    np.put_along_axis(dense, m0[:, None], v0f[:, None], axis=1)
    np.put_along_axis(dense, m1[:, None], v1f[:, None], axis=1)
    dense = dense.reshape(K, N)
    s = np.maximum(np.abs(dense).max(axis=0, keepdims=True), 1e-8) / 127.0
    q0 = np.clip(np.round(v0f / s), -127, 127).astype(np.int8)
    q1 = np.clip(np.round(v1f / s), -127, 127).astype(np.int8)
    meta = (m0 | (m1 << 2)).astype(np.uint8)
    return dense, s, jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(meta)


def kern(x0, x1, x2, x3, v0_ref, v1_ref, m_ref, o_ref, acc_ref):
    va = v0_ref[:].astype(jnp.bfloat16)
    vb = v1_ref[:].astype(jnp.bfloat16)
    mm = m_ref[:].astype(jnp.int32)
    m0 = mm & 3
    m1 = (mm >> 2) & 3
    acc_ref[:] = jnp.zeros_like(acc_ref)
    z = jnp.zeros_like(va)
    xr = (x0, x1, x2, x3)
    for r in range(4):
        acc_ref[:] += jnp.dot(xr[r][:], jnp.where(m0 == r, va, z),
                              preferred_element_type=jnp.float32)
    for r in range(4):
        acc_ref[:] += jnp.dot(xr[r][:], jnp.where(m1 == r, vb, z),
                              preferred_element_type=jnp.float32)
    o_ref[:] = acc_ref[:]


def run(x4, v0, v1, meta):
    return pl.pallas_call(
        kern, grid=(1, N // tn, 1),
        in_specs=[*[pl.BlockSpec((M, kq), lambda i, j, kk: (i, 0),
                                 memory_space=pltpu.VMEM) for _ in range(4)],
                  *[pl.BlockSpec((kq, tn), lambda i, j, kk: (0, j),
                                 memory_space=pltpu.VMEM) for _ in range(3)]],
        out_specs=pl.BlockSpec((M, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=M * K * N, bytes_accessed=3 * kq * N, transcendentals=0),
    )(*x4, v0, v1, meta)


x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
xg = x.reshape(M, kq, 4)
xs4 = [xg[:, :, r] for r in range(4)]
NW = 6
ds = [make(i) for i in range(NW)]
dense, s, q0, q1, meta = ds[0]
got = np.asarray(run(xs4, q0, q1, meta), np.float64) * s
ref = np.asarray(x, np.float64) @ dense
import json
print(json.dumps({"scheme": "sparse24_int8_fused_sqnr", "sqnr_db": round(
    10 * np.log10((ref ** 2).mean() / max(((ref - got) ** 2).mean(),
                                          1e-30)), 2)}))
f = jax.jit(lambda x, *fl: sum(
    run([x.reshape(M, kq, 4)[:, :, r] for r in range(4)],
        fl[3 * i], fl[3 * i + 1], fl[3 * i + 2]) for i in range(NW)))
flat = [a for d in ds for a in (d[2], d[3], d[4])]
us = device_time_us(f, x, *flat, iters=8) / NW
print(json.dumps({"scheme": "sparse24_int8_fused", "m": M, "k": K, "n": N,
                  "us": round(us, 2)}))

# dense int8-WO baseline through the public linear path
from ao_tpu.ops import linear
from ao_tpu.quantization.qarrays.int8 import Int8Array
qws = [Int8Array.from_hp(jnp.asarray(d[0]), block_size=(K, 1)) for d in ds]
fd = jax.jit(lambda x, *qs: sum(linear(x, q) for q in qs))
usd = device_time_us(fd, x, *qws, iters=8) / NW
print(json.dumps({"scheme": "dense_int8_wo_baseline", "m": M, "k": K,
                  "n": N, "us": round(usd, 2),
                  "verdict": "fused 2:4 loses on v5e (VPU expansion bound)"
                  if us > usd else "fused 2:4 wins"}))
