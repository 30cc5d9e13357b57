"""Round-3 kernel probes: fp4 M=1 cliff + compute-bound int8 MXU lowering."""
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, time, json
from ao_tpu.utils.timing import device_time_us

k, n = 4096, 4096
w = jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.float32) * 0.02

# --- compute-bound dots: what does v5e make of int8xint8->int32? ---
for m in (2048,):
    xb = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    f_bf16 = jax.jit(lambda x, ww: x @ ww)
    us = device_time_us(f_bf16, xb, wb, iters=10)
    print(json.dumps({"probe": "bf16_dense", "m": m, "us": round(us,1)}), flush=True)

    qx = jax.random.randint(jax.random.PRNGKey(2), (m, k), -127, 127, jnp.int8)
    qw = jax.random.randint(jax.random.PRNGKey(3), (k, n), -127, 127, jnp.int8)
    f_i8 = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    us = device_time_us(f_i8, qx, qw, iters=10)
    print(json.dumps({"probe": "int8_dot_int32", "m": m, "us": round(us,1)}), flush=True)

    # f32 upcast comparison (what XLA might be doing internally)
    f_i8f = jax.jit(lambda a, b: jax.lax.dot_general(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    us = device_time_us(f_i8f, qx, qw, iters=10)
    print(json.dumps({"probe": "int8_upcast_bf16_dot", "m": m, "us": round(us,1)}), flush=True)

    # full w8a8 path as the diffusion bench hits it
    from ao_tpu.ops import kernels
    sx = jnp.ones((m,1), jnp.float32); sw_ = jnp.ones((1,n), jnp.float32)
    f_dyn = jax.jit(lambda a, b: kernels.int8_dynamic_matmul(a, sx, None, b, sw_, None, (k,1)))
    us = device_time_us(f_dyn, qx, qw, iters=10)
    print(json.dumps({"probe": "int8_dynamic_matmul_full", "m": m, "us": round(us,1)}), flush=True)

    # fp8 dot lowering
    qxf = qx.astype(jnp.float8_e4m3fn); qwf = qw.astype(jnp.float8_e4m3fn)
    f_f8 = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    us = device_time_us(f_f8, qxf, qwf, iters=10)
    print(json.dumps({"probe": "fp8_dot_f32", "m": m, "us": round(us,1)}), flush=True)

# --- fp4 M cliff: kernel direct, M=1 vs 8 ---
from ao_tpu.quantization.qarrays.mx import MXArray
from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array
from ao_tpu.ops.pallas.fp4_matmul import mxfp4_wo_matmul_pallas, nvfp4_wo_matmul_pallas

mk_mx = jax.jit(lambda w: MXArray.from_hp(w, elem_dtype="float4_e2m1fn"))
mk_nv = jax.jit(lambda w: NVFP4Array.from_hp(w))
mx = jax.block_until_ready(mk_mx(w))
nv = jax.block_until_ready(mk_nv(w))
print(json.dumps({"probe": "layouts", "mx": mx.layout, "nv": nv.layout}), flush=True)
for m in (1, 8):
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)
    f = jax.jit(lambda x: mxfp4_wo_matmul_pallas(x, mx.qdata, mx.scale))
    us = device_time_us(f, x, iters=20)
    g = jax.jit(lambda x: nvfp4_wo_matmul_pallas(x, nv.qdata, nv.scale, nv.per_tensor_scale))
    us2 = device_time_us(g, x, iters=20)
    print(json.dumps({"probe": "fp4_kernel", "m": m, "mxfp4_us": round(us,2), "nvfp4_us": round(us2,2)}), flush=True)

# nf4 kernel at m=8 for reference
from ao_tpu.quantization.qarrays.nf4 import NF4Array, NF4_CODEBOOK
from ao_tpu.ops.linear import try_lut4_linear
mk_nf = jax.jit(lambda w: NF4Array.from_hp(w, block_size=64))
nf = jax.block_until_ready(mk_nf(w))
print(json.dumps({"probe": "nf4_layout", "layout": nf.layout}), flush=True)
for m in (1, 8):
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)
    h = jax.jit(lambda x: try_lut4_linear(x, nf.qdata, nf._scalers(), NF4_CODEBOOK, nf.block_size[0]))
    us = device_time_us(h, x, iters=20)
    print(json.dumps({"probe": "nf4_lut_kernel", "m": m, "us": round(us,2)}), flush=True)
