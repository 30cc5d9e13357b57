"""Training tier tests: float8 training, QAT, low-bit optimizers.

(ref test models: test/float8/test_base.py SQNR gates on fwd/bwd,
test/quantization/test_qat.py, torchao/optim tests vs fp32 Adam.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import ao_tpu
from ao_tpu.models import llama
from ao_tpu.ops import linear
from ao_tpu.quantization.primitives import compute_error
from ao_tpu.training.float8 import (
    Float8TrainingRecipe,
    Float8TrainingWeight,
    convert_to_float8_training,
    fp8_matmul,
    unwrap_float8_training,
)
from ao_tpu.training.optim import adamw_lowbit
from ao_tpu.training.qat import QATConfig, QATWeight

KEY = jax.random.PRNGKey(0)


class TestFloat8Training:
    @pytest.mark.parametrize("recipe", ["tensorwise", "rowwise", "rowwise_with_gw_hp"])
    def test_fwd_bwd_sqnr(self, recipe):
        r = Float8TrainingRecipe(recipe)
        x = jax.random.normal(KEY, (32, 256), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (256, 128), jnp.float32) * 0.05

        y = fp8_matmul(x, w, r)
        assert float(compute_error(x @ w, y)) > 20.0

        def loss(x, w):
            return jnp.sum(fp8_matmul(x, w, r) ** 2)

        def loss_ref(x, w):
            return jnp.sum((x @ w) ** 2)

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        assert float(compute_error(gx_ref, gx)) > 15.0
        assert float(compute_error(gw_ref, gw)) > 15.0

    def test_convert_wraps_linears(self):
        params = llama.init_params(KEY, llama.LLAMA_TINY)
        fp8p = convert_to_float8_training(params)
        assert isinstance(fp8p["layers"][0]["attn"]["wq"], Float8TrainingWeight)
        # norms untouched
        assert isinstance(fp8p["layers"][0]["ln1"], jax.Array)
        back = unwrap_float8_training(fp8p)
        np.testing.assert_array_equal(
            np.asarray(back["layers"][0]["attn"]["wq"]),
            np.asarray(params["layers"][0]["attn"]["wq"]),
        )

    def test_fp8_training_step_decreases_loss(self):
        cfg = llama.LLAMA_TINY
        params = llama.init_params(KEY, cfg)
        fp8p = convert_to_float8_training(params)
        tokens = jax.random.randint(KEY, (2, 16), 0, cfg.vocab_size)
        opt = optax.adam(1e-3)

        def loss_fn(p):
            logits, _ = llama.forward(p, tokens[:, :-1], cfg)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, tokens[:, 1:]
            ).mean()

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l

        s = opt.init(fp8p)
        losses = []
        for _ in range(5):
            fp8p, s, l = step(fp8p, s)
            losses.append(float(l))
        assert losses[-1] < losses[0], losses


class TestQAT:
    def test_prepare_convert_roundtrip(self):
        base = ao_tpu.Int4WeightOnlyConfig(group_size=32)
        params = llama.init_params(KEY, llama.LLAMA_TINY)
        prep = ao_tpu.quantize_(params, QATConfig(base, step="prepare"))
        assert isinstance(prep["layers"][0]["attn"]["wq"], QATWeight)

        tokens = jax.random.randint(KEY, (1, 8), 0, 512)
        logits_fq, _ = llama.forward(prep, tokens, llama.LLAMA_TINY)

        conv = ao_tpu.quantize_(prep, QATConfig(base, step="convert"))
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        assert isinstance(conv["layers"][0]["attn"]["wq"], Int4Array)
        logits_q, _ = llama.forward(conv, tokens, llama.LLAMA_TINY)
        # fake-quant forward must match the converted PTQ forward closely
        assert float(compute_error(logits_fq, logits_q)) > 30.0

    def test_qat_gradients_flow(self):
        base = ao_tpu.Int8DynamicActivationInt8WeightConfig()
        w = jax.random.normal(KEY, (64, 32), jnp.float32) * 0.05
        prep = ao_tpu.quantize_({"wq": w}, QATConfig(base, step="prepare"))
        x = jax.random.normal(KEY, (4, 64), jnp.float32)

        def loss(p):
            return jnp.sum(linear(x, p["wq"]) ** 2)

        g = jax.grad(loss)(prep)
        gnorm = float(jnp.linalg.norm(g["wq"].weight))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_fq_forward_close_to_hp(self):
        base = ao_tpu.Int4WeightOnlyConfig(group_size=32)
        w = jax.random.normal(KEY, (64, 32), jnp.float32) * 0.05
        prep = ao_tpu.quantize_({"wq": w}, QATConfig(base, step="prepare"))
        x = jax.random.normal(KEY, (4, 64), jnp.bfloat16)
        y = linear(x, prep["wq"])
        assert float(compute_error(x.astype(jnp.float32) @ w, y)) > 12.0

    @pytest.mark.parametrize("mk", ["mxfp8", "mxfp4", "nvfp4", "mx_dyn"])
    def test_qat_mx_nvfp4_fake_quant(self, mk):
        from ao_tpu.prototype.mx import (
            MXDynamicActivationMXWeightConfig,
            MXWeightOnlyConfig,
            NVFP4WeightOnlyConfig,
        )

        base = {
            "mxfp8": MXWeightOnlyConfig(),
            "mxfp4": MXWeightOnlyConfig(elem_dtype="float4_e2m1fn"),
            "nvfp4": NVFP4WeightOnlyConfig(),
            "mx_dyn": MXDynamicActivationMXWeightConfig(),
        }[mk]
        w = jax.random.normal(KEY, (64, 32), jnp.float32) * 0.05
        prep = ao_tpu.quantize_({"wq": w}, QATConfig(base, step="prepare"))
        x = jax.random.normal(KEY, (4, 64), jnp.float32)
        y = linear(x, prep["wq"])
        thresh = 12.0 if "fp4" in mk else 20.0
        assert float(compute_error(x @ w, y)) > thresh
        # fake-quant forward tracks the converted PTQ forward
        conv = ao_tpu.quantize_(prep, QATConfig(base, step="convert"))
        yq = linear(x, conv["wq"])
        assert float(compute_error(y, yq)) > 25.0
        # gradients flow through the STE
        g = jax.grad(lambda p: jnp.sum(linear(x, p["wq"]) ** 2))(prep)
        assert float(jnp.linalg.norm(g["wq"].weight)) > 0

    def test_qat_range_learning_recovers_ptq_degradation(self):
        """Learnable scales/zps + convert handoff: brief QAT training must
        beat straight PTQ on the task loss (the reference's recovery story,
        README.md:203)."""
        import optax

        base = ao_tpu.Int4WeightOnlyConfig(group_size=32)
        k = jax.random.PRNGKey(7)
        w = jax.random.normal(k, (64, 48), jnp.float32) * 0.05
        # inject outliers so minmax PTQ qparams are clearly suboptimal
        w = w.at[0, :].set(5.0)
        x = jax.random.normal(jax.random.PRNGKey(8), (256, 64), jnp.float32)
        y_true = x @ w

        ptq = ao_tpu.quantize_({"wq": w}, base)
        e_ptq = float(jnp.mean((linear(x, ptq["wq"]) - y_true) ** 2))

        prep = ao_tpu.quantize_(
            {"wq": w}, QATConfig(base, step="prepare", range_learning=True))
        assert prep["wq"].scale is not None

        def loss(p):
            return jnp.mean((linear(x, p["wq"]) - y_true) ** 2)

        opt = optax.adam(3e-3)
        state = opt.init(prep)

        @jax.jit
        def step(p, s):
            g = jax.grad(loss)(p)
            # learn ONLY the qparams: isolates the range-learning effect
            g = {"wq": g["wq"].replace(
                weight=jnp.zeros_like(g["wq"].weight))}
            upd, s = opt.update(g, s)
            return optax.apply_updates(p, upd), s

        # scale/zp gradients must be nonzero (the LSQ path is live)
        g0 = jax.grad(loss)(prep)
        assert float(jnp.linalg.norm(g0["wq"].scale)) > 0
        assert float(jnp.linalg.norm(g0["wq"].zero_point)) > 0

        for _ in range(150):
            prep, state = step(prep, state)

        conv = ao_tpu.quantize_(prep, QATConfig(base, step="convert"))
        from ao_tpu.quantization.qarrays.int4 import Int4Array

        assert isinstance(conv["wq"], Int4Array)
        e_qat = float(jnp.mean((linear(x, conv["wq"]) - y_true) ** 2))
        assert e_qat < e_ptq, (e_qat, e_ptq)

    @pytest.mark.parametrize("fmt", ["intx3", "intx2-packed", "fp8-wo",
                                     "fp8-dyn", "nvfp4", "nvfp4-dyn"])
    def test_qat_range_learning_breadth(self, fmt):
        """Learned qparams convert into the FULL container set — intx,
        fp8, NVFP4 — matching GPTQ's emission breadth (ref: the learned
        scale handoff qat/api.py:269-305 feeds any base config)."""
        from ao_tpu.prototype.mx import (
            NVFP4DynamicActivationNVFP4WeightConfig,
            NVFP4WeightOnlyConfig,
        )
        from ao_tpu.quantization.qarrays.float8 import Float8Array
        from ao_tpu.quantization.qarrays.intx import IntxArray
        from ao_tpu.quantization.qarrays.nvfp4 import NVFP4Array

        base, container = {
            "intx3": (ao_tpu.IntxWeightOnlyConfig(bit_width=3,
                                                  group_size=32), IntxArray),
            "intx2-packed": (ao_tpu.IntxWeightOnlyConfig(
                bit_width=2, group_size=32, packed=True), IntxArray),
            "fp8-wo": (ao_tpu.Float8WeightOnlyConfig(), Float8Array),
            "fp8-dyn": (ao_tpu.Float8DynamicActivationFloat8WeightConfig(),
                        Float8Array),
            "nvfp4": (NVFP4WeightOnlyConfig(), NVFP4Array),
            "nvfp4-dyn": (NVFP4DynamicActivationNVFP4WeightConfig(),
                          NVFP4Array),
        }[fmt]
        k = jax.random.PRNGKey(11)
        w = jax.random.normal(k, (64, 48), jnp.float32) * 0.05
        x = jax.random.normal(jax.random.PRNGKey(12), (64, 64), jnp.float32)
        y_true = x @ w

        prep = ao_tpu.quantize_(
            {"wq": w}, QATConfig(base, step="prepare", range_learning=True))
        assert prep["wq"].scale is not None

        def loss(p):
            return jnp.mean((linear(x, p["wq"]) - y_true) ** 2)

        # the LSQ path is live: scale gradients are nonzero and finite
        g0 = jax.grad(loss)(prep)
        gs = float(jnp.linalg.norm(g0["wq"].scale))
        assert gs > 0 and np.isfinite(gs), gs

        # a few qparam-only steps must not diverge. Adam's step size is
        # ~lr regardless of gradient magnitude, so lr must be sized
        # RELATIVE to the scale leaf (fp8 row scales ~1e-4, nvfp4
        # per-tensor ~1e-5 — an absolute 1e-3 lr would swamp them)
        lr = 0.02 * float(jnp.mean(jnp.abs(prep["wq"].scale)))
        opt = optax.adam(lr)
        state = opt.init(prep)

        @jax.jit
        def step(p, s):
            g = jax.grad(loss)(p)
            g = {"wq": g["wq"].replace(
                weight=jnp.zeros_like(g["wq"].weight))}
            upd, s = opt.update(g, s)
            return optax.apply_updates(p, upd), s

        for _ in range(25):
            prep, state = step(prep, state)

        conv = ao_tpu.quantize_(prep, QATConfig(base, step="convert"))
        assert isinstance(conv["wq"], container), type(conv["wq"])
        yq = linear(x, conv["wq"])
        thresh = {"intx3": 8.0, "intx2-packed": 3.0, "fp8-wo": 25.0,
                  "fp8-dyn": 22.0, "nvfp4": 12.0, "nvfp4-dyn": 10.0}[fmt]
        assert float(compute_error(y_true, yq)) > thresh
        # fake-quant forward tracks the converted container's forward —
        # the handoff is faithful, not a re-derivation
        y_fq = linear(x, prep["wq"])
        assert float(compute_error(y_fq, yq)) > 18.0


class TestLowBitAdam:
    @pytest.mark.parametrize("bits", [8, 4, "fp8"])
    def test_matches_fp32_adam(self, bits):
        params = {"w": jax.random.normal(KEY, (128, 64), jnp.float32)}
        x = jax.random.normal(jax.random.PRNGKey(2), (32, 128), jnp.float32)
        target = jax.random.normal(jax.random.PRNGKey(3), (32, 64), jnp.float32)

        def loss(p):
            return jnp.mean((x @ p["w"] - target) ** 2)

        def run(opt, steps=20):
            p = jax.tree.map(jnp.copy, params)
            s = opt.init(p)

            @jax.jit
            def step(p, s):
                l, g = jax.value_and_grad(loss)(p)
                u, s = opt.update(g, s, p)
                return optax.apply_updates(p, u), s, l

            for _ in range(steps):
                p, s, l = step(p, s)
            return float(l), p

        l_ref, p_ref = run(optax.adam(1e-2))
        l_q, p_q = run(adamw_lowbit(1e-2, state_bits=bits))
        # quantized-state Adam should track fp32 Adam's loss closely
        assert l_q < l_ref * 1.5 + 1e-3, (bits, l_q, l_ref)

    def test_memory_savings(self):
        params = {"w": jnp.zeros((1024, 1024), jnp.float32)}
        opt8 = adamw_lowbit(1e-3, state_bits=8)
        s = opt8.init(params)
        mu_bytes = s.mu[0].qdata.nbytes + s.mu[0].scale.nbytes
        assert mu_bytes < params["w"].nbytes / 3.5  # ~4x smaller than fp32

    def test_small_params_stay_fp32(self):
        params = {"norm": jnp.zeros((64,), jnp.float32)}
        s = adamw_lowbit(1e-3).init(params)
        assert isinstance(s.mu[0], jax.Array)
