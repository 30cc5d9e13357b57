"""torch → ao_tpu checkpoint import tests (torch CPU is available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ao_tpu
from ao_tpu.integrations.torch_import import import_hf_llama, import_linear
from ao_tpu.models import llama

torch = pytest.importorskip("torch")


def _hf_llama_sd(cfg: llama.LlamaConfig, seed=0):
    g = torch.Generator().manual_seed(seed)
    d, hd = cfg.dim, cfg.head_dim

    def lin(fan_out, fan_in):
        return torch.randn(fan_out, fan_in, generator=g) * fan_in ** -0.5

    sd = {"model.embed_tokens.weight":
          torch.randn(cfg.vocab_size, d, generator=g) * 0.02,
          "model.norm.weight": torch.ones(d)}
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = lin(cfg.n_heads * hd, d)
        sd[p + "self_attn.k_proj.weight"] = lin(cfg.n_kv_heads * hd, d)
        sd[p + "self_attn.v_proj.weight"] = lin(cfg.n_kv_heads * hd, d)
        sd[p + "self_attn.o_proj.weight"] = lin(d, cfg.n_heads * hd)
        sd[p + "mlp.gate_proj.weight"] = lin(cfg.ffn_dim, d)
        sd[p + "mlp.up_proj.weight"] = lin(cfg.ffn_dim, d)
        sd[p + "mlp.down_proj.weight"] = lin(d, cfg.ffn_dim)
        sd[p + "input_layernorm.weight"] = torch.ones(d)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(d)
    return sd


class TestTorchImport:
    def test_linear_transpose(self):
        w = torch.randn(8, 16)
        out = import_linear(w, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), w.numpy().T, rtol=1e-6)

    def test_bf16_tensor(self):
        w = torch.randn(8, 16).to(torch.bfloat16)
        out = import_linear(w, jnp.bfloat16)
        assert out.shape == (16, 8) and out.dtype == jnp.bfloat16

    def test_hf_llama_roundtrip_and_quantize(self):
        cfg = llama.LlamaConfig(
            vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=96, tie_embeddings=True, dtype=jnp.float32,
        )
        sd = _hf_llama_sd(cfg)
        params = import_hf_llama(sd, cfg.n_layers, dtype=jnp.float32)
        tokens = jnp.arange(8, dtype=jnp.int32)[None]
        logits, _ = llama.forward(params, tokens, cfg)
        assert logits.shape == (1, 8, 128)
        assert bool(jnp.all(jnp.isfinite(logits)))

        # the imported linear must compute EXACTLY what torch computes
        x = torch.randn(4, 64)
        ref = (x @ sd["model.layers.0.self_attn.q_proj.weight"].T).numpy()
        got = np.asarray(jnp.asarray(x.numpy()) @ params["layers"][0]["attn"]["wq"])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

        qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())
        ql, _ = llama.forward(qp, tokens, cfg)
        assert ao_tpu.compute_error(logits, ql) > 20

    def test_untied_lm_head(self):
        cfg = llama.LlamaConfig(
            vocab_size=64, dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
            ffn_dim=48, tie_embeddings=False, dtype=jnp.float32,
        )
        sd = _hf_llama_sd(cfg)
        sd["lm_head.weight"] = torch.randn(cfg.vocab_size, cfg.dim) * 0.02
        params = import_hf_llama(sd, cfg.n_layers, dtype=jnp.float32)
        assert params["lm_head"].shape == (32, 64)


def _tiny_hf_sam():
    from transformers import (
        SamConfig,
        SamMaskDecoderConfig,
        SamModel,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    vc = SamVisionConfig(
        image_size=64, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, mlp_dim=64, output_channels=16, window_size=4,
        global_attn_indexes=[1], use_rel_pos=True, num_pos_feats=8)
    pc = SamPromptEncoderConfig(image_size=64, patch_size=8, hidden_size=16)
    mc = SamMaskDecoderConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        mlp_dim=128, iou_head_depth=3, iou_head_hidden_dim=16)
    cfg = SamConfig(vision_config=vc.to_dict(),
                    prompt_encoder_config=pc.to_dict(),
                    mask_decoder_config=mc.to_dict())
    torch.manual_seed(0)
    m = SamModel(cfg).eval()
    # HF's default init collapses to ~0 outputs; load non-degenerate weights
    g = torch.Generator().manual_seed(42)
    new = {}
    for k, v in m.state_dict().items():
        if v.ndim == 0:
            new[k] = v
        elif "norm" in k and k.endswith("weight") and v.ndim == 1:
            new[k] = 1.0 + 0.1 * torch.randn(v.shape, generator=g)
        elif v.ndim == 1:
            new[k] = 0.05 * torch.randn(v.shape, generator=g)
        else:
            fan = v.shape[-1] if v.ndim == 2 else int(np.prod(v.shape[1:]))
            new[k] = torch.randn(v.shape, generator=g) * (
                0.6 / np.sqrt(max(fan, 1)))
    m.load_state_dict(new)
    return m, g


class TestSamImport:
    def test_conv_transpose_matches_torch(self):
        """The framework's conv_transpose2d + _convT import = torch's
        ConvTranspose2d exactly (spatial kernel flip)."""
        from ao_tpu.integrations.torch_import import _convT
        from ao_tpu.ops.conv import conv_transpose2d

        torch.manual_seed(1)
        ct = torch.nn.ConvTranspose2d(6, 4, 2, stride=2)
        x = torch.randn(2, 6, 5, 5)
        with torch.no_grad():
            ref = ct(x).permute(0, 2, 3, 1).numpy()
        y = conv_transpose2d(
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
            _convT(ct.weight, jnp.float32),
            stride=2,
            bias=jnp.asarray(ct.bias.detach().numpy()),
        )
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)

    def test_sam_matches_transformers_ground_truth(self):
        """import_hf_sam + our forward reproduces transformers.SamModel:
        encoder embedding, point- and box-prompted masks, IoU scores."""
        from ao_tpu.integrations.torch_import import import_hf_sam
        from ao_tpu.models import sam

        m, g = _tiny_hf_sam()
        cfg = sam.SAMConfig(
            image_size=64, patch_size=8, dim=32, n_layers=2, n_heads=4,
            mlp_ratio=2, window_size=4, global_attn_layers=(1,), neck_dim=16,
            decoder_layers=2, decoder_heads=2, decoder_mlp_mult=8,
            n_mask_tokens=4, dtype=jnp.float32)
        params = import_hf_sam(m.state_dict(), cfg, dtype=jnp.float32)

        img = torch.randn(1, 3, 64, 64, generator=g)
        jimg = jnp.asarray(img.permute(0, 2, 3, 1).numpy())
        with torch.no_grad():
            hf_emb = m.vision_encoder(img)[0].numpy()
        emb = sam.encode_image(params, jimg, cfg)
        np.testing.assert_allclose(
            np.asarray(emb).transpose(0, 3, 1, 2), hf_emb, atol=2e-3)

        # point prompts (HF appends a pad point when no boxes are given)
        points = torch.tensor([[[[10.0, 20.0], [40.0, 50.0]]]])
        labels = torch.tensor([[[1, 0]]])
        with torch.no_grad():
            out = m(pixel_values=img, input_points=points,
                    input_labels=labels, multimask_output=True)
        sparse = sam.encode_points(
            params, jnp.array([[[10.0, 20.0], [40.0, 50.0], [0.0, 0.0]]]),
            jnp.array([[1, 0, -1]]), cfg)
        masks, iou = sam.decode_masks(params, emb, sparse, cfg)
        np.testing.assert_allclose(
            np.asarray(masks)[:, 1:], out.pred_masks.numpy()[:, 0], atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(iou)[:, 1:], out.iou_scores.numpy()[:, 0], atol=1e-4)

        # box prompt
        boxes = torch.tensor([[[8.0, 8.0, 40.0, 48.0]]])
        with torch.no_grad():
            outb = m(pixel_values=img, input_boxes=boxes,
                     multimask_output=True)
        sparse_b = sam.encode_boxes(
            params, jnp.array([[[8.0, 8.0, 40.0, 48.0]]]), cfg)
        mb, _ = sam.decode_masks(params, emb, sparse_b, cfg)
        np.testing.assert_allclose(
            np.asarray(mb)[:, 1:], outb.pred_masks.numpy()[:, 0], atol=2e-3)

    def test_sam_import_then_quantize(self):
        """Imported checkpoints flow straight into quantize_ and keep mask
        fidelity (the reference's SAM quantization story)."""
        from ao_tpu.integrations.torch_import import import_hf_sam
        from ao_tpu.models import sam

        m, g = _tiny_hf_sam()
        cfg = sam.SAMConfig(
            image_size=64, patch_size=8, dim=32, n_layers=2, n_heads=4,
            mlp_ratio=2, window_size=4, global_attn_layers=(1,), neck_dim=16,
            decoder_layers=2, decoder_heads=2, decoder_mlp_mult=8,
            n_mask_tokens=4, dtype=jnp.float32)
        params = import_hf_sam(m.state_dict(), cfg, dtype=jnp.float32)
        img = jnp.asarray(
            torch.randn(1, 3, 64, 64, generator=g).permute(0, 2, 3, 1).numpy())
        coords = jnp.array([[[10.0, 20.0]]])
        labels = jnp.array([[1]])
        ref_m, _ = sam.forward(params, img, coords, labels, cfg)
        qp = ao_tpu.quantize_(params, ao_tpu.Int8DynamicActivationInt8WeightConfig())
        qm, _ = sam.forward(qp, img, coords, labels, cfg)
        assert ao_tpu.compute_error(ref_m, qm) > 20


class TestViTImport:
    def test_vit_matches_transformers_ground_truth(self):
        from transformers import ViTConfig as HFViTConfig
        from transformers import ViTForImageClassification

        from ao_tpu.integrations.torch_import import import_hf_vit
        from ao_tpu.models import vit

        hf_cfg = HFViTConfig(
            image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64, num_labels=10)
        torch.manual_seed(0)
        m = ViTForImageClassification(hf_cfg).eval()
        cfg = vit.ViTConfig(image_size=32, patch_size=8, dim=32, n_layers=2,
                            n_heads=4, mlp_dim=64, n_classes=10,
                            dtype=jnp.float32)
        params = import_hf_vit(m.state_dict(), cfg, dtype=jnp.float32)

        img = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            ref = m(pixel_values=img).logits.numpy()
        y = vit.forward(params, jnp.asarray(img.permute(0, 2, 3, 1).numpy()),
                        cfg)
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)

    def test_vit_import_then_quantize(self):
        from transformers import ViTConfig as HFViTConfig
        from transformers import ViTForImageClassification

        from ao_tpu.integrations.torch_import import import_hf_vit
        from ao_tpu.models import vit

        hf_cfg = HFViTConfig(
            image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64, num_labels=10)
        torch.manual_seed(1)
        m = ViTForImageClassification(hf_cfg).eval()
        cfg = vit.ViTConfig(image_size=32, patch_size=8, dim=32, n_layers=2,
                            n_heads=4, mlp_dim=64, n_classes=10,
                            dtype=jnp.float32)
        params = import_hf_vit(m.state_dict(), cfg, dtype=jnp.float32)
        img = jnp.asarray(torch.randn(2, 3, 32, 32).permute(0, 2, 3, 1).numpy())
        ref = vit.forward(params, img, cfg)
        qp = ao_tpu.quantize_(params, ao_tpu.Int8WeightOnlyConfig())
        y = vit.forward(qp, img, cfg)
        assert ao_tpu.compute_error(ref, y) > 25


class TestLlamaGroundTruth:
    def test_llama_matches_transformers(self):
        """import_hf_llama + models.llama.forward reproduces
        transformers.LlamaForCausalLM logits exactly in fp32 (RoPE, GQA,
        rms-norm, SwiGLU conventions all line up)."""
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        hf = HFLlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            rope_theta=10000.0, tie_word_embeddings=False)
        torch.manual_seed(0)
        m = LlamaForCausalLM(hf).eval()
        params = import_hf_llama(m.state_dict(), n_layers=2, dtype=jnp.float32)
        cfg = llama.LlamaConfig(
            vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=128, norm_eps=1e-5, rope_theta=10000.0,
            tie_embeddings=False, dtype=jnp.float32)
        toks = torch.randint(0, 256, (2, 16))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = llama.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)


class TestGemmaGroundTruth:
    def test_gemma_matches_transformers(self):
        """import_hf_gemma + models.gemma.forward reproduces
        transformers.GemmaForCausalLM logits exactly in fp32 (embed
        scaling, (1+w) norm, GeGLU, decoupled head_dim)."""
        from transformers import GemmaConfig as HFGemmaConfig
        from transformers import GemmaForCausalLM

        from ao_tpu.integrations.torch_import import import_hf_gemma
        from ao_tpu.models import gemma

        hf = HFGemmaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
            head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-6,
            rope_theta=10000.0)
        torch.manual_seed(0)
        m = GemmaForCausalLM(hf).eval()
        params = import_hf_gemma(m.state_dict(), n_layers=2, dtype=jnp.float32)
        cfg = gemma.GemmaConfig(
            vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=1,
            head_dim=32, ffn_dim=128, norm_eps=1e-6, rope_theta=10000.0,
            final_logit_softcap=None, dtype=jnp.float32)
        toks = torch.randint(0, 256, (2, 12))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = gemma.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)


class TestQwen2GroundTruth:
    def test_qwen2_matches_transformers(self):
        """Qwen2 = Llama layout + q/k/v biases; import_hf_llama picks the
        biases up and the qkv_bias=True forward matches transformers
        exactly in fp32."""
        from transformers import Qwen2Config, Qwen2ForCausalLM

        hf = Qwen2Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            rope_theta=10000.0, tie_word_embeddings=False)
        torch.manual_seed(0)
        m = Qwen2ForCausalLM(hf).eval()
        with torch.no_grad():  # default qkv-bias init is zeros
            for n, p in m.named_parameters():
                if "proj.bias" in n:
                    p.copy_(0.1 * torch.randn(p.shape))
        params = import_hf_llama(m.state_dict(), n_layers=2, dtype=jnp.float32)
        assert "bq" in params["layers"][0]["attn"]
        cfg = llama.LlamaConfig(
            vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=128, norm_eps=1e-5, rope_theta=10000.0,
            tie_embeddings=False, qkv_bias=True, dtype=jnp.float32)
        toks = torch.randint(0, 256, (2, 12))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = llama.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)


class TestMixtralGroundTruth:
    def test_mixtral_matches_transformers(self):
        """Mixtral MoE: import_hf_llama maps block_sparse_moe into the
        ragged_dot expert dict; router softmax/top-k/renorm + grouped FFN
        match transformers exactly in fp32."""
        from transformers import MixtralConfig, MixtralForCausalLM

        hf = MixtralConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            rope_theta=10000.0, num_local_experts=4, num_experts_per_tok=2,
            tie_word_embeddings=False)
        torch.manual_seed(0)
        m = MixtralForCausalLM(hf).eval()
        params = import_hf_llama(m.state_dict(), n_layers=2, dtype=jnp.float32)
        assert "router" in params["layers"][0]["mlp"]
        cfg = llama.LlamaConfig(
            vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=128, norm_eps=1e-5, rope_theta=10000.0,
            tie_embeddings=False, n_experts=4, top_k_experts=2,
            dtype=jnp.float32)
        toks = torch.randint(0, 256, (2, 12))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = llama.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)


class TestAutoImport:
    def test_auto_llama_and_mixtral(self):
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        from ao_tpu.integrations.auto import import_from_hf

        hf = HFLlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False)
        torch.manual_seed(0)
        m = LlamaForCausalLM(hf).eval()
        params, cfg = import_from_hf(m.state_dict(), hf.to_dict(),
                                     dtype=jnp.float32)
        assert cfg.dim == 64 and cfg.n_kv_heads == 2 and not cfg.qkv_bias
        toks = torch.randint(0, 256, (1, 8))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = llama.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)

    def test_auto_rejects_unknown(self):
        from ao_tpu.integrations.auto import config_from_hf

        with pytest.raises(ValueError, match="unsupported"):
            config_from_hf({"model_type": "mamba"})

    def test_auto_vit_config(self):
        from transformers import ViTConfig as HFViTConfig

        from ao_tpu.integrations.auto import config_from_hf

        hf = HFViTConfig(image_size=32, patch_size=8, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, num_labels=10)
        cfg = config_from_hf(hf.to_dict())
        assert cfg.dim == 32 and cfg.n_classes == 10 and cfg.mlp_dim == 64


class TestLoadHFCheckpoint:
    def test_load_from_save_pretrained_dir(self, tmp_path):
        """End-to-end: transformers save_pretrained → load_hf_checkpoint
        (config.json + safetensors, no torch on the load path) → logits
        parity."""
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        from ao_tpu.integrations.auto import load_hf_checkpoint

        hf = HFLlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False)
        torch.manual_seed(0)
        m = LlamaForCausalLM(hf).eval()
        m.save_pretrained(str(tmp_path), safe_serialization=True)
        params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)
        toks = torch.randint(0, 256, (1, 8))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = llama.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)
        # flows straight into quantize_on_load (fast host path)
        from ao_tpu.integrations.loader import quantize_on_load

        qp = quantize_on_load(params, ao_tpu.Int4WeightOnlyConfig(group_size=16))
        assert qp["layers"][0]["attn"]["wq"].layout in ("magic", "magic8")


class TestRopeScaling:
    def test_llama3_rope_scaling_matches_transformers(self):
        """Llama-3.1-style rope_scaling must reproduce transformers'
        frequency rescale — without it the importer silently yields wrong
        logits at every position."""
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        from ao_tpu.integrations.auto import import_from_hf

        rs = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
              "high_freq_factor": 4.0,
              "original_max_position_embeddings": 64}
        hf = HFLlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, rms_norm_eps=1e-5,
            rope_theta=10000.0, rope_scaling=dict(rs),
            tie_word_embeddings=False)
        torch.manual_seed(0)
        m = LlamaForCausalLM(hf).eval()
        params, cfg = import_from_hf(m.state_dict(), hf.to_dict(),
                                     dtype=jnp.float32)
        assert cfg.rope_scaling is not None
        toks = torch.randint(0, 256, (1, 48))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = llama.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)

    def test_qwen3_matches_transformers(self):
        """Qwen3: per-head QK-RMSNorm + decoupled head_dim, exact in fp32."""
        from transformers import Qwen3Config, Qwen3ForCausalLM

        from ao_tpu.integrations.auto import import_from_hf

        hf = Qwen3Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-5,
            rope_theta=10000.0, tie_word_embeddings=False)
        torch.manual_seed(0)
        m = Qwen3ForCausalLM(hf).eval()
        with torch.no_grad():  # non-trivial norm weights
            for n, p in m.named_parameters():
                if "q_norm" in n or "k_norm" in n:
                    p.copy_(1.0 + 0.2 * torch.randn(p.shape))
        params, cfg = import_from_hf(m.state_dict(), hf.to_dict(),
                                     dtype=jnp.float32)
        assert cfg.qk_norm and cfg.head_dim == 32
        assert "q_norm" in params["layers"][0]["attn"]
        toks = torch.randint(0, 256, (2, 12))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = llama.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)


class TestGemma23GroundTruth:
    def test_gemma2_matches_transformers(self):
        """Gemma2: sandwich norms, attn/final softcaps, query_pre_attn
        scalar, sliding-window band mask — exact in fp32 (seq > window so
        the band is exercised)."""
        from transformers import Gemma2Config, Gemma2ForCausalLM

        from ao_tpu.integrations.auto import import_from_hf
        from ao_tpu.models import gemma

        hf = Gemma2Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-6,
            rope_theta=10000.0, query_pre_attn_scalar=48,
            attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
            sliding_window=8)
        torch.manual_seed(0)
        m = Gemma2ForCausalLM(hf).eval()
        params, cfg = import_from_hf(m.state_dict(), hf.to_dict(),
                                     dtype=jnp.float32)
        assert cfg.post_norms and cfg.sliding_window == 8
        toks = torch.randint(0, 256, (1, 24))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = gemma.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)

    def test_gemma3_matches_transformers(self):
        """Gemma3: per-head (1+w) QK-norm, local/global rope thetas, 5:1
        sliding pattern via layer_types — exact in fp32."""
        from transformers import Gemma3ForCausalLM, Gemma3TextConfig

        from ao_tpu.integrations.auto import import_from_hf
        from ao_tpu.models import gemma

        hf = Gemma3TextConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=32, max_position_embeddings=128, rms_norm_eps=1e-6,
            rope_theta=100000.0, rope_local_base_freq=10000.0,
            query_pre_attn_scalar=32, sliding_window=8,
            sliding_window_pattern=3)
        torch.manual_seed(0)
        m = Gemma3ForCausalLM(hf).eval()
        with torch.no_grad():  # non-trivial (1+w) norm weights
            for n, p in m.named_parameters():
                if "q_norm" in n or "k_norm" in n:
                    p.copy_(0.2 * torch.randn(p.shape))
        params, cfg = import_from_hf(m.state_dict(), hf.to_dict(),
                                     dtype=jnp.float32)
        assert cfg.qk_norm and cfg.rope_local_theta == 10000.0
        toks = torch.randint(0, 256, (1, 24))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = gemma.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)


class TestPhi3GroundTruth:
    def test_phi3_matches_transformers(self):
        """Phi-3 = Llama layout with FUSED qkv_proj / gate_up_proj; the
        importer splits them ([q|k|v] rows, [gate|up] rows) and the forward
        matches transformers.Phi3ForCausalLM logits exactly in fp32."""
        from transformers import Phi3Config, Phi3ForCausalLM

        hf = Phi3Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rms_norm_eps=1e-5, rope_theta=10000.0,
            tie_word_embeddings=False, sliding_window=None,
            attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        torch.manual_seed(0)
        m = Phi3ForCausalLM(hf).eval()
        params = import_hf_llama(m.state_dict(), n_layers=2,
                                 dtype=jnp.float32, n_heads=4, n_kv_heads=2)
        cfg = llama.LlamaConfig(
            vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
            ffn_dim=128, norm_eps=1e-5, rope_theta=10000.0,
            tie_embeddings=False, dtype=jnp.float32)
        toks = torch.randint(0, 256, (2, 16))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = llama.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)

    def test_phi3_auto_config_and_import(self):
        """auto.import_from_hf routes phi3 through the fused-split importer."""
        from transformers import Phi3Config, Phi3ForCausalLM

        from ao_tpu.integrations.auto import import_from_hf

        hf = Phi3Config(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            tie_word_embeddings=False, sliding_window=None,
            pad_token_id=0, bos_token_id=1, eos_token_id=2)
        torch.manual_seed(1)
        m = Phi3ForCausalLM(hf).eval()
        params, cfg = import_from_hf(m.state_dict(), hf.to_dict(),
                                     dtype=jnp.float32)
        assert cfg.n_kv_heads == 2 and cfg.ffn_dim == 64
        toks = torch.randint(0, 128, (1, 8))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        logits = llama.forward(params, jnp.asarray(toks.numpy()), cfg)[0]
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)


class TestQwen3MoeGroundTruth:
    def test_qwen3_moe_matches_transformers(self):
        """Qwen3-MoE: QK-norm attention + mlp.gate router + stacked
        per-expert gate/up/down projections (norm_topk_prob renorm) match
        transformers exactly in fp32, via the auto config router."""
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

        from ao_tpu.integrations.auto import import_from_hf

        hf = Qwen3MoeConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            rope_theta=10000.0, num_experts=4, num_experts_per_tok=2,
            norm_topk_prob=True, mlp_only_layers=[], decoder_sparse_step=1,
            tie_word_embeddings=False, attention_bias=False,
            sliding_window=None, use_sliding_window=False)
        torch.manual_seed(0)
        m = Qwen3MoeForCausalLM(hf).eval()
        params, cfg = import_from_hf(m.state_dict(), hf.to_dict(),
                                     dtype=jnp.float32)
        assert cfg.qk_norm and cfg.n_experts == 4
        assert cfg.norm_topk_experts
        assert "router" in params["layers"][0]["mlp"]
        assert params["layers"][0]["mlp"]["w_gate"].shape == (4, 64, 96)
        toks = torch.randint(0, 256, (2, 12))
        with torch.no_grad():
            ref = m(toks).logits.numpy()
        out = llama.forward(params, jnp.asarray(toks.numpy()), cfg)
        logits = out[0] if isinstance(out, tuple) else out
        np.testing.assert_allclose(np.asarray(logits, np.float32), ref,
                                   atol=5e-6)
