"""End-to-end registry wiring: alternative towers and LM families must be
reachable through the public `load_pretrained_model` -> `generate` path
(reference: multimodal_encoder/builder.py:13-41 tower dispatch,
model/builder.py:206-228 family dispatch).

Covers the round-1 gaps: CLIP-tower VLM through the spine (encode_frames
previously hardcoded siglip), and Llama-backbone loading through
registry.lm_config_for (previously hand-built with Qwen2's
attention_bias=True default).
"""

import json

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model

H = 32  # LM hidden


def _memory_keys(h, patch):
    def attn(prefix):
        out = {}
        for name in ("q_proj", "k_proj", "v_proj"):
            out[f"{prefix}.{name}.weight"] = torch.randn(h, h) * 0.02
            out[f"{prefix}.{name}.bias"] = torch.zeros(h)
        out[f"{prefix}.residual.dense.weight"] = torch.randn(h, h) * 0.02
        out[f"{prefix}.residual.dense.bias"] = torch.zeros(h)
        out[f"{prefix}.residual.layernorm.weight"] = torch.ones(h)
        out[f"{prefix}.residual.layernorm.bias"] = torch.zeros(h)
        return out

    sd = {}
    rmt = "model.recurrent_memory_transformer"
    sd[f"{rmt}.initial_memory"] = torch.randn(2, patch, h) * 0.02
    sd[f"{rmt}.memory_pos_embed"] = torch.randn(2, 1, h)
    sd.update(attn(f"{rmt}.memory_update_attention"))
    for i in range(2):
        sd.update(attn(f"{rmt}.layers.{i}.memory_segment_fusion_attention"))
        sd[f"{rmt}.layers.{i}.mlp.0.weight"] = torch.randn(4 * h, h) * 0.02
        sd[f"{rmt}.layers.{i}.mlp.0.bias"] = torch.zeros(4 * h)
        sd[f"{rmt}.layers.{i}.residual.dense.weight"] = torch.randn(h, 4 * h) * 0.02
        sd[f"{rmt}.layers.{i}.residual.dense.bias"] = torch.zeros(h)
        sd[f"{rmt}.layers.{i}.residual.layernorm.weight"] = torch.ones(h)
        sd[f"{rmt}.layers.{i}.residual.layernorm.bias"] = torch.zeros(h)
    sd["model.memory_fuser.0.weight"] = torch.randn(4 * h, h) * 0.02
    sd["model.memory_fuser.0.bias"] = torch.zeros(4 * h)
    sd["model.memory_fuser.2.weight"] = torch.randn(h, 4 * h) * 0.02
    sd["model.memory_fuser.2.bias"] = torch.zeros(h)
    sd["model.token_type_embedding.weight"] = torch.randn(2, h) * 0.02
    sd["model.image_newline"] = torch.randn(h) * 0.02
    return sd


def _projector_keys(vision_hidden):
    return {
        "model.mm_projector.0.weight": torch.randn(H, vision_hidden) * 0.02,
        "model.mm_projector.0.bias": torch.zeros(H),
        "model.mm_projector.2.weight": torch.randn(H, H) * 0.02,
        "model.mm_projector.2.bias": torch.zeros(H),
    }


def _write_ckpt(d, sd, config):
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in sd.items()},
              str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump(config, f)
    return str(d)


@pytest.fixture(scope="module")
def clip_ckpt(tmp_path_factory):
    """Tiny llava_qwen checkpoint with a CLIP vision tower (56px/14 -> 16
    patches -> 4 pooled tokens/frame)."""
    from transformers import CLIPVisionConfig, CLIPVisionModel, Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("clip_ckpt")
    lm_cfg = dict(
        vocab_size=50000, hidden_size=H, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, rope_theta=10000.0,
    )
    hf_lm = Qwen2ForCausalLM(Qwen2Config(tie_word_embeddings=False, **lm_cfg)).float()
    vis = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=8, image_size=56, patch_size=14)).float()

    sd = dict(hf_lm.state_dict())
    for k, v in vis.state_dict().items():
        sd["model.vision_tower.vision_tower." + k] = v
    sd.update(_projector_keys(24))
    sd.update(_memory_keys(H, patch=4))
    config = dict(
        lm_cfg,
        model_type="llava_qwen",
        mm_vision_tower="openai/clip-vit-large-patch14",
        mm_projector_type="mlp2x_gelu",
        mm_newline_position="one_token",
        tokenizer_model_max_length=2048,
        tie_word_embeddings=False,
    )
    return _write_ckpt(d, sd, config)


@pytest.fixture(scope="module")
def llama_ckpt(tmp_path_factory):
    """Tiny llava_llama checkpoint (no qkv bias) with a SigLIP tower."""
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        SiglipVisionConfig,
        SiglipVisionModel,
    )

    torch.manual_seed(1)
    d = tmp_path_factory.mktemp("llama_ckpt")
    lm_cfg = dict(
        vocab_size=50000, hidden_size=H, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, rope_theta=10000.0,
    )
    hf_lm = LlamaForCausalLM(LlamaConfig(tie_word_embeddings=False, **lm_cfg)).float()
    vis = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14)).float()

    sd = dict(hf_lm.state_dict())
    for k, v in vis.state_dict().items():
        sd["model.vision_tower.vision_tower." + k] = v
    sd.update(_projector_keys(24))
    sd.update(_memory_keys(H, patch=4))
    config = dict(
        lm_cfg,
        model_type="llava_llama",
        mm_vision_tower="google/siglip-so400m-patch14-384",
        mm_projector_type="mlp2x_gelu",
        mm_newline_position="one_token",
        tokenizer_model_max_length=2048,
        tie_word_embeddings=False,
    )
    return _write_ckpt(d, sd, config)


def _video_ids():
    return np.array([10, 20, constants.IMAGE_TOKEN_INDEX, 30, 40], np.int64)


def test_clip_tower_vlm_generates(clip_ckpt):
    _, model, _, _ = load_pretrained_model(clip_ckpt, None, "llava_qwen",
                                           torch_dtype="float32")
    assert type(model.cfg.vision).__name__ == "CLIPVisionConfig"
    assert model.cfg.pipeline.mm_vision_tower.startswith("openai/clip")
    assert model.cfg.memory.patch_size == 4  # derived from tower geometry
    rng = np.random.default_rng(0)
    frames = (rng.uniform(0, 255, (4, 56, 56, 3))).astype(np.uint8)
    out = model.generate(_video_ids(), images=frames, modalities="video",
                         max_new_tokens=3, eos_token_id=49999)
    assert out.shape[0] == 1 and out.shape[1] <= 3
    assert np.all(out >= 0)


def test_llama_backbone_vlm_generates(llama_ckpt):
    _, model, _, _ = load_pretrained_model(llama_ckpt, None, "llava_llama",
                                           torch_dtype="float32")
    # the round-1 latent bug: Llama loaded with Qwen2's attention_bias=True
    assert model.cfg.lm.attention_bias is False
    rng = np.random.default_rng(1)
    frames = (rng.uniform(0, 255, (4, 56, 56, 3))).astype(np.uint8)
    out = model.generate(_video_ids(), images=frames, modalities="video",
                         max_new_tokens=3, eos_token_id=49999)
    assert out.shape[0] == 1 and out.shape[1] <= 3


def test_llama_text_logits_match_hf(llama_ckpt):
    """Loading a Llama-family Llava checkpoint through load_pretrained_model
    must reproduce HF logits (catches bias/config dispatch drift)."""
    from transformers import LlamaForCausalLM

    from memory_augmented_vlm_tpu.models import qwen2

    _, model, _, _ = load_pretrained_model(llama_ckpt, None, "llava_llama",
                                           torch_dtype="float32")
    hf = LlamaForCausalLM.from_pretrained(llama_ckpt).float().eval()
    ids = np.array([[3, 1, 4, 1, 5, 9, 2, 6]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    embeds = qwen2.embed_tokens(model.params["language_model"],
                                jnp.asarray(ids, jnp.int32), model.cfg.lm)
    hidden, _ = qwen2.forward(
        model.params["language_model"], model.cfg.lm, embeds,
        jnp.arange(ids.shape[1])[None], force_reference_attention=True)
    got = np.asarray(qwen2.unembed(model.params["language_model"],
                                   model.cfg.lm, hidden))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
