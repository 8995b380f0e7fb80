"""load_pretrained_model round-trip on a synthetic HF-format checkpoint.

Builds a tiny checkpoint directory with the reference's exact key naming
(`model.`-prefixed Qwen2 keys, `model.vision_tower.vision_tower.vision_model.*`
tower keys, `model.mm_projector.{0,2}.*`, memory-module keys), then loads it
through the public API and generates.
"""

import json

import numpy as np
import pytest
import torch
import jax

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    from safetensors.torch import save_file
    from transformers import Qwen2ForCausalLM, Qwen2Config, SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("tiny_ckpt")

    lm_cfg = dict(
        vocab_size=50000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, rope_theta=10000.0,
    )
    hf_lm = Qwen2ForCausalLM(Qwen2Config(tie_word_embeddings=False, **lm_cfg)).float()
    vis = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14)).float()

    sd = {}
    for k, v in hf_lm.state_dict().items():
        if k == "lm_head.weight":
            sd[k] = v
        else:
            sd[k] = v  # already model.-prefixed by HF (model.layers...)
    for k, v in vis.state_dict().items():
        sd["model.vision_tower.vision_tower." + k] = v
    h = 32
    sd["model.mm_projector.0.weight"] = torch.randn(h, 24) * 0.02
    sd["model.mm_projector.0.bias"] = torch.zeros(h)
    sd["model.mm_projector.2.weight"] = torch.randn(h, h) * 0.02
    sd["model.mm_projector.2.bias"] = torch.zeros(h)
    # memory modules (depth=2 default)
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

    # memory geometry consistent with the tiny tower: 56px/14 -> 4x4 patches
    # -> 2x2 pooled = 4 tokens/frame
    rmt = "model.recurrent_memory_transformer"
    sd[f"{rmt}.initial_memory"] = torch.randn(2, 4, h) * 0.02
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

    save_file({k: v.contiguous() for k, v in sd.items()}, str(d / "model.safetensors"))
    # loadable fast tokenizer so serve/eval paths work against this checkpoint
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers, trainers

    tok = Tokenizer(tok_models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=2000,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        show_progress=False,
    )
    tok.train_from_iterator(
        ["describe the video", "hello world", "a cat sits", "what is here"] * 50,
        trainer,
    )
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "<|im_end|>", "pad_token": "<|endoftext|>"}, f)
    config = dict(
        lm_cfg,
        model_type="llava_qwen",
        mm_projector_type="mlp2x_gelu",
        mm_patch_merge_type="spatial_unpad",
        mm_newline_position="one_token",
        mm_spatial_pool_mode="bilinear",
        tokenizer_model_max_length=2048,
        tie_word_embeddings=False,
    )
    with open(d / "config.json", "w") as f:
        json.dump(config, f)
    return str(d)


def test_load_and_generate(ckpt_dir):
    tokenizer, model, image_processor, context_len = load_pretrained_model(
        ckpt_dir, None, "llava_qwen", torch_dtype="float32"
    )
    assert context_len == 2048
    assert model.config.hidden_size == 32
    assert image_processor.size == (56, 56)  # matches the checkpoint tower

    # text-only generate
    ids = np.array([[10, 20, 30]], np.int64)
    out = model.generate(ids, max_new_tokens=4, eos_token_id=49999)
    assert out.shape[0] == 1 and out.shape[1] <= 4

    # video generate end-to-end through preprocessing geometry
    # (56px tower -> 16 patches -> pooled 2x2=4 tokens/frame; but memory cfg
    # defaults to 196-patch geometry, so build pixels at the tower size and
    # skip: geometry mismatch is validated in the full-size path.)


def test_overwrite_config(ckpt_dir):
    _, model, _, _ = load_pretrained_model(
        ckpt_dir, None, "llava_qwen", torch_dtype="float32",
        overwrite_config={"mm_spatial_pool_mode": "average"},
    )
    assert model.cfg.pipeline.mm_spatial_pool_mode == "average"


def test_load_safetensors_bf16(tmp_path):
    """Real flagship checkpoints ship in bfloat16; the importer must decode
    them (numpy-framework safetensors surfaces bf16 as a void dtype)."""
    from safetensors.torch import save_file

    from memory_augmented_vlm_tpu.checkpoint.hf_import import load_safetensors_dir

    t = torch.arange(8, dtype=torch.float32).reshape(2, 4) / 3.0
    save_file({"w": t.to(torch.bfloat16)}, str(tmp_path / "model.safetensors"))
    sd = load_safetensors_dir(str(tmp_path))
    assert sd["w"].dtype == np.float32
    np.testing.assert_allclose(
        sd["w"], t.to(torch.bfloat16).to(torch.float32).numpy())
