"""Regression tests for the round-2 code-review findings: MPT loader
dispatch, int4 double-bias, CLIP layer-count inference, batch-engine
oversized prompts, until-string normalization, imagebind config construction,
and UTF-8-safe stream decoding."""

import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


def test_load_pretrained_model_dispatches_mpt(tmp_path):
    """An llava_mpt checkpoint must load through convert_mpt end to end."""
    from safetensors.torch import save_file

    from transformers import MptConfig, MptForCausalLM

    torch.manual_seed(0)
    hf_cfg = MptConfig(d_model=32, n_heads=4, n_layers=2, expansion_ratio=4,
                       max_seq_len=256, vocab_size=50000,
                       attn_config={"attn_pdrop": 0.0},
                       emb_pdrop=0.0, resid_pdrop=0.0)
    hf = MptForCausalLM(hf_cfg).float()
    sd = {"model." + k: v for k, v in hf.state_dict().items()
          if not k.startswith("lm_head")}
    d = tmp_path / "mpt_ckpt"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "model_type": "llava_mpt",
        "d_model": 32, "n_heads": 4, "n_layers": 2, "expansion_ratio": 4,
        "max_seq_len": 256, "vocab_size": 50000,
        "mm_vision_tower": "google/siglip-so400m-patch14-384",
    }))

    from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model

    tokenizer, model, _, _ = load_pretrained_model(str(d), None, "llava_mpt",
                                                   torch_dtype="float32")
    assert model.cfg.lm.position_embedding == "alibi"
    out = model.generate(np.array([[5, 9, 23]]), max_new_tokens=4,
                         eos_token_id=49999)
    assert out.shape[0] == 1 and out.shape[1] >= 1


def test_int4_qkv_bias_added_once():
    """load_4bit on a bias-carrying model (Qwen): the qkv bias must be
    applied exactly once (was double-added through _qkv + int4_linear)."""
    from memory_augmented_vlm_tpu.config import LMConfig
    from memory_augmented_vlm_tpu.models import qwen2

    cfg = LMConfig(vocab_size=50000, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
                   attention_bias=True)
    params = qwen2.init_params(cfg, jax.random.key(0))
    # non-zero biases expose double addition
    for name in ("q_proj", "k_proj", "v_proj"):
        params["layers"][name]["bias"] = (
            jax.random.normal(jax.random.key(1), params["layers"][name]["bias"].shape))
    ids = np.random.default_rng(0).integers(0, 1000, size=(1, 8))
    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(8)[None]
    ref = np.asarray(qwen2.forward(params, cfg, emb, pos)[0])
    for bits in (8, 4):
        qp = qwen2.prequantize_int8(params, cfg, bits=bits)
        got = np.asarray(qwen2.forward(qp, cfg, emb, pos)[0])
        rms = np.abs(got - ref).std() / ref.std()
        assert rms < (0.05 if bits == 8 else 0.15), (bits, rms)


def test_infer_vision_config_clip_keeps_stored_layer_count():
    """Reference CLIP/MLCD towers are stored FULL (only SigLIP trims its
    last layer); num_hidden_layers must equal the stored count so the -2
    tap lands where the reference's does."""
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    from memory_augmented_vlm_tpu.eval.builder import infer_vision_config

    torch.manual_seed(0)
    L = 3
    hf = CLIPVisionModel(HFCfg(hidden_size=32, intermediate_size=64,
                               num_hidden_layers=L, num_attention_heads=4,
                               image_size=56, patch_size=14)).float()
    sd = {"vision_model." + k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = infer_vision_config(sd, "openai/clip-vit-base")
    assert cfg.num_hidden_layers == L  # NOT L+1
    # used layers (select -2) = L-1, matching hidden_states[-2]
    assert cfg.num_hidden_layers + cfg.select_layer + 1 == L - 1

    # SigLIP checkpoints ARE trimmed: stored L -> num_hidden_layers L+1
    from transformers import SiglipVisionConfig, SiglipVisionModel

    sig = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=L,
        num_attention_heads=4, image_size=56, patch_size=14)).float()
    ssd = {"vision_model." + k: v.numpy() for k, v in sig.state_dict().items()}
    scfg = infer_vision_config(ssd, "google/siglip-so400m-patch14-384")
    assert scfg.num_hidden_layers == L + 1
    assert scfg.num_used_layers == L


def test_batch_engine_rejects_oversized_prompt():
    from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
    from memory_augmented_vlm_tpu.models import qwen2
    from memory_augmented_vlm_tpu.serve.batch_engine import BatchEngine

    lm = LMConfig(vocab_size=50000, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
                  dtype="float32")
    params = {"language_model": qwen2.init_params(lm, jax.random.key(0))}
    engine = BatchEngine(params, VLMConfig(lm=lm), num_slots=1,
                         max_len=128).start()
    try:
        big = np.zeros((256, 32), np.float32)   # > max_len
        out = engine.generate(big, max_new_tokens=4, eos_token_ids=(49999,))
        assert out.size == 0  # rejected, not a hang/crash
        # the engine must still serve the next (valid) request
        ids = np.array([1, 2, 3])
        emb = np.asarray(qwen2.embed_tokens(params["language_model"],
                                            jnp.asarray(ids, jnp.int32)))
        ok = engine.generate(emb, max_new_tokens=4, eos_token_ids=(49999,))
        assert ok.size > 0
    finally:
        engine.shutdown()


def test_imagebind_vlm_config_constructs():
    import dataclasses

    from memory_augmented_vlm_tpu.config import PipelineConfig, VLMConfig

    cfg = VLMConfig(pipeline=PipelineConfig(mm_vision_tower="imagebind_huge"))
    assert cfg.memory.patch_size == 1  # one global token per image


from tests.test_builder_roundtrip import ckpt_dir  # fixture


def test_adapter_until_accepts_bare_string(ckpt_dir):
    """lmms-eval tasks may pass gen_kwargs['until'] as a bare string; it
    must be treated as ONE stop sequence, not iterated char by char."""
    from memory_augmented_vlm_tpu.eval.lmms_adapter import MavlmTpu

    m = MavlmTpu(pretrained=ckpt_dir, max_frames_num=4)
    # a single-char until would previously truncate at the first occurrence
    # of ANY character of the string; with normalization the call just runs
    ans = m.answer("hello?", max_new_tokens=4, until="ASSISTANT:")
    assert isinstance(ans, str)
    multi = m.answer_multi_round(["q1", "q2"], max_new_tokens=3,
                                 until="</s>")
    assert len(multi) == 2
