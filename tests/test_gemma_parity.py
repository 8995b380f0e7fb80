"""Gemma-family decoder parity vs HF transformers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from memory_augmented_vlm_tpu.checkpoint.hf_import import (
    convert_llama,
    torch_state_dict_to_numpy,
)
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.models.registry import lm_config_for


def test_gemma_forward_matches_hf():
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(0)
    hf_cfg = GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=256, rope_theta=10000.0,
        attn_implementation="eager",
    )
    hf = GemmaForCausalLM(hf_cfg).eval().float()
    cfg = lm_config_for("llava_gemma", hf_cfg.to_dict())
    assert cfg.norm_plus_one and cfg.scale_embeddings
    params = jax.tree.map(
        jnp.asarray, convert_llama(torch_state_dict_to_numpy(hf.state_dict()), cfg))

    ids = np.random.default_rng(0).integers(0, 128, size=(1, 7))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    emb = qwen2.embed_tokens(params, jnp.asarray(ids), cfg)
    pos = jnp.arange(7)[None]
    hidden, _ = qwen2.forward(params, cfg, emb, pos, force_reference_attention=True)
    logits = np.asarray(qwen2.unembed(params, cfg, hidden))
    np.testing.assert_allclose(logits, ref, rtol=5e-4, atol=5e-4)
