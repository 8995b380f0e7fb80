"""Llama-family decoder parity vs HF transformers (no-bias attention path)."""

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


def test_llama_forward_matches_hf():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    hf = LlamaForCausalLM(hf_cfg).eval().float()
    cfg = lm_config_for("llava_llama", hf_cfg.to_dict())
    assert not cfg.attention_bias
    params = jax.tree.map(
        jnp.asarray, convert_llama(torch_state_dict_to_numpy(hf.state_dict()), cfg))
    assert "bias" not in params["layers"]["q_proj"]

    ids = np.random.default_rng(0).integers(0, 128, size=(2, 7))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(7)[None], (2, 7))
    hidden, _ = qwen2.forward(params, cfg, emb, pos, force_reference_attention=True)
    logits = np.asarray(qwen2.unembed(params, cfg, hidden))
    np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)
