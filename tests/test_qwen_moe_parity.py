"""Qwen2MoE decoder parity vs HF transformers (fp32).

The reference ships the wrapper (llava/model/language_model/
llava_qwen_moe.py:1-149 on stock HF Qwen2MoeForCausalLM) but comments it out
of its registry (llava/model/__init__.py:8). Here it is a config-flag
variant of the shared MoE decoder — parity pins the un-renormalized top-k
routing (norm_topk_prob=False), the gated shared expert, and the qkv-bias
attention.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.checkpoint.hf_import import (
    convert_qwen2_moe,
    torch_state_dict_to_numpy,
)
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.models.registry import AVAILABLE_MODELS, lm_config_for


@pytest.fixture(scope="module")
def tiny_qwen_moe():
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen2MoeConfig(
        vocab_size=503,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=48,
        shared_expert_intermediate_size=80,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=False,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    hf = Qwen2MoeForCausalLM(hf_cfg).float().eval()
    cfg = lm_config_for("llava_qwen_moe", hf_cfg.to_dict())
    params = jax.tree.map(
        jnp.asarray,
        convert_qwen2_moe(torch_state_dict_to_numpy(hf.state_dict()), cfg),
    )
    return hf, cfg, params


def test_registry_accepts_qwen_moe():
    assert AVAILABLE_MODELS["llava_qwen_moe"] == "supported"
    cfg = lm_config_for("llava_qwen_moe", {"num_experts": 60,
                                           "moe_intermediate_size": 1408})
    assert cfg.num_local_experts == 60 and cfg.intermediate_size == 1408
    assert cfg.attention_bias is True
    assert cfg.moe_norm_topk_prob is False
    assert cfg.moe_shared_expert_size == 5632
    with pytest.raises(NotImplementedError):
        lm_config_for("llava_qwen_moe", {"decoder_sparse_step": 2})


def test_qwen_moe_logits_match_hf(tiny_qwen_moe):
    hf, cfg, params = tiny_qwen_moe
    ids = np.array([[3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids, jnp.int32), cfg)
    hidden, _ = qwen2.forward(
        params, cfg, embeds, jnp.arange(ids.shape[1])[None],
        force_reference_attention=True,
    )
    got = np.asarray(qwen2.unembed(params, cfg, hidden))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_qwen_moe_norm_topk_variant(tiny_qwen_moe):
    """norm_topk_prob=True must renormalize (different logits unless the
    top-k weights already summed to 1)."""
    import dataclasses

    _, cfg, params = tiny_qwen_moe
    cfg_norm = dataclasses.replace(cfg, moe_norm_topk_prob=True)
    ids = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    embeds = qwen2.embed_tokens(params, ids, cfg)
    h0, _ = qwen2.forward(params, cfg, embeds, jnp.arange(5)[None],
                          force_reference_attention=True)
    h1, _ = qwen2.forward(params, cfg_norm, embeds, jnp.arange(5)[None],
                          force_reference_attention=True)
    assert not np.allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)


def test_qwen_moe_decode_matches_prefill(tiny_qwen_moe):
    _, cfg, params = tiny_qwen_moe
    ids = np.array([[7, 8, 9, 10]], np.int64)
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids, jnp.int32), cfg)
    hidden, cache = qwen2.forward(
        params, cfg, embeds, jnp.arange(4)[None], cache_max_len=8,
        force_reference_attention=True,
    )
    tok = int(jnp.argmax(qwen2.unembed(params, cfg, hidden[:, -1:])))
    toks = [tok]
    for _ in range(3):
        emb = qwen2.embed_tokens(params, jnp.asarray([[toks[-1]]], jnp.int32), cfg)
        hidden, cache = qwen2.decode_step(params, cfg, emb, cache)
        toks.append(int(jnp.argmax(qwen2.unembed(params, cfg, hidden))))

    full = list(ids[0])
    oracle = []
    for _ in range(4):
        emb = qwen2.embed_tokens(params, jnp.asarray([full], jnp.int32), cfg)
        hidden, _ = qwen2.forward(
            params, cfg, emb, jnp.arange(len(full))[None],
            force_reference_attention=True,
        )
        nxt = int(jnp.argmax(qwen2.unembed(params, cfg, hidden[:, -1:])))
        oracle.append(nxt)
        full.append(nxt)
    assert toks == oracle


def test_qwen_moe_init_params_shapes(tiny_qwen_moe):
    _, cfg, _ = tiny_qwen_moe
    params = qwen2.init_params(cfg, jax.random.key(0))
    se = params["layers"]["shared_expert"]
    assert se["gate_proj"]["kernel"].shape == (2, 32, 80)
    assert se["down_proj"]["kernel"].shape == (2, 80, 32)
    assert params["layers"]["shared_expert_gate"]["kernel"].shape == (2, 32, 1)
