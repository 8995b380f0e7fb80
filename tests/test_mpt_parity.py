"""MPT decoder parity vs HF `MptForCausalLM` at fp32 on a tiny checkpoint —
the llava_mpt family (llava/model/language_model/llava_mpt.py) on the shared
functional decoder (ALiBi positions, bias-free LayerNorm, ungated gelu MLP).

ALiBi note: our bias uses the row-free form slopes[h]*j, which differs from
HF's (j-S+1) form by a per-row constant — softmax probabilities (and thus
hidden states/logits) are identical.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.checkpoint.hf_import import (
    convert_mpt,
    torch_state_dict_to_numpy,
)
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.models.registry import lm_config_for


@pytest.fixture(scope="module")
def tiny_mpt():
    from transformers import MptConfig, MptForCausalLM

    torch.manual_seed(0)
    hf_cfg = MptConfig(
        d_model=32, n_heads=4, n_layers=3, expansion_ratio=4,
        max_seq_len=256, vocab_size=128,
        attn_config={"attn_pdrop": 0.0},
        emb_pdrop=0.0, resid_pdrop=0.0,
    )
    hf_model = MptForCausalLM(hf_cfg).eval().float()
    cfg = lm_config_for("llava_mpt", hf_cfg.to_dict())
    sd = torch_state_dict_to_numpy(hf_model.state_dict())
    params = jax.tree.map(jnp.asarray, convert_mpt(sd, cfg))
    return hf_model, cfg, params


def test_mpt_config_mapping(tiny_mpt):
    _, cfg, params = tiny_mpt
    assert cfg.position_embedding == "alibi"
    assert cfg.norm_type == "layernorm"
    assert not cfg.mlp_gated
    assert cfg.intermediate_size == 128
    assert "gate_proj" not in params["layers"]


def test_mpt_forward_logits_match_hf(tiny_mpt):
    hf_model, cfg, params = tiny_mpt
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 11))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    positions = jnp.broadcast_to(jnp.arange(11)[None], (2, 11))
    hidden, _ = qwen2.forward(params, cfg, embeds, positions)
    logits = np.asarray(qwen2.unembed(params, cfg, hidden))
    np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)


def test_mpt_decode_matches_full_forward(tiny_mpt):
    _, cfg, params = tiny_mpt
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 9))
    # full forward over all 9 tokens
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    positions = jnp.arange(9)[None]
    hidden_full, _ = qwen2.forward(params, cfg, embeds, positions)
    # prefill 6 + decode 3 through the cache
    hidden_pre, cache = qwen2.forward(
        params, cfg, embeds[:, :6], positions[:, :6], cache_max_len=16)
    outs = []
    for t in range(6, 9):
        h, cache = qwen2.decode_step(params, cfg, embeds[:, t:t + 1], cache)
        outs.append(np.asarray(h)[:, 0])
    np.testing.assert_allclose(
        np.stack(outs, axis=1), np.asarray(hidden_full)[:, 6:9],
        rtol=2e-4, atol=2e-4)


def test_mpt_greedy_decode_matches_hf_generate(tiny_mpt):
    hf_model, cfg, params = tiny_mpt
    from memory_augmented_vlm_tpu.config import VLMConfig
    from memory_augmented_vlm_tpu.models import vlm

    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 7))
    with torch.no_grad():
        ref = hf_model.generate(
            torch.from_numpy(ids), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0).numpy()[0, 7:]
    vcfg = VLMConfig(lm=cfg)
    out = vlm.generate({"language_model": params}, vcfg,
                       qwen2.embed_tokens(params, jnp.asarray(ids[0])),
                       max_new_tokens=8, eos_token_ids=(127,),
                       pad_to_multiple=8)
    got = np.asarray(out.tokens)[: int(out.num_tokens)]
    np.testing.assert_array_equal(got, ref)
