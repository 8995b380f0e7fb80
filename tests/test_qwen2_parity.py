"""Qwen2 parity vs HF transformers at fp32 on tiny random checkpoints.

This is the golden-file harness SURVEY.md §4 calls for: the JAX decoder must
reproduce HF `Qwen2ForCausalLM` logits and greedy decodes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from memory_augmented_vlm_tpu.config import LMConfig
from memory_augmented_vlm_tpu.checkpoint.hf_import import (
    convert_qwen2,
    torch_state_dict_to_numpy,
)
from memory_augmented_vlm_tpu.models import qwen2

TINY_KW = dict(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rope_theta=10000.0,
)


@pytest.fixture(scope="module")
def tiny_models():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen2Config(tie_word_embeddings=False, attn_implementation="eager", **TINY_KW)
    hf_model = Qwen2ForCausalLM(hf_cfg).eval().float()
    cfg = LMConfig.from_hf(hf_cfg)
    sd = torch_state_dict_to_numpy(hf_model.state_dict())
    params = jax.tree.map(jnp.asarray, convert_qwen2(sd, cfg))
    return hf_model, cfg, params


def test_forward_logits_match_hf(tiny_models):
    hf_model, cfg, params = tiny_models
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()

    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    positions = jnp.broadcast_to(jnp.arange(9)[None], (2, 9))
    hidden, _ = qwen2.forward(params, cfg, embeds, positions,
                              force_reference_attention=True)
    logits = np.asarray(qwen2.unembed(params, cfg, hidden))
    np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)


def test_forward_right_padding_matches_unpadded(tiny_models):
    _, cfg, params = tiny_models
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 7))
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(7)[None]
    hidden, _ = qwen2.forward(params, cfg, embeds, pos)

    # same sequence right-padded to 12
    padded = jnp.pad(embeds, ((0, 0), (0, 5), (0, 0)))
    pos12 = jnp.arange(12)[None]
    hidden_p, _ = qwen2.forward(params, cfg, padded, pos12,
                                valid_len=jnp.asarray([7]))
    np.testing.assert_allclose(
        np.asarray(hidden_p[:, :7]), np.asarray(hidden), rtol=1e-4, atol=1e-5
    )


def test_greedy_decode_matches_hf_generate(tiny_models):
    hf_model, cfg, params = tiny_models
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 6))
    n_new = 8
    with torch.no_grad():
        ref = hf_model.generate(
            torch.from_numpy(prompt), max_new_tokens=n_new, do_sample=False,
            pad_token_id=0,
        ).numpy()[0, 6:]

    s = prompt.shape[1]
    embeds = qwen2.embed_tokens(params, jnp.asarray(prompt))
    positions = jnp.arange(s)[None]
    hidden, cache = qwen2.forward(
        params, cfg, embeds, positions, cache_max_len=s + n_new
    )
    logits = qwen2.unembed(params, cfg, hidden[:, -1:])
    tokens = []
    for _ in range(n_new):
        tok = jnp.argmax(logits[:, -1], axis=-1)
        tokens.append(int(tok[0]))
        emb = qwen2.embed_tokens(params, tok[:, None])
        hidden, cache = qwen2.decode_step(params, cfg, emb, cache)
        logits = qwen2.unembed(params, cfg, hidden)
    np.testing.assert_array_equal(np.array(tokens), ref)


def test_decode_step_matches_full_forward(tiny_models):
    """Incremental decode must equal a fresh full forward over the same ids."""
    _, cfg, params = tiny_models
    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 10))
    # full forward
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(10)[None]
    hidden_full, _ = qwen2.forward(params, cfg, embeds, pos)
    # prefill 6 + decode 4
    hidden_pre, cache = qwen2.forward(
        params, cfg, embeds[:, :6], pos[:, :6], cache_max_len=10
    )
    hs = []
    for t in range(6, 10):
        h, cache = qwen2.decode_step(params, cfg, embeds[:, t : t + 1], cache)
        hs.append(np.asarray(h[0, 0]))
    np.testing.assert_allclose(
        np.stack(hs), np.asarray(hidden_full[0, 6:]), rtol=5e-4, atol=5e-5
    )
