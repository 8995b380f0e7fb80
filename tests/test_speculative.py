"""Prompt-lookup speculative decoding: output must equal plain greedy
exactly (the acceptance rule re-derives every token from the same argmax),
with tokens-per-forward >= 1."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, vlm


@pytest.fixture(scope="module")
def tiny():
    lm = LMConfig(vocab_size=50000, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
                  dtype="float32")
    cfg = VLMConfig(lm=lm)
    params = {"language_model": qwen2.init_params(lm, jax.random.key(0))}
    return cfg, params


def _emb(params, ids):
    return qwen2.embed_tokens(
        params["language_model"], jnp.asarray(ids, jnp.int32))


@pytest.mark.parametrize("spec_k", [2, 4])
def test_speculative_matches_greedy(tiny, spec_k):
    cfg, params = tiny
    rng = np.random.default_rng(17)
    for trial in range(3):
        ids = rng.integers(0, 1000, size=(rng.integers(3, 12),))
        want = vlm.generate(params, cfg, _emb(params, ids),
                            max_new_tokens=10, eos_token_ids=(49999,),
                            pad_to_multiple=128)
        got, info = vlm.generate_speculative(
            params, cfg, _emb(params, ids), draft_ids=ids,
            max_new_tokens=10, eos_token_ids=(49999,), spec_k=spec_k)
        w = np.asarray(want.tokens)[: int(want.num_tokens)]
        g = np.asarray(got.tokens)[: int(got.num_tokens)]
        np.testing.assert_array_equal(g, w, err_msg=f"trial {trial}")
        assert 1 <= info["iterations"] <= int(got.num_tokens)


def test_speculative_eos_stops(tiny):
    """An eos proposed and accepted inside a speculation window must
    truncate the emission at the eos, exactly like plain greedy."""
    cfg, params = tiny
    rng = np.random.default_rng(23)
    ids = rng.integers(0, 1000, size=(6,))
    # find the greedy continuation, then declare its 3rd token the eos
    plain = vlm.generate(params, cfg, _emb(params, ids), max_new_tokens=8,
                         eos_token_ids=(49999,), pad_to_multiple=128)
    toks = np.asarray(plain.tokens)[: int(plain.num_tokens)]
    assert len(toks) >= 3
    eos = int(toks[2])
    want = vlm.generate(params, cfg, _emb(params, ids), max_new_tokens=8,
                        eos_token_ids=(eos,), pad_to_multiple=128)
    got, _ = vlm.generate_speculative(
        params, cfg, _emb(params, ids), draft_ids=ids, max_new_tokens=8,
        eos_token_ids=(eos,), spec_k=4)
    np.testing.assert_array_equal(
        np.asarray(got.tokens)[: int(got.num_tokens)],
        np.asarray(want.tokens)[: int(want.num_tokens)])


def test_speculative_accepts_on_repetitive_model(tiny):
    """Random tiny models greedy-degenerate into repeats — the bigram
    lookup must then accept drafts and finish in fewer forwards than
    tokens."""
    cfg, params = tiny
    rng = np.random.default_rng(29)
    ids = rng.integers(0, 1000, size=(5,))
    got, info = vlm.generate_speculative(
        params, cfg, _emb(params, ids), draft_ids=ids,
        max_new_tokens=16, eos_token_ids=(49999,), spec_k=4)
    n = int(got.num_tokens)
    assert n == 16
    # K=4 over a degenerate repeat: near-ideal acceptance (16/4 = 4
    # forwards ideal; allow slack for the first-bigram warmup)
    assert info["iterations"] <= 6, info


def test_eval_surface_prompt_lookup(tiny):
    """MavlmForCausalLM.generate(prompt_lookup_num_tokens=N) routes through
    the speculative path and matches the plain call on a video prompt."""
    from memory_augmented_vlm_tpu import constants
    from memory_augmented_vlm_tpu.eval.model import MavlmForCausalLM
    from tests.test_vlm import TINY

    params = vlm.init_params(TINY, jax.random.key(0))
    model = MavlmForCausalLM(params, TINY, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    ids = np.concatenate([rng.integers(0, 1000, size=(6,)),
                          [constants.IMAGE_TOKEN_INDEX],
                          rng.integers(0, 1000, size=(4,))])[None]
    frames = rng.integers(0, 255, (8, 56, 56, 3)).astype(np.uint8)
    kw = dict(images=[frames], modalities=["video"], max_new_tokens=6,
              eos_token_id=49999)
    plain = model.generate(ids, **kw)
    spec = model.generate(ids, prompt_lookup_num_tokens=4, **kw)
    np.testing.assert_array_equal(spec, plain)
