"""HF-generate semantics parity: sampling warpers, repetition penalty,
keyword ("until") stopping, and batch>1 decode.

Reference behavior: the eval path calls HF `GenerationMixin` through
`LlavaQwenForCausalLM.generate` (llava/model/language_model/llava_qwen.py:116-136)
with KeywordsStoppingCriteria (llava/mm_utils.py:372). Logits-processor math
is pinned against `transformers` processors at fp32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
from memory_augmented_vlm_tpu.checkpoint.hf_import import (
    convert_qwen2,
    torch_state_dict_to_numpy,
)
from memory_augmented_vlm_tpu.models import qwen2, sampling, vlm

TINY_KW = dict(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rope_theta=10000.0,
)


@pytest.fixture(scope="module")
def tiny():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen2Config(tie_word_embeddings=False,
                         attn_implementation="eager", **TINY_KW)
    hf_model = Qwen2ForCausalLM(hf_cfg).eval().float()
    lm_cfg = LMConfig.from_hf(hf_cfg)
    sd = torch_state_dict_to_numpy(hf_model.state_dict())
    params = {"language_model": jax.tree.map(jnp.asarray, convert_qwen2(sd, lm_cfg))}
    cfg = VLMConfig(lm=lm_cfg)
    return hf_model, cfg, params


def _embeds(params, ids):
    return qwen2.embed_tokens(
        params["language_model"], jnp.asarray(ids, jnp.int32))


# ---------------------------------------------------------------------------
# Logits processors vs transformers
# ---------------------------------------------------------------------------

def test_top_k_matches_hf():
    from transformers import TopKLogitsWarper

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 64)).astype(np.float32)
    ref = TopKLogitsWarper(top_k=7, filter_value=sampling.NEG_INF)(
        None, torch.from_numpy(logits)).numpy()
    got = np.asarray(sampling.apply_top_k(jnp.asarray(logits), 7))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_top_p_matches_hf():
    from transformers import TopPLogitsWarper

    rng = np.random.default_rng(1)
    logits = (3.0 * rng.normal(size=(4, 64))).astype(np.float32)
    for p in (0.3, 0.8, 0.95):
        ref = TopPLogitsWarper(top_p=p, filter_value=sampling.NEG_INF)(
            None, torch.from_numpy(logits)).numpy()
        got = np.asarray(sampling.apply_top_p(jnp.asarray(logits), p))
        np.testing.assert_allclose(got, ref, rtol=1e-6,
                                   err_msg=f"top_p={p}")


def test_repetition_penalty_matches_hf():
    from transformers import RepetitionPenaltyLogitsProcessor

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 64)).astype(np.float32)
    seen = np.array([[3, 9, 9, 17], [0, 1, 2, 3]])
    ref = RepetitionPenaltyLogitsProcessor(penalty=1.3)(
        torch.from_numpy(seen), torch.from_numpy(logits)).numpy()
    presence = np.zeros((2, 64), bool)
    for b in range(2):
        presence[b, seen[b]] = True
    got = np.asarray(sampling.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(presence), 1.3))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


# ---------------------------------------------------------------------------
# End-to-end decode semantics vs HF generate
# ---------------------------------------------------------------------------

def test_greedy_with_repetition_penalty_matches_hf(tiny):
    hf_model, cfg, params = tiny
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.lm.vocab_size, size=(1, 7))
    with torch.no_grad():
        # inputs_embeds-only call like the reference: penalty set starts empty
        emb = hf_model.get_input_embeddings()(torch.from_numpy(ids))
        ref = hf_model.generate(
            inputs_embeds=emb, max_new_tokens=12, do_sample=False,
            repetition_penalty=1.5, eos_token_id=None, pad_token_id=0,
        ).numpy()[0]
    out = vlm.generate(
        params, cfg, _embeds(params, ids[0]),
        max_new_tokens=12, eos_token_ids=(127,), repetition_penalty=1.5,
        pad_to_multiple=8,
    )
    got = np.asarray(out.tokens)[: int(out.num_tokens)]
    np.testing.assert_array_equal(got, ref)


def test_keyword_stopping_truncates_at_first_hit(tiny):
    _, cfg, params = tiny
    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.lm.vocab_size, size=(9,))
    base = vlm.generate(params, cfg, _embeds(params, ids),
                        max_new_tokens=16, eos_token_ids=(127,),
                        pad_to_multiple=8)
    full = np.asarray(base.tokens)[: int(base.num_tokens)]
    assert len(full) >= 3, "tiny model should emit a few tokens"
    stop = tuple(int(t) for t in full[1:3])  # 2-token keyword inside output
    out = vlm.generate(params, cfg, _embeds(params, ids),
                       max_new_tokens=16, eos_token_ids=(127,),
                       stop_sequences=(stop,), pad_to_multiple=8)
    got = np.asarray(out.tokens)[: int(out.num_tokens)]
    # stops immediately after the keyword completes (criteria checked per step)
    np.testing.assert_array_equal(got, full[:3])


def test_batched_matches_per_row_greedy(tiny):
    _, cfg, params = tiny
    rng = np.random.default_rng(5)
    lens = [5, 9, 3]
    rows = [rng.integers(0, cfg.lm.vocab_size, size=(n,)) for n in lens]
    singles = [
        vlm.generate(params, cfg, _embeds(params, r), max_new_tokens=10,
                     eos_token_ids=(127,), pad_to_multiple=8)
        for r in rows
    ]
    smax = 16
    stacked = jnp.stack([
        jnp.pad(_embeds(params, r), ((0, smax - len(r)), (0, 0)))
        for r in rows
    ])
    out = vlm.generate_batched(
        params, cfg, stacked, jnp.asarray(lens, jnp.int32),
        max_new_tokens=10, eos_token_ids=(127,))
    for b, single in enumerate(singles):
        n_single = int(single.num_tokens)
        n_batch = int(out.num_tokens[b])
        assert n_batch == n_single
        np.testing.assert_array_equal(
            np.asarray(out.tokens)[b, :n_batch],
            np.asarray(single.tokens)[:n_single])


def test_sampling_deterministic_and_topk1_is_greedy(tiny):
    _, cfg, params = tiny
    rng = np.random.default_rng(6)
    ids = rng.integers(0, cfg.lm.vocab_size, size=(6,))
    emb = _embeds(params, ids)
    a = vlm.generate(params, cfg, emb, max_new_tokens=8, eos_token_ids=(127,),
                     do_sample=True, temperature=0.9, top_p=0.9,
                     rng=jax.random.key(7), pad_to_multiple=8)
    b = vlm.generate(params, cfg, emb, max_new_tokens=8, eos_token_ids=(127,),
                     do_sample=True, temperature=0.9, top_p=0.9,
                     rng=jax.random.key(7), pad_to_multiple=8)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))

    greedy = vlm.generate(params, cfg, emb, max_new_tokens=8,
                          eos_token_ids=(127,), pad_to_multiple=8)
    k1 = vlm.generate(params, cfg, emb, max_new_tokens=8, eos_token_ids=(127,),
                      do_sample=True, temperature=0.7, top_k=1,
                      rng=jax.random.key(8), pad_to_multiple=8)
    np.testing.assert_array_equal(np.asarray(k1.tokens), np.asarray(greedy.tokens))


def test_model_shell_batched_generate(tiny):
    from memory_augmented_vlm_tpu.eval.model import MavlmForCausalLM

    _, cfg, params = tiny
    model = MavlmForCausalLM(params, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    ids = rng.integers(0, cfg.lm.vocab_size, size=(2, 6)).astype(np.int64)
    # left-padded HF-style batch with attention mask
    padded = np.concatenate([np.zeros((2, 2), np.int64), ids], axis=1)
    mask = np.concatenate([np.zeros((2, 2), np.int64),
                           np.ones((2, 6), np.int64)], axis=1)
    out = model.generate(padded, attention_mask=mask, max_new_tokens=6,
                         eos_token_id=127)
    assert out.shape[0] == 2
    ref0 = model.generate(ids[0:1], max_new_tokens=6, eos_token_id=127)
    np.testing.assert_array_equal(out[0, : ref0.shape[1]], ref0[0])
