"""Generate-surface fuzz vs HF `transformers` (VERDICT round-3 item 4):
one property sweep over the cartesian space do_sample x temperature x
top-k x top-p x repetition-penalty x num_beams x eos-set x batch/left-pad
on a tiny Qwen2 checkpoint, comparing token-exactly through the public
`MavlmForCausalLM.generate` surface.

Sampled configs run at temperature 1e-4 where the multinomial is
deterministic on both sides (the per-step top-1 margin, amplified x1e4,
dwarfs both sampling noise and cross-framework fp drift for these pinned
seeds), so sampled rows are exact too — the warp pipeline (temperature ->
top-k -> top-p) is exercised for real."""

import itertools

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
from memory_augmented_vlm_tpu.checkpoint.hf_import import (
    convert_qwen2,
    torch_state_dict_to_numpy,
)
from memory_augmented_vlm_tpu.eval.model import MavlmForCausalLM

TINY_KW = dict(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=512, rope_theta=10000.0,
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
    params = {"language_model": jax.tree.map(jnp.asarray,
                                             convert_qwen2(sd, lm_cfg))}
    model = MavlmForCausalLM(params, VLMConfig(lm=lm_cfg),
                             dtype=jnp.float32)
    return hf_model, model


# the sweep: every dimension VERDICT item 4 names, subsampled to keep the
# suite fast (each distinct config is a fresh jit compile)
SPACE = dict(
    batch=[1, 3],
    num_beams=[1, 2],
    do_sample=[False, True],
    repetition_penalty=[1.0, 1.3],
    top_k=[0, 5],
    top_p=[1.0, 0.9],
    eos=[(127,), (120, 121)],
)


def _configs():
    keys = list(SPACE)
    full = [dict(zip(keys, vals))
            for vals in itertools.product(*SPACE.values())]
    # deterministic subsample covering each value of each dimension at
    # least twice
    rng = np.random.default_rng(1234)
    picked = list(rng.choice(len(full), size=14, replace=False))
    cfgs = [full[i] for i in picked]
    # force a few interesting corners into the sweep
    cfgs += [
        dict(batch=3, num_beams=2, do_sample=False, repetition_penalty=1.3,
             top_k=0, top_p=1.0, eos=(127,)),
        dict(batch=2, num_beams=1, do_sample=True, repetition_penalty=1.0,
             top_k=5, top_p=0.9, eos=(127,)),
        dict(batch=1, num_beams=2, do_sample=True, repetition_penalty=1.0,
             top_k=0, top_p=1.0, eos=(127,)),
    ]
    out = []
    for c in cfgs:
        if c["num_beams"] > 1 and c["repetition_penalty"] != 1.0 \
                and c["do_sample"]:
            c = dict(c, repetition_penalty=1.0)  # HF warns + the pinned
            # beam-sample parity only holds with pure warpers
        out.append(c)
    # dedupe
    seen, uniq = set(), []
    for c in out:
        key = tuple(sorted((k, str(v)) for k, v in c.items()))
        if key not in seen:
            seen.add(key)
            uniq.append(c)
    return uniq


def _hf_generate(hf_model, ids, mask, c, max_new):
    kw = dict(max_new_tokens=max_new, do_sample=c["do_sample"],
              repetition_penalty=c["repetition_penalty"],
              num_beams=c["num_beams"], eos_token_id=list(c["eos"]),
              pad_token_id=0)
    if c["do_sample"]:
        kw["temperature"] = 1e-4
        kw["top_p"] = c["top_p"]
        if c["top_k"]:
            kw["top_k"] = c["top_k"]
    if c["num_beams"] > 1:
        kw["early_stopping"] = True
    torch.manual_seed(0)
    with torch.no_grad():
        emb = hf_model.get_input_embeddings()(torch.from_numpy(ids))
        out = hf_model.generate(
            inputs_embeds=emb, attention_mask=torch.from_numpy(mask),
            **kw).numpy()
    return out


def _trim(row, eos):
    hits = np.isin(row, list(eos))
    if hits.any():
        return row[: int(np.argmax(hits)) + 1]
    return row


@pytest.mark.parametrize("c", _configs(),
                         ids=lambda c: "-".join(f"{k}{v}" for k, v in
                                                sorted(c.items())))
def test_generate_fuzz_matches_hf(tiny, c):
    hf_model, model = tiny
    max_new = 6
    rng = np.random.default_rng(hash(str(sorted(c.items()))) % 2 ** 31)
    lens = rng.integers(4, 9, size=c["batch"])
    width = int(lens.max())
    # LEFT-padded HF-style batch with attention mask
    ids = np.zeros((c["batch"], width), np.int64)
    mask = np.zeros((c["batch"], width), np.int64)
    for b, ln in enumerate(lens):
        ids[b, width - ln:] = rng.integers(1, 126, size=ln)
        mask[b, width - ln:] = 1

    got = model.generate(
        ids, attention_mask=mask, max_new_tokens=max_new,
        do_sample=c["do_sample"],
        temperature=1e-4 if c["do_sample"] else 0.0,
        top_k=c["top_k"] or None, top_p=c["top_p"],
        repetition_penalty=c["repetition_penalty"],
        num_beams=c["num_beams"], eos_token_id=list(c["eos"]), rng_seed=0)

    if c["do_sample"] and c["num_beams"] > 1:
        # beam SAMPLING cannot be e2e token-pinned against HF even at tiny
        # temperature: near-tie candidates resolve by cross-framework fp
        # drift and torch's zero-probability draw artifacts (measured —
        # see tests/test_beam_search.py, which pins the first two steps
        # exactly and the sampler distributionally). Here: structure +
        # determinism.
        assert got.shape[0] == c["batch"] and got.shape[1] >= 1
        assert np.all(got >= 0) and np.all(got < TINY_KW["vocab_size"])
        again = model.generate(
            ids, attention_mask=mask, max_new_tokens=max_new,
            do_sample=True, temperature=1e-4, top_k=c["top_k"] or None,
            top_p=c["top_p"], repetition_penalty=c["repetition_penalty"],
            num_beams=c["num_beams"], eos_token_id=list(c["eos"]),
            rng_seed=0)
        np.testing.assert_array_equal(got, again)
        return

    ref = _hf_generate(hf_model, ids, mask, c, max_new)
    for b in range(c["batch"]):
        want = _trim(ref[b], c["eos"])
        have = _trim(got[b], c["eos"])
        # rows shorter than max_new are eos/pad-trimmed on both sides
        np.testing.assert_array_equal(
            have[: len(want)], want,
            err_msg=f"row {b} of config {c}")
