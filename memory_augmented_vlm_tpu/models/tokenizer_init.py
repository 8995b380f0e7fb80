"""Vision-token tokenizer initialization.

Capability parity with `initialize_vision_tokenizer` (llava_arch.py:924-965):
add <im_patch>/<im_start>/<im_end> special tokens and resize/initialize the
embedding table — new rows get the mean of existing embeddings (the
reference's input/output-embedding averaging).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
)


def resize_token_embeddings(lm_params: dict, new_vocab: int,
                            tie_word_embeddings: bool) -> dict:
    """Grow (or shrink) the embedding table; new input rows take the mean of
    existing input embeddings, new output rows the mean of output embeddings
    (llava_arch.py:936-948)."""
    emb = np.asarray(lm_params["embed_tokens"])
    old_vocab, h = emb.shape
    out = dict(lm_params)
    if new_vocab <= old_vocab:
        out["embed_tokens"] = jnp.asarray(emb[:new_vocab])
        if "lm_head" in lm_params:
            out["lm_head"] = jnp.asarray(np.asarray(lm_params["lm_head"])[:, :new_vocab])
        return out
    mean_in = emb.mean(axis=0, keepdims=True)
    grown = np.concatenate([emb, np.repeat(mean_in, new_vocab - old_vocab, 0)])
    out["embed_tokens"] = jnp.asarray(grown)
    if "lm_head" in lm_params and not tie_word_embeddings:
        head = np.asarray(lm_params["lm_head"])  # (H, V)
        mean_out = head.mean(axis=1, keepdims=True)
        out["lm_head"] = jnp.asarray(
            np.concatenate([head, np.repeat(mean_out, new_vocab - old_vocab, 1)], 1))
    return out


def initialize_vision_tokenizer(
    params: dict,
    tokenizer,
    *,
    tie_word_embeddings: bool,
    mm_use_im_patch_token: bool = False,
    mm_use_im_start_end: bool = False,
) -> Tuple[dict, object]:
    """Add vision special tokens and resize embeddings accordingly."""
    added = 0
    if mm_use_im_patch_token:
        added += tokenizer.add_tokens([DEFAULT_IMAGE_PATCH_TOKEN],
                                      special_tokens=True)
    if mm_use_im_start_end:
        added += tokenizer.add_tokens(
            [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN], special_tokens=True)
    if added:
        lm = resize_token_embeddings(params["language_model"], len(tokenizer),
                                     tie_word_embeddings)
        params = dict(params, language_model=lm)
    return params, tokenizer
