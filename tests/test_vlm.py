"""End-to-end VLM assembly tests on a tiny random model.

Pins the reference's visual-token accounting invariant (BASELINE.md):
Lvis = 10 + nseg*num_mem*patch + 1 + 9 + nfine*patch + 1, the frame-sampling
arithmetic of llava_arch.py:437-457/520-522, and that generate produces
tokens end-to-end from pixels.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.config import (
    LMConfig,
    MemoryConfig,
    PipelineConfig,
    VisionConfig,
    VLMConfig,
)
from memory_augmented_vlm_tpu.models import vlm


TINY = VLMConfig(
    lm=LMConfig(
        vocab_size=50000,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        dtype="float32",
    ),
    vision=VisionConfig(
        hidden_size=24,
        intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
    ),
    memory=MemoryConfig(
        hidden_size=32,
        num_attention_heads=4,
        patch_size=4,       # 56/14=4 per side -> pooled 2x2 = 4 tokens/frame
        num_memory_tokens=2,
        depth=2,
        cache_cap=10,
        segment_frames=8,
        num_fine_frames=4,
        max_temporal_frames=64,
    ),
)


@pytest.fixture(scope="module")
def tiny_vlm():
    params = vlm.init_params(TINY, jax.random.key(0))
    return params


def test_sample_video_frames_reference_arithmetic():
    # <32: keep all
    assert list(vlm.sample_video_frames(7)) == list(range(7))
    # 100 -> 96 frames, truncating linspace
    idx = vlm.sample_video_frames(100)
    assert len(idx) == 96
    ref = np.linspace(0, 99, 96)
    assert np.array_equal(idx, ref.astype(np.int64))
    # 40 -> (40//32)*32 = 32 < 64 -> 64 samples (with repeats)
    idx = vlm.sample_video_frames(40)
    assert len(idx) == 64
    # 129 -> 128
    assert len(vlm.sample_video_frames(129)) == 128


def test_fine_frame_indices_rounding():
    idx = vlm.fine_frame_indices(64, 32)
    ref = np.clip(np.round(np.linspace(0, 63, 32)), 0, 63).astype(np.int64)
    assert np.array_equal(idx, ref)
    assert len(vlm.fine_frame_indices(5, 32)) == 5


def test_visual_token_accounting(tiny_vlm):
    params = tiny_vlm
    mcfg = TINY.memory
    f1 = 16  # 2 segments of 8
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((f1, mcfg.patch_size, 32)), jnp.float32
    )
    fine_idx = jnp.asarray(vlm.fine_frame_indices(f1, mcfg.num_fine_frames))
    visual = vlm.build_video_embeds(
        params, TINY, feats, jnp.arange(f1), jnp.ones((f1,), bool), fine_idx, nseg=2
    )
    expected = (
        len(constants.MEMORY_PROMPT_IDS)
        + 2 * mcfg.num_memory_tokens * mcfg.patch_size
        + 1
        + len(constants.FRAME_PROMPT_IDS)
        + mcfg.num_fine_frames * mcfg.patch_size
        + 1
    )
    assert visual.shape == (expected, 32)

    # dropout-frames variant: memory stream only
    mem_only = vlm.build_video_embeds(
        params, TINY, feats, jnp.arange(f1), jnp.ones((f1,), bool), fine_idx,
        nseg=2, drop_fine_frames=True,
    )
    assert mem_only.shape == (
        len(constants.MEMORY_PROMPT_IDS) + 2 * mcfg.num_memory_tokens * mcfg.patch_size + 1,
        32,
    )


def test_video_qa_generate_end_to_end(tiny_vlm):
    params = tiny_vlm
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((10, 56, 56, 3)).astype(np.float32)
    prompt = np.array([10, 11, constants.IMAGE_TOKEN_INDEX, 12, 13], np.int64)
    embeds = vlm.video_qa_embeds(params, TINY, pixels, prompt)
    # 10 frames < 32 -> all kept; 1 partial segment of 8-pad; nseg = 2 (10 -> pad 16)
    f1 = 10
    nseg = 2
    nfine = min(TINY.memory.num_fine_frames, f1)
    expected_vis = 10 + nseg * 2 * 4 + 1 + 9 + nfine * 4 + 1
    assert embeds.shape == (4 + expected_vis, 32)

    out = vlm.generate(params, TINY, embeds, max_new_tokens=6,
                       eos_token_ids=(49999,), pad_to_multiple=32)
    assert out.tokens.shape == (6,)
    n = int(out.num_tokens)
    assert 1 <= n <= 6
    # determinism at temperature 0
    out2 = vlm.generate(params, TINY, embeds, max_new_tokens=6,
                        eos_token_ids=(49999,), pad_to_multiple=32)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(out2.tokens))


def test_padding_invariance_of_generate(tiny_vlm):
    """Right-padding the prefill must not change the generated tokens."""
    params = tiny_vlm
    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((8, 56, 56, 3)).astype(np.float32)
    prompt = np.array([5, constants.IMAGE_TOKEN_INDEX, 6], np.int64)
    embeds = vlm.video_qa_embeds(params, TINY, pixels, prompt)
    a = vlm.generate(params, TINY, embeds, max_new_tokens=4,
                     eos_token_ids=(49999,), pad_to_multiple=16)
    b = vlm.generate(params, TINY, embeds, max_new_tokens=4,
                     eos_token_ids=(49999,), pad_to_multiple=256)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_faster_video_stream_token_accounting():
    """add_faster_video capability (llava_arch.py:201-206,590-601): slow
    frames keep the full pooled grid, non-stride frames use the 2x-coarser
    pool, every frame row ends with the learnable faster token."""
    params = vlm.init_params(TINY, jax.random.key(0))
    side = TINY.vision.num_patches_per_side
    h = TINY.lm.hidden_size
    f = 6
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((f, side * side, h)),
        jnp.float32)
    faster_token = jnp.zeros((h,), jnp.float32)
    out = vlm.build_faster_video_embeds(params, TINY, feats, faster_token,
                                        faster_token_stride=3)
    stride = TINY.pipeline.mm_spatial_pool_stride
    slow_tokens = (-(-side // stride)) ** 2
    fast_tokens = (-(-side // (stride * 2))) ** 2
    expected = 0
    for i in range(f):
        expected += (slow_tokens if i % 3 == 0 else fast_tokens) + 1
    assert out.shape == (expected, h)
    assert np.isfinite(np.asarray(out)).all()
