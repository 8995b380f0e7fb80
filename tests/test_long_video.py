"""Long-video (ring-cache overflow) path end-to-end — VERDICT round-3
item 3: clips with more segments than `cache_cap` must keep the LAST cap
segment memories (the reference's sliding window,
MemoryController.py:152-154) through the full `video_qa_embeds` +
`generate` spine, with the spliced length clamped at cap segments
(`llava_arch.py:146` PE max 600 / finetune frames_upbound 300 territory).
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
    VisionConfig,
    VLMConfig,
)
from memory_augmented_vlm_tpu.models import memory as memory_mod
from memory_augmented_vlm_tpu.models import vlm

# tiny flagship-structure config with a SMALL cache cap so overflow happens
# with few segments (cap=3, 4-frame segments -> 5 segments at 20 frames)
CFG = VLMConfig(
    lm=LMConfig(
        vocab_size=50000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, dtype="float32",
    ),
    vision=VisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
    ),
    memory=MemoryConfig(
        hidden_size=32, num_attention_heads=4, patch_size=4,
        num_memory_tokens=2, depth=1, cache_cap=3, segment_frames=4,
        num_fine_frames=4, max_temporal_frames=64,
    ),
)


@pytest.fixture(scope="module")
def params():
    return vlm.init_params(CFG, jax.random.key(0))


def test_ring_cache_keeps_last_cap_segments(params):
    """run_video's cache after overflow == the last `cap` per-segment
    memories of a manual segment_step loop, in order (oldest surviving
    first) — the MemoryController.py:152-154 window, recurrence intact."""
    mcfg = CFG.memory
    nseg_total, seg = 5, mcfg.segment_frames
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((nseg_total * seg, mcfg.patch_size, 32)),
        jnp.float32)
    valid = jnp.ones((nseg_total * seg,), bool)
    mparams = params["memory"]["recurrent_memory_transformer"]

    state = memory_mod.run_video(mparams, mcfg, feats, valid)
    assert int(state.cache_len) == mcfg.cache_cap

    # manual loop: collect every segment's final memory
    manual = memory_mod.MemoryState.zeros(mcfg, dtype=jnp.float32)
    finals = []
    segs = feats.reshape(nseg_total, seg, mcfg.patch_size, 32)
    for i in range(nseg_total):
        before_len = int(manual.cache_len)
        manual = memory_mod.segment_step(
            mparams, mcfg, manual, segs[i], jnp.ones((seg,), bool))
        # the just-written entry IS that segment's final memory
        idx = min(before_len, mcfg.cache_cap - 1)
        finals.append(np.asarray(manual.cache[idx]))

    expected = np.stack(finals[-mcfg.cache_cap:])
    np.testing.assert_allclose(np.asarray(state.cache), expected,
                               rtol=1e-5, atol=1e-5)
    # and the manual loop's cache agrees with the scan's
    np.testing.assert_allclose(np.asarray(state.cache),
                               np.asarray(manual.cache), rtol=1e-5, atol=1e-5)


def test_overflow_clip_end_to_end(params):
    """20-frame clip = 5 segments > cap 3: video_qa_embeds clamps the
    memory stream at cap segments and generate runs; the spliced length
    equals an exactly-at-cap clip's (12 frames = 3 segments)."""
    mcfg = CFG.memory
    rng = np.random.default_rng(1)
    prompt = np.array([10, 11, constants.IMAGE_TOKEN_INDEX, 12], np.int64)

    pixels_over = rng.standard_normal((20, 56, 56, 3)).astype(np.float32)
    embeds_over = vlm.video_qa_embeds(params, CFG, pixels_over, prompt)
    nseg, nfine = mcfg.cache_cap, mcfg.num_fine_frames
    expected_vis = (10 + nseg * mcfg.num_memory_tokens * mcfg.patch_size + 1
                    + 9 + nfine * mcfg.patch_size + 1)
    assert embeds_over.shape == (3 + expected_vis, 32)

    pixels_cap = rng.standard_normal((12, 56, 56, 3)).astype(np.float32)
    embeds_cap = vlm.video_qa_embeds(params, CFG, pixels_cap, prompt)
    assert embeds_cap.shape == embeds_over.shape

    out = vlm.generate(params, CFG, embeds_over, max_new_tokens=4,
                       eos_token_ids=(49999,), pad_to_multiple=32)
    toks = np.asarray(out.tokens)
    assert toks.shape == (4,) and np.all(toks >= 0) and np.all(toks < 50000)


def test_overflow_memory_tokens_are_last_windows(params):
    """The memory rows of the overflow visual stream equal the fused
    LAST-cap cache — i.e. the stream drops the oldest segments' memories,
    not the newest."""
    mcfg = CFG.memory
    nseg_total, seg = 5, mcfg.segment_frames
    f = nseg_total * seg
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((f, mcfg.patch_size, 32)),
                        jnp.float32)
    frame_idx = jnp.arange(f)
    valid = jnp.ones((f,), bool)
    fine_idx = jnp.asarray(vlm.fine_frame_indices(f, mcfg.num_fine_frames))

    stream = vlm.build_video_embeds(
        params, CFG, feats, frame_idx, valid, fine_idx, nseg=mcfg.cache_cap)

    # reconstruct the expected memory rows: PE -> run_video -> fuse ->
    # type embed; the stream interleaves image_newline after each frame row
    pe_feats = vlm.add_temporal_pe(params["positional_encoding"], feats,
                                   frame_idx)
    state = memory_mod.run_video(
        params["memory"]["recurrent_memory_transformer"], mcfg, pe_feats,
        valid)
    fused, _ = memory_mod.fuse_memory_bank(params["memory"]["memory_fuser"],
                                           state)
    mem = fused[: mcfg.cache_cap * mcfg.num_memory_tokens]
    mem = mem + params["memory"]["token_type_embedding"][0][None, None, :]

    # memory rows sit right after the 10 memory-prompt rows (the default
    # mm_newline_position="one_token" flattens them with ONE trailing
    # newline row)
    n_prompt = len(constants.MEMORY_PROMPT_IDS)
    n_mem = mcfg.cache_cap * mcfg.num_memory_tokens * mcfg.patch_size
    got = stream[n_prompt: n_prompt + n_mem]
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(mem.reshape(n_mem, 32)),
                               rtol=1e-5, atol=1e-5)


def test_bench_pipeline_clamps_nseg():
    """bench.build_pipeline at >320 frames clamps nseg at cache_cap=10 so
    --frames 384 exercises the overflow path with a consistent splice."""
    import bench

    cfg = CFG  # tiny geometry; only the clamp arithmetic matters
    _, nseg = bench.build_pipeline(cfg, 20)
    assert nseg == cfg.memory.cache_cap  # 5 segments -> clamped to 3
    _, nseg_small = bench.build_pipeline(cfg, 8)
    assert nseg_small == 2
