"""bench.py pipeline modes on the CPU backend with the tiny VLM config:
the padded partial-segment path (--frames not a segment multiple), the
no-memory plain pooled path (--no_memory, BASELINE.json config 2), and the
generalized analytic baseline model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bench
from memory_augmented_vlm_tpu.models import vlm
from tests.test_vlm import TINY


@pytest.fixture(scope="module")
def tiny_params():
    return vlm.init_params(TINY, jax.random.key(0))


def _run(pipeline, params, num_frames):
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.standard_normal((num_frames, 56, 56, 3)), jnp.float32)
    before = jnp.asarray([1, 2, 3], jnp.int32)
    after = jnp.asarray([4, 5, 6, 7], jnp.int32)
    tokens, s = jax.jit(pipeline)(params, pixels, before, after)
    return np.asarray(tokens), int(s)


def test_partial_segment_frames(tiny_params):
    # 12 frames with segment_frames=8 -> fmax=16, second segment half-valid
    pipeline, nseg = bench.build_pipeline(TINY, 12)
    assert nseg == 2
    tokens, s = _run(pipeline, tiny_params, 12)
    assert tokens.shape == (bench.MAX_NEW_TOKENS, 1)
    # Lvis = 10 + nseg*(mem_tokens * pooled) + 1 + 9 + nfine*pooled + 1
    lvis = 10 + 2 * (2 * 4) + 1 + 9 + 4 * 4 + 1
    assert s == lvis + 3 + 4
    assert np.all((tokens >= 0) & (tokens < TINY.lm.vocab_size))


def test_no_memory_mode(tiny_params):
    pipeline, _ = bench.build_pipeline(TINY, 8, no_memory=True)
    tokens, s = _run(pipeline, tiny_params, 8)
    assert tokens.shape == (bench.MAX_NEW_TOKENS, 1)
    # plain pooled stream: (pooled + newline) per frame
    assert s == 8 * (4 + 1) + 3 + 4
    assert np.all((tokens >= 0) & (tokens < TINY.lm.vocab_size))


def test_baseline_model_pins_and_scales():
    # pinned headline constants at 64 frames
    assert bench.baseline_visual_tokens_per_s(64) == 16500.0
    assert bench.baseline_visual_tokens_per_s(64, "7b") == 4300.0
    # generalized model stays within 2% of the pinned 64-frame constants
    for model, pin in (("0.5b", 16500.0), ("7b", 4300.0)):
        got = bench.baseline_visual_tokens_per_s(63, model)  # formula path
        assert abs(got - pin) / pin < 0.05, (model, got)
    # more frames -> lower visual tok/s (tower TF/frame dominates the 0.5b)
    vals = [bench.baseline_visual_tokens_per_s(f) for f in (32, 96, 128)]
    assert vals[0] > vals[1] > vals[2] > 0
    assert bench.baseline_visual_tokens_per_s(16, no_memory=True) > 0
