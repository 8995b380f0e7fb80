"""End-to-end spine parity against the REFERENCE'S OWN torch implementation.

Unlike every other parity test (which compares against re-derived oracles),
the oracle here is ``/root/reference``'s actual ``LlavaQwenForCausalLM`` —
imported via eval/reference_oracle.py, instantiated at tiny width but exact
flagship geometry (384px/14patch -> 729 patches -> 196 pooled tokens, 8
memory tokens x 196, 32-frame segments, 32 fine frames, the hardcoded
visual prompt ids), with its live ``state_dict()`` converted into this
repo's param pytree.

Covered spine (llava_arch.py:388-878 -> llava_qwen.py:116-136):
  frame resampling (70 -> 64 via trunc-linspace) -> SigLIP (last layer
  dropped) -> mlp2x projector -> bilinear 2x2 pool -> temporal PE ->
  uniform 32-frame segmentation -> recurrent memory (2 segments, cache
  evolution) -> memory fuser -> token-type embeds -> one_token merge +
  image_newline -> hardcoded prompt splice -> <image> splice -> Qwen2
  prefill -> greedy decode.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.eval import reference_oracle as ro
from memory_augmented_vlm_tpu.models import vlm

if not ro.reference_available():
    pytest.skip("reference checkout not present", allow_module_level=True)

NUM_RAW_FRAMES = 70  # resamples to 64 (llava_arch.py:437-451) = 2 segments
TEXT_BEFORE = [11, 22, 33]
TEXT_AFTER = [44, 55, 66, 77]


@pytest.fixture(scope="module")
def spine():
    geom = ro.TinyGeometry()
    ref_model = ro.build_reference_model(geom, seed=0)
    cfg = ro.repo_config_for(geom)
    params = ro.reference_state_to_params(ref_model, cfg)

    rng = np.random.default_rng(0)
    video = rng.standard_normal(
        (NUM_RAW_FRAMES, 384, 384, 3)).astype(np.float32)
    input_ids = np.asarray(
        TEXT_BEFORE + [constants.IMAGE_TOKEN_INDEX] + TEXT_AFTER, np.int64)
    return ref_model, cfg, params, video, input_ids


def test_spliced_embeds_match_reference(spine):
    ref_model, cfg, params, video, input_ids = spine
    ref = ro.reference_spliced_embeds(
        ref_model, video.transpose(0, 3, 1, 2), input_ids)
    ours = np.asarray(
        vlm.video_qa_embeds(params, cfg, video, input_ids), np.float32)

    # layout invariant: text + (10 + 2*8*196 + 1 + 9 + 32*196 + 1) visual
    expected = len(TEXT_BEFORE) + len(TEXT_AFTER) + (
        10 + 2 * 8 * 196 + 1 + 9 + 32 * 196 + 1)
    assert ref.shape == (expected, cfg.lm.hidden_size)
    assert ours.shape == ref.shape

    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_greedy_tokens_match_reference(spine):
    ref_model, cfg, params, video, input_ids = spine
    max_new = 6
    ref_tokens = ro.reference_greedy_tokens(
        ref_model, video.transpose(0, 3, 1, 2), input_ids,
        max_new_tokens=max_new)

    embeds = vlm.video_qa_embeds(params, cfg, video, input_ids)
    out = vlm.generate(params, cfg, jnp.asarray(embeds, jnp.float32),
                       max_new_tokens=max_new, eos_token_ids=())
    ours = np.asarray(out.tokens[:max_new])

    assert ref_tokens.shape[0] == max_new
    np.testing.assert_array_equal(ours, ref_tokens)


def test_pin_goldens_from_reference_mode():
    """pin_goldens --from-reference: stage goldens computed by the
    reference torch spine, verified against this repo at fp32 tolerance
    (8 frames = the partial-segment path the 64/70-frame tests miss)."""
    from memory_augmented_vlm_tpu.tools import pin_goldens

    want, got = pin_goldens.compute_goldens_from_reference(num_frames=8)
    assert want["oracle"].startswith("reference")
    errs = pin_goldens.check_goldens(got, want, rtol=1e-3)
    assert not errs, errs
