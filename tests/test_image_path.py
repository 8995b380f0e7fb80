"""anyres single-image path tests: grid geometry, unpad math vs a numpy
oracle of the reference semantics, and end-to-end embeds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.data.preprocessing import (
    SigLipImageProcessor,
    parse_grid_pinpoints,
    process_anyres_image,
    select_best_resolution,
)
from memory_augmented_vlm_tpu.models import image_path, vlm
from tests.test_vlm import TINY


def test_parse_grid_pinpoints_range_syntax():
    pts = parse_grid_pinpoints("(1x1),...,(6x6)", 384)
    assert len(pts) == 36
    assert (384, 384) in pts and (2304, 2304) in pts


def test_select_best_resolution():
    possible = parse_grid_pinpoints("(1x1),...,(6x6)", 384)
    # a 800x600 image: best fit should roughly preserve aspect
    w, h = select_best_resolution((800, 600), possible)
    assert w % 384 == 0 and h % 384 == 0
    assert w >= 768 and h >= 384


def test_anyres_processing_shapes():
    proc = SigLipImageProcessor(size=(56, 56))
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (100, 200, 3), dtype=np.uint8)
    )
    pixels, size = process_anyres_image(img, proc, "(1x1),...,(3x3)")
    assert size == (200, 100)
    assert pixels.shape[1:] == (56, 56, 3)
    assert pixels.shape[0] >= 2  # base + at least one tile


def test_unpad_matches_reference_semantics():
    # oracle: slice indices computed per llava_arch.py:231-263
    h, gh, gw = 3, 10, 6
    fmap = jnp.asarray(np.random.default_rng(1).standard_normal((h, gh, gw)), jnp.float32)
    # original wider than current aspect -> pad was on height
    out = image_path.unpad_image_map(fmap, (200, 100))  # aspect 2.0 > 0.6
    scale = gw / 200
    new_h = int(100 * scale)
    pad = (gh - new_h) // 2
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fmap[:, pad : gh - pad, :]))
    # original taller -> pad was on width
    out2 = image_path.unpad_image_map(fmap, (50, 300))
    scale2 = gh / 300
    new_w = int(50 * scale2)
    pad2 = (gw - new_w) // 2
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(fmap[:, :, pad2 : gw - pad2]))


def test_image_qa_embeds_end_to_end():
    params = vlm.init_params(TINY, jax.random.key(0))
    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 255, (80, 120, 3), dtype=np.uint8)
    )
    ids = np.array([7, constants.IMAGE_TOKEN_INDEX, 9], np.int64)
    embeds = image_path.image_qa_embeds(params, TINY, img, ids)
    # 2 text tokens + base(16) + unpadded grid(+newline col) tokens
    assert embeds.shape[-1] == TINY.lm.hidden_size
    assert embeds.shape[0] > 2 + TINY.vision.num_patches
    out = vlm.generate(params, TINY, embeds, max_new_tokens=3,
                       eos_token_ids=(49999,), pad_to_multiple=32)
    assert out.tokens.shape == (3,)


def test_single_view_image_flat_plus_newline():
    import dataclasses

    cfg = dataclasses.replace(
        TINY, pipeline=dataclasses.replace(TINY.pipeline, image_aspect_ratio="square"))
    params = vlm.init_params(cfg, jax.random.key(0))
    proc = SigLipImageProcessor(size=(56, 56))
    img = Image.fromarray(
        np.random.default_rng(3).integers(0, 255, (56, 56, 3), dtype=np.uint8))
    pixels = proc.preprocess(img)
    visual = image_path.build_image_embeds(params, cfg, pixels, img.size)
    assert visual.shape == (cfg.vision.num_patches + 1, cfg.lm.hidden_size)


def test_grid_pinpoints_config_plumbing():
    """config.json `image_grid_pinpoints` (list or spec string) reaches the
    pipeline config as a hashable value and drives the grid-shape pick."""
    from memory_augmented_vlm_tpu.eval.builder import config_from_json

    cfg = config_from_json({
        "hidden_size": 64, "num_hidden_layers": 1, "num_attention_heads": 2,
        "num_key_value_heads": 1, "intermediate_size": 128,
        "vocab_size": 49152,
        "image_grid_pinpoints": [[384, 768], [768, 384]],
    })
    assert cfg.pipeline.image_grid_pinpoints == ((384, 768), (768, 384))
    hash(cfg.pipeline)  # must stay usable as a jit static
    # a tall image picks the 1x2 grid from the custom list
    npw, nph = image_path.get_anyres_image_grid_shape(
        (300, 700), cfg.pipeline.image_grid_pinpoints, 384)
    assert (npw, nph) == (1, 2)

    cfg2 = config_from_json({
        "hidden_size": 64, "num_hidden_layers": 1, "num_attention_heads": 2,
        "num_key_value_heads": 1, "intermediate_size": 128,
        "vocab_size": 49152,
    })
    assert cfg2.pipeline.image_grid_pinpoints == "(1x1),...,(6x6)"
