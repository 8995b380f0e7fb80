"""Single-image (anyres / spatial_unpad) path — the LLaVA-OneVision
inheritance the reference keeps beside the video spine
(llava/model/llava_arch.py:635-698, llava/mm_utils.py anyres helpers).

Flow for `image_aspect_ratio="anyres_max_9"` + `mm_patch_merge_type=
"spatial_unpad"`:
  host: pick the best grid resolution, pad+split the image into 384^2 tiles
        plus a base 384^2 view (data/preprocessing.py `process_anyres_image`)
  device: tower+projector over all tiles (no 2x2 pooling for images) ->
        base features stay flat; grid tiles are re-assembled into a
        (H, nph*27, npw*27) map, unpadded back to the original aspect,
        optionally bilinear-downscaled when exceeding max_num_patches
        (llava_arch.py:666-677), a per-row `image_newline` column appended,
        then flattened and concatenated after the base view.
"""

from __future__ import annotations

import math
import re
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.data.preprocessing import (
    parse_grid_pinpoints,
    select_best_resolution,
)
from memory_augmented_vlm_tpu.models import projector as projector_mod
from memory_augmented_vlm_tpu.models import qwen2, siglip
from memory_augmented_vlm_tpu.ops.pooling import bilinear_resize


def get_anyres_image_grid_shape(image_size: Tuple[int, int], grid_pinpoints,
                                patch_size: int) -> Tuple[int, int]:
    """(num_patch_width, num_patch_height) for the selected grid resolution
    (llava/mm_utils.py get_anyres_image_grid_shape)."""
    possible = parse_grid_pinpoints(grid_pinpoints, patch_size)
    width, height = select_best_resolution(image_size, possible)
    return width // patch_size, height // patch_size


def unpad_image_map(feature_map: jax.Array, original_size: Tuple[int, int]) -> jax.Array:
    """Remove aspect-ratio padding from a (H, gh, gw) feature map
    (llava_arch.py:231-263 `unpad_image`; original_size = (width, height))."""
    original_width, original_height = original_size
    _, current_height, current_width = feature_map.shape
    original_aspect = original_width / original_height
    current_aspect = current_width / current_height
    if original_aspect > current_aspect:
        scale = current_width / original_width
        new_height = int(original_height * scale)
        padding = (current_height - new_height) // 2
        return feature_map[:, padding : current_height - padding, :]
    scale = current_height / original_height
    new_width = int(original_width * scale)
    padding = (current_width - new_width) // 2
    return feature_map[:, :, padding : current_width - padding]


def build_image_embeds(
    params,
    cfg: VLMConfig,
    pixels: np.ndarray,            # (1 + n_tiles, img, img, 3) from process_anyres_image
    image_size: Tuple[int, int],   # original (width, height)
) -> jax.Array:
    """anyres image -> (L, H) visual embedding sequence."""
    pipe = cfg.pipeline
    dtype = jnp.bfloat16 if cfg.lm.dtype == "bfloat16" else jnp.float32
    feats = siglip.forward(params["vision_tower"], cfg.vision, jnp.asarray(pixels, dtype))
    feats = projector_mod.forward(params["mm_projector"], pipe.mm_projector_type, feats)
    feats = jax.lax.stop_gradient(feats)

    side = cfg.vision.num_patches_per_side
    h = feats.shape[-1]
    newline = params["memory"]["image_newline"].astype(feats.dtype)

    if feats.shape[0] == 1:
        # single 384^2 view: flat + newline (llava_arch.py:692-698)
        flat = feats[0]
        if "unpad" in pipe.mm_patch_merge_type:
            flat = jnp.concatenate([flat, newline[None]], axis=0)
        return flat

    base = feats[0]
    tiles = feats[1:]
    npw, nph = get_anyres_image_grid_shape(
        image_size, pipe.image_grid_pinpoints, cfg.vision.image_size,
    )
    grid = tiles.reshape(nph, npw, side, side, h)

    max_num_patches = None
    m = re.match(r"anyres_max_(\d+)", pipe.image_aspect_ratio)
    if m:
        max_num_patches = int(m.group(1))

    if "unpad" in pipe.mm_patch_merge_type:
        # (nph, npw, s, s, H) -> (H, nph*s, npw*s)
        fmap = grid.transpose(4, 0, 2, 1, 3).reshape(h, nph * side, npw * side)
        fmap = unpad_image_map(fmap, image_size)
        if max_num_patches is not None:
            _, gh, gw = fmap.shape
            times = math.sqrt(gh * gw / (max_num_patches * side**2))
            if times > 1.1:
                resized = bilinear_resize(
                    fmap.transpose(1, 2, 0), int(gh // times), int(gw // times)
                )
                fmap = resized.transpose(2, 0, 1)
        _, gh, gw = fmap.shape
        col = jnp.broadcast_to(newline[:, None, None], (h, gh, 1))
        fmap = jnp.concatenate([fmap, col], axis=2)
        tile_tokens = fmap.reshape(h, -1).T  # (gh*(gw+1), H)
    else:
        tile_tokens = grid.transpose(0, 2, 1, 3, 4).reshape(-1, h)

    if "nobase" in pipe.mm_patch_merge_type:
        return tile_tokens
    return jnp.concatenate([base, tile_tokens], axis=0)


# one compiled tower+anyres-merge graph per (tile count, image size) —
# eval/serving would otherwise run the tower eagerly (~28 ms/op relay)
build_image_embeds_jit = jax.jit(build_image_embeds, static_argnums=(1, 3))


def image_qa_embeds(
    params,
    cfg: VLMConfig,
    image,                       # PIL.Image
    input_ids: np.ndarray,       # (S,) with one IMAGE_TOKEN_INDEX
    image_processor=None,
) -> jax.Array:
    """Host+device pipeline: PIL image + ids -> spliced embedding sequence
    (the docs/image_tutorial.py equivalent, BASELINE config #1)."""
    from memory_augmented_vlm_tpu import constants
    from memory_augmented_vlm_tpu.data.preprocessing import (
        SigLipImageProcessor,
        process_anyres_image,
    )
    from memory_augmented_vlm_tpu.models.vlm import splice_image_embeds

    processor = image_processor or SigLipImageProcessor(
        size=(cfg.vision.image_size, cfg.vision.image_size))
    if cfg.pipeline.image_aspect_ratio.startswith("anyres"):
        pixels, size = process_anyres_image(
            image, processor, cfg.pipeline.image_grid_pinpoints)
    else:
        pixels = processor.preprocess(image)
        size = image.size
    visual = build_image_embeds_jit(params, cfg, pixels, tuple(size))
    pos = int(np.where(input_ids == constants.IMAGE_TOKEN_INDEX)[0][0])
    before = jnp.asarray(input_ids[:pos], jnp.int32)
    after = jnp.asarray(input_ids[pos + 1 :], jnp.int32)
    return splice_image_embeds(params, before, visual, after, cfg.lm)
