"""Device-side frame preprocessing: resize + rescale + normalize in-graph.

TPU-first replacement for the host PIL loop (`data/preprocessing.py`, after
reference `siglip_encoder.py:34-67`): decoded frames cross the host->device
boundary as raw uint8 (half the bytes of bf16, a quarter of fp32) and the
bicubic resize + `(x/255 - mean) / std` run inside the tower jit on the
VPU/MXU, fused with the patch embed. On a host-limited box the per-frame
PIL loop is the sustained-throughput bottleneck (PERFORMANCE.md "Throughput
pipelining"); this moves the whole stage on-chip.

Numerics vs the host path: `jax.image.resize(..., "bicubic")` is the same
Keys a=-0.5 cubic kernel PIL uses, and `antialias=True` scales the kernel
support for downscales exactly like PIL's resize filter. PIL, however,
quantizes the resized image back to uint8 before the rescale/normalize, so
the device path (which stays in float) differs by up to ~1/255 per channel
pre-normalization — tests pin the identity-size case tightly and the
resize cases to that quantization envelope.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def preprocess_frames(
    frames: jax.Array,
    size: Tuple[int, int] = (384, 384),
    image_mean: Sequence[float] = (0.5, 0.5, 0.5),
    image_std: Sequence[float] = (0.5, 0.5, 0.5),
    dtype=jnp.bfloat16,
    antialias: bool = True,
) -> jax.Array:
    """(T, H, W, 3) uint8 (or float in [0, 255]) -> (T, *size, 3) normalized.

    Jittable; `size` must be static. Matches
    `data.preprocessing.SigLipImageProcessor` semantics (RGB channel-last,
    bicubic resize, 1/255 rescale, mean/std normalize).
    """
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected (T, H, W, 3) frames, got {frames.shape}")
    x = frames.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    if tuple(frames.shape[1:3]) != tuple(size):
        x = jax.image.resize(
            x, (frames.shape[0], size[0], size[1], 3), method="bicubic",
            antialias=antialias,
        )
        # bicubic overshoot: PIL clamps to the uint8 range on requantize
        x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(image_mean, jnp.float32)
    std = jnp.asarray(image_std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _anyres_tiles(image, s, tw, th, nw, nh, dtype):
    """uint8 (H, W, 3) -> (1 + (th//s)*(tw//s), s, s, 3) normalized tiles.

    Mirrors `data.preprocessing.process_anyres_image` geometry exactly:
    base 384² view, aspect-preserving resize to (nw, nh), center-pad to
    (tw, th) on black, row-major s×s tiling — all on-device."""
    x = image.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    base = jax.image.resize(x, (s, s, 3), "bicubic", antialias=True)
    resized = jax.image.resize(x, (nh, nw, 3), "bicubic", antialias=True)
    canvas = jnp.zeros((th, tw, 3), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(
        canvas, jnp.clip(resized, 0.0, 1.0),
        ((th - nh) // 2, (tw - nw) // 2, 0))
    # divide_to_patches order: rows over height, then columns over width
    tiles = canvas.reshape(th // s, s, tw // s, s, 3)
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(-1, s, s, 3)
    out = jnp.concatenate([jnp.clip(base, 0.0, 1.0)[None], tiles])
    return ((out - 0.5) / 0.5).astype(dtype)


def preprocess_anyres_image(
    image,
    grid_pinpoints,
    size: Tuple[int, int] = (384, 384),
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Device-side `process_anyres_image`: host picks the grid resolution
    (cheap integer geometry from (W, H)); the resizes, padding, tiling, and
    normalization run in one jit. Returns ((1+n, s, s, 3) tiles, (W, H)).

    Recompiles are bounded by (input shape, chosen grid) buckets, same as
    the video frame buckets. mean/std are the SigLIP 0.5/0.5 constants
    (reference siglip_encoder.py:34-67)."""
    from memory_augmented_vlm_tpu.data.preprocessing import (
        parse_grid_pinpoints,
        select_best_resolution,
    )

    image = jnp.asarray(image)
    if image.ndim != 3 or image.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) image, got {image.shape}")
    h, w = int(image.shape[0]), int(image.shape[1])
    s = size[0]
    possible = parse_grid_pinpoints(grid_pinpoints, s)
    tw, th = select_best_resolution((w, h), possible)
    scale = min(tw / w, th / h)
    nw, nh = min(math.ceil(w * scale), tw), min(math.ceil(h * scale), th)
    return _anyres_tiles(image, s, tw, th, nw, nh, dtype), (w, h)
