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
