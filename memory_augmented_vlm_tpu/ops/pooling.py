"""Spatial pooling / resizing ops.

The flagship path pools 729 -> 196 visual tokens per frame with
`F.interpolate(mode='bilinear', align_corners=False)` to ceil(H/2) x ceil(W/2)
(reference: llava/model/llava_arch.py:277-297).  PyTorch's bilinear resize has
sharp-edged semantics (half-pixel source mapping clamped at zero, edge-clamped
right neighbor) which we reproduce bit-faithfully at fp32.

TPU-first design: the resize is separable, so it is expressed as two small
matmuls (out = W_h @ img @ W_w^T) with weight matrices precomputed at trace
time — this runs on the MXU and fuses with neighboring ops instead of doing
gather arithmetic on the VPU.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _bilinear_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-stochastic (out_size, in_size) matrix replicating PyTorch bilinear
    `align_corners=False` source indexing (clamped half-pixel centers)."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = max((i + 0.5) * scale - 0.5, 0.0)
        i0 = min(int(math.floor(src)), in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        frac = src - i0
        w[i, i0] += 1.0 - frac
        w[i, i1] += frac
    return w


def bilinear_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of (..., H, W, C) to (..., out_h, out_w, C).

    Matches torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False) at fp32. Implemented as two matmuls (MXU-friendly).
    """
    h, w = x.shape[-3], x.shape[-2]
    wh = jnp.asarray(_bilinear_weight_matrix(h, out_h))
    ww = jnp.asarray(_bilinear_weight_matrix(w, out_w))
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # rows: contract H -> out_h
    y = jnp.einsum("oh,...hwc->...owc", wh, xf)
    # cols: contract W -> out_w
    y = jnp.einsum("pw,...owc->...opc", ww, y)
    return y.astype(dtype)


def avg_pool_2d(x: jax.Array, stride: int) -> jax.Array:
    """Average pool (..., H, W, C) with kernel=stride=stride, matching
    torch.nn.functional.avg_pool2d (floor division of output size)."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = h // stride, w // stride
    x = x[..., : oh * stride, : ow * stride, :]
    shape = x.shape[:-3] + (oh, stride, ow, stride, x.shape[-1])
    return jnp.mean(x.reshape(shape), axis=(-4, -2))


def max_pool_2d(x: jax.Array, stride: int) -> jax.Array:
    """Max pool analog of `avg_pool_2d`."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = h // stride, w // stride
    x = x[..., : oh * stride, : ow * stride, :]
    shape = x.shape[:-3] + (oh, stride, ow, stride, x.shape[-1])
    return jnp.max(x.reshape(shape), axis=(-4, -2))


def spatial_pool_2x2(
    features: jax.Array,
    patches_per_side: int,
    mode: str = "bilinear",
    stride: int = 2,
) -> jax.Array:
    """729 -> 196 token pooling per frame (llava_arch.py:277-297 `get_2dPool`).

    features: (frames, patches, dim) with patches == patches_per_side**2.
    Returns (frames, ceil(side/stride)**2, dim) for bilinear, floor for avg/max.
    """
    f, p, d = features.shape
    side = patches_per_side
    assert p == side * side, f"expected {side * side} patches, got {p}"
    img = features.reshape(f, side, side, d)
    if mode == "bilinear":
        out = math.ceil(side / stride)
        img = bilinear_resize(img, out, out)
    elif mode == "average":
        img = avg_pool_2d(img, stride)
    elif mode == "max":
        img = max_pool_2d(img, stride)
    else:
        raise ValueError(f"Unexpected mm_spatial_pool_mode: {mode}")
    return img.reshape(f, -1, d)
