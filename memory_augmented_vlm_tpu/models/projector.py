"""Multimodal projector registry.

Capability parity with llava/model/multimodal_projector/builder.py:32-65:
`linear`, `mlpNx_gelu` (active: mlp2x_gelu), `mlpNx_resMx_gelu` (res blocks =
pre-LN + Linear-GELU-Linear residual, builder.py:20-30), `identity`, and
`pooler` (2x2 conv pool + GELU + Linear, pooler_projector.py:9-29).
Projectors are pure functions over small param pytrees.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp


def _lin_init(key, d_in, d_out, dtype):
    return {
        "kernel": (jax.random.normal(key, (d_in, d_out)) * 0.02).astype(dtype),
        "bias": jnp.zeros((d_out,), dtype),
    }


def init_params(projector_type: str, in_dim: int, out_dim: int, key: jax.Array,
                dtype=jnp.float32):
    if projector_type == "identity":
        return {"layers": []}
    if projector_type == "pooler":
        ks = jax.random.split(key, 2)
        return {
            "conv_pool": {
                "kernel": (jax.random.normal(ks[0], (2, 2, in_dim, out_dim)) * 0.02).astype(dtype),
                "bias": jnp.zeros((out_dim,), dtype),
            },
            "proj": _lin_init(ks[1], out_dim, out_dim, dtype),
        }
    res = re.match(r"^mlp(\d+)x_res(\d+)x_gelu$", projector_type)
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    depth = (1 if projector_type == "linear"
             else int((res or m).group(1)) if (res or m) else None)
    if depth is None:
        raise ValueError(f"Unknown projector type: {projector_type}")
    n_res = int(res.group(2)) if res else 0
    keys = jax.random.split(key, depth + 2 * n_res + 1)
    layers = []
    for i in range(depth):
        d_in = in_dim if i == 0 else out_dim
        layers.append(_lin_init(keys[i], d_in, out_dim, dtype))
    out = {"layers": layers}
    if n_res:
        blocks = []
        for j in range(n_res):
            blocks.append({
                "pre_norm": {"weight": jnp.ones((out_dim,), dtype),
                             "bias": jnp.zeros((out_dim,), dtype)},
                "fc1": _lin_init(keys[depth + 2 * j], out_dim, out_dim, dtype),
                "fc2": _lin_init(keys[depth + 2 * j + 1], out_dim, out_dim, dtype),
            })
        out["res_blocks"] = blocks
    return out


def forward(params, projector_type: str, x: jax.Array) -> jax.Array:
    """Apply projector. mlpNx_gelu = Linear (GELU Linear)^(N-1), exact-GELU
    (torch nn.GELU default) between layers (multimodal_projector/builder.py:45-51)."""
    if projector_type == "identity":
        return x
    if projector_type == "pooler":
        from memory_augmented_vlm_tpu.ops.norms import layer_norm  # noqa: F401

        b, p, c = x.shape
        side = int(round(p**0.5))
        img = x.reshape(b, side, side, c)
        out = jax.lax.conv_general_dilated(
            img, params["conv_pool"]["kernel"].astype(img.dtype),
            window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["conv_pool"]["bias"].astype(img.dtype)
        out = out.reshape(b, -1, out.shape[-1])
        out = jax.nn.gelu(out, approximate=False)
        return jnp.einsum("...i,io->...o", out, params["proj"]["kernel"]) + params["proj"]["bias"]
    layers = params["layers"]
    out = x
    for i, lp in enumerate(layers):
        if i > 0:
            out = jax.nn.gelu(out, approximate=False)
        out = jnp.einsum("...i,io->...o", out, lp["kernel"]) + lp["bias"]
    for blk in params.get("res_blocks", []):
        from memory_augmented_vlm_tpu.ops.norms import layer_norm

        # torch nn.LayerNorm default eps (SimpleResBlock, builder.py:20-30)
        h = layer_norm(out, blk["pre_norm"]["weight"], blk["pre_norm"]["bias"],
                       eps=1e-5)
        y = jnp.einsum("...i,io->...o", h, blk["fc1"]["kernel"]) + blk["fc1"]["bias"]
        y = jax.nn.gelu(y, approximate=False)
        y = jnp.einsum("...i,io->...o", y, blk["fc2"]["kernel"]) + blk["fc2"]["bias"]
        out = h + y
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
