"""Temporal positional encoding over frames.

Reference: llava/model/memory_module/position_encoding.py — fixed sinusoidal
(active config, llava_arch.py:145-149) or learnable embedding over at most
`max_frames` (600) positions; the PE for a frame's *original sampled index*
is added to every patch token of that frame.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def sinusoidal_table(max_frames: int, embed_dim: int) -> np.ndarray:
    """pe[p, 2i] = sin(p * exp(-2i ln(1e4)/d)), pe[p, 2i+1] = cos(...) —
    exact reference formula (position_encoding.py:29-35)."""
    pe = np.zeros((max_frames, embed_dim), dtype=np.float32)
    position = np.arange(max_frames, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, embed_dim, 2, dtype=np.float32) * -(np.log(10000.0) / embed_dim)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)[:, : pe[:, 1::2].shape[1]]
    return pe


def init_params(max_frames: int, embed_dim: int, learnable: bool = False,
                key: jax.Array | None = None, dtype=jnp.float32):
    if learnable:
        assert key is not None
        return {"frame_embed": (jax.random.normal(key, (max_frames, embed_dim)) * 0.02).astype(dtype)}
    return {"frame_embed": jnp.asarray(sinusoidal_table(max_frames, embed_dim), dtype)}


def add_temporal_pe(params, features: jax.Array, frame_indices: jax.Array) -> jax.Array:
    """features: (T, N, C) or (B, T, N, C); frame_indices: (T,) or (B, T) int,
    clipped into the table (the reference raises out-of-range; under jit we
    clamp — callers validate ranges host-side)."""
    table = params["frame_embed"]
    idx = jnp.clip(frame_indices, 0, table.shape[0] - 1)
    pe = jnp.take(table, idx, axis=0).astype(features.dtype)
    if features.ndim == 3:
        return features + pe[:, None, :]
    if features.ndim == 4:
        return features + pe[:, :, None, :]
    raise ValueError(f"Expected 3D or 4D input, got {features.ndim}D.")
