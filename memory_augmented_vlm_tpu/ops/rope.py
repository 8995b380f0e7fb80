"""Rotary position embeddings (HF Qwen2/Llama `rotate_half` convention).

The reference uses stock HF Qwen2 attention (llava_qwen.py:31 keeps the HF
import); we match its RoPE exactly: inv_freq over even indices, cos/sin
computed in fp32, q/k rotated as `q*cos + rotate_half(q)*sin`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_rope_freqs(head_dim: int, theta: float,
                       scaling_type=None, scaling_factor: float = 1.0,
                       max_position_embeddings: int = 32768,
                       seq_len: int = 0) -> jax.Array:
    """inv_freq[j] = theta^(-2j/d), shape (head_dim//2,), fp32.

    rope scaling (HF semantics, enabled via overwrite_config rope knobs):
      - "linear": positions divided by factor (applied in `rope_cos_sin`
        through `compute_rope_freqs` scaling of inv_freq)
      - "dynamic" (NTK): theta grown with the actual sequence length
    """
    if scaling_type == "dynamic" and seq_len > max_position_embeddings:
        theta = theta * (
            (scaling_factor * seq_len / max_position_embeddings)
            - (scaling_factor - 1)
        ) ** (head_dim / (head_dim - 2))
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv = 1.0 / (theta**exponents)
    if scaling_type == "linear":
        inv = inv / scaling_factor
    return inv


def rope_cos_sin(positions: jax.Array, inv_freq: jax.Array):
    """cos/sin tables for integer positions.

    positions: (...,) int32 -> cos, sin of shape (..., head_dim) fp32,
    laid out as [f0..f_{d/2-1}, f0..f_{d/2-1}] like HF (concat, not interleave).
    """
    angles = positions.astype(jnp.float32)[..., None] * inv_freq[None, :]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding.

    x:   (..., seq, heads, head_dim)
    cos: (..., seq, head_dim) — broadcast over the heads axis.
    """
    cos = cos[..., :, None, :].astype(x.dtype)
    sin = sin[..., :, None, :].astype(x.dtype)
    return x * cos + _rotate_half(x) * sin
