"""Normalization ops.

Numerics match the HF/PyTorch implementations the reference relies on:
  - `rms_norm`   : Qwen2RMSNorm — fp32 accumulation, weight applied after the
                   cast back to the input dtype.
  - `layer_norm` : torch.nn.LayerNorm — biased variance, fp32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm with Qwen2 semantics (cast-to-fp32, scale in input dtype)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return weight * xf.astype(dtype)


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    eps: float = 1e-6,
) -> jax.Array:
    """LayerNorm matching torch.nn.LayerNorm (biased variance, fp32 math)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)
