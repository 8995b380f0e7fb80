"""Int8 quantized matmul support — the TPU replacement for the reference's
bitsandbytes 4/8-bit load path (builder.py:30-34 `load_8bit/load_4bit`,
SURVEY.md §2.9).

Uses AQT's dynamically-quantized dot_general (symmetric int8 on both
operands, fp32 accumulation). NOTE: measured in-context on v5e, dynamic
double-sided quantization is currently a *capability/memory* mode, not a
speedup (the per-activation abs-max+scale overhead outweighs the int8 MXU
gain at SigLIP shapes: 469ms bf16 vs 763ms int8 for the 64-frame tower).
A pre-quantized-weights path with static scales is the roadmap for actual
wins; the flag exists for load_8bit API parity (builder.py:30-34).
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def _int8_dot_general():
    import aqt.jax.v2.config as aqt_config

    return aqt_config.dot_general_make(lhs_bits=8, rhs_bits=8)


def int8_einsum_io(x: jax.Array, w: jax.Array) -> jax.Array:
    """`...i,io->...o` contraction through the int8 MXU path."""
    dg = _int8_dot_general()
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = dg(x2, w, (((1,), (0,)), ((), ())), precision=None)
    return out.reshape(*lead, w.shape[-1]).astype(x.dtype)


def prequantize_kernel(w, axis_k: int = -2):
    """Static symmetric per-output-channel int8 for a (..., K, N) kernel.

    Returns (w_int8 same shape, scale with the K axis reduced). Used by both
    the tower and LM prequantized paths (the measured-fast route: plain XLA
    int8 dot_general on the int8 MXU, PERFORMANCE.md)."""
    import jax.numpy as jnp

    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=axis_k), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / jnp.expand_dims(scale, axis_k)),
                  -127, 127).astype(jnp.int8)
    return wq, scale


def int8_linear(p: dict, x: jax.Array) -> jax.Array:
    """Prequantized dense layer: dynamic per-row activation int8 quant +
    int8 x int8 -> int32 MXU matmul + rescale (+ optional bias).

    p: {"kernel_int8": (K, N) int8, "scale": (N,) f32, optional "bias"}.
    """
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.ops.pallas_int8 import quantize_rows

    xq, sx = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, p["kernel_int8"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (acc.astype(jnp.float32) * sx * p["scale"]).astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"]
    return out
