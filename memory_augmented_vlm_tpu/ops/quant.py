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

import numpy as np
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


def prequantize_kernel_int4(w, axis_k: int = -2):
    """Static symmetric per-output-channel int4 for a (..., K, N) kernel —
    the load_4bit storage format (bitsandbytes 4-bit equivalent): values in
    [-7, 7] offset-packed two-per-byte along K, so parameter HBM halves vs
    int8. Returns (packed uint8 (..., K/2, N), scale with K reduced)."""
    import jax.numpy as jnp

    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=axis_k), 1e-12) / 7.0
    q = jnp.clip(jnp.round(wf / jnp.expand_dims(scale, axis_k)), -7, 7)
    q = (q + 8).astype(jnp.uint8)              # nibbles in [1, 15]
    k_ax = axis_k % q.ndim
    even = jnp.take(q, jnp.arange(0, q.shape[k_ax], 2), axis=k_ax)
    odd = jnp.take(q, jnp.arange(1, q.shape[k_ax], 2), axis=k_ax)
    packed = (even | (odd << 4)).astype(jnp.uint8)
    return packed, scale


def unpack_int4(packed, axis_k: int = -2):
    """(..., K/2, N) packed nibbles -> (..., K, N) int8 in [-7, 7]."""
    import jax.numpy as jnp

    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    k_ax = axis_k % packed.ndim
    stacked = jnp.stack([lo, hi], axis=k_ax + 1)   # (..., K/2, 2, N)
    shape = list(packed.shape)
    shape[k_ax] *= 2
    return stacked.reshape(shape)


def int4_linear(p: dict, x: jax.Array) -> jax.Array:
    """Packed-int4 dense layer: unpack to int8 in-graph (hoisted out of
    decode loops by XLA since weights are loop-invariant) then the int8 MXU
    matmul. Parameter memory is the win; throughput matches int8."""
    unpacked = {"kernel_int8": unpack_int4(p["kernel_int4"]),
                "scale": p["scale"]}
    if "bias" in p:
        unpacked["bias"] = p["bias"]
    return int8_linear(unpacked, x)


def int8_linear(p: dict, x: jax.Array) -> jax.Array:
    """Prequantized dense layer: dynamic per-row activation int8 quant +
    int8 x int8 -> int32 MXU matmul + rescale (+ optional bias).

    p: {"kernel_int8": (K, N) int8, "scale": (N,) f32, optional "bias"}.

    Stays on the XLA dot: the Pallas weights-stationary single matmul
    measured EQUAL to XLA in a dependent chain (163.6 vs 171.6 TF/s — the
    chain is bound by the inter-matmul HBM round trips, not the MXU rate,
    PERFORMANCE.md round 3) and slower end-to-end (fusion breaks). The int8
    MXU headroom is harvested by the fused-MLP kernel instead
    (ops/pallas_mlp_int8.py).
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
