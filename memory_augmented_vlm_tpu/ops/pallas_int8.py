"""Pallas w8a8 matmul on the int8 MXU mode — the quantized projection kernel
behind the tower/LM load_8bit paths (reference builder.py:30-34).

Mosaic engages the v5e int8 MXU mode (2x bf16 rate) for int8 x int8 -> s32
`dot_general` inside a Pallas kernel — measured ~349 TF/s at tower shapes
(46656 x 1152 x 4304) vs ~102 TF/s for the same dot through XLA, which never
leaves the bf16-rate pipeline (PERFORMANCE.md round 3). The kernel is
weights-stationary: grid (N/bn, M/bm) with the m index innermost, so each
(K, bn) weight tile is fetched once and the activation tiles stream past it;
the (bm, bn) int32 accumulator is rescaled by (row scale x per-channel
weight scale) and bias-added in-register before the bf16 store.

Activation row-quantization runs as one fused XLA pass before the kernel
(`quantize_rows`) — done per activation, not per N-tile of the grid.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8: w ~= w_int8 * scale[None, :].

    w: (K, N) -> (w_int8 (K, N) int8, scale (N,) f32).
    """
    wf = np.asarray(w, np.float32)
    scale = np.abs(wf).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    w_int8 = np.clip(np.round(wf / scale[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(w_int8), jnp.asarray(scale, jnp.float32)


def quantize_rows(x: jax.Array):
    """Per-row symmetric int8 activation quantization (one fused XLA pass).

    Done outside the matmul kernel so it runs once per activation rather than
    once per N-tile of the grid."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf * (1.0 / sx)), -127, 127).astype(jnp.int8)
    return xq, sx


def _ws_kernel(xq_ref, sx_ref, wq_ref, sw_ref, bias_ref, out_ref):
    acc = jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # (BM, BN) int32
    out = acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...] + bias_ref[...]
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "interpret"))
def int8_matmul(
    x: jax.Array,        # (M, K) bf16/f32
    w_int8: jax.Array,   # (K, N) int8
    w_scale: jax.Array,  # (N,) f32
    bias: Optional[jax.Array] = None,  # (N,)
    *,
    block_m: int = 0,    # 0 = auto by K (VMEM budget)
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    _, n = w_int8.shape
    if block_m == 0:
        # x tile (bm, K) int8 double-buffered + w tile (K, bn) + s32 acc
        block_m = 1024 if k <= 2048 else 512
    block_m = min(block_m, max(((m + 7) // 8) * 8, 8))
    block_n = min(block_n, max(n, 128))
    mp = ((m + block_m - 1) // block_m) * block_m
    npad = ((n + block_n - 1) // block_n) * block_n
    xq, sx = quantize_rows(x)
    if mp != m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
        sx = jnp.pad(sx, ((0, mp - m), (0, 0)), constant_values=1.0)
    if npad != n:
        w_int8 = jnp.pad(w_int8, ((0, 0), (0, npad - n)))
        w_scale = jnp.pad(w_scale, (0, npad - n))
        if bias is not None:
            bias = jnp.pad(bias, (0, npad - n))
    w_scale2d = w_scale.reshape(1, -1).astype(jnp.float32)
    bias2d = (jnp.zeros((1, npad), jnp.float32) if bias is None
              else bias.reshape(1, -1).astype(jnp.float32))
    # weights-stationary: n outer, m inner — the (K, bn) weight tile, its
    # scale and bias stay resident across the whole m sweep
    out = pl.pallas_call(
        _ws_kernel,
        grid=(npad // block_n, mp // block_m),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, npad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, sx, w_int8, w_scale2d, bias2d)
    return out[:m, :n]


def int8_matmul_reference(x, w_int8, w_scale, bias=None):
    """jnp oracle with identical quantization math (CPU fallback + tests)."""
    xf = x.astype(jnp.float32)
    row_max = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(row_max, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int32)
    acc = xq @ w_int8.astype(jnp.int32)
    out = acc.astype(jnp.float32) * sx * w_scale[None, :]
    if bias is not None:
        out = out + bias[None, :].astype(jnp.float32)
    return out.astype(x.dtype)


def int8_linear(x: jax.Array, qp: dict) -> jax.Array:
    """`...i,io->...o` against pre-quantized weights {w_int8, scale, bias}."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if jax.default_backend() == "tpu":
        out = int8_matmul(x2, qp["w_int8"], qp["scale"])
    else:
        out = int8_matmul_reference(x2, qp["w_int8"], qp["scale"])
    out = out.reshape(*lead, qp["w_int8"].shape[-1])
    return out + qp["bias"]
