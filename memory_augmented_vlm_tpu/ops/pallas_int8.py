"""Pallas int8 matmul with fused dynamic activation quantization.

AQT's generic dynamic quantization costs a full extra HBM pass per operand
(abs-max, then scale) which made int8 *slower* in context (PERFORMANCE.md).
This kernel fuses the whole w8a8 pipeline into one VMEM-resident pass:

  per (BM, K) activation tile: row abs-max -> per-row scale -> int8 quantize
  -> int8 x int8 MXU matmul (int32 accumulate) -> rescale by
  (row_scale x per-output-channel weight scale) -> bf16 out.

Weights are pre-quantized once (`quantize_weight`: symmetric per-output-
channel int8), so the only runtime overhead is the in-register row quant.

Grid: (M/BM, N/BN) with the full K dimension resident per tile (K <= ~4.3k
for the tower: x tile (256, K) bf16 + w tile (K, 256) int8 fit VMEM).
"""

from __future__ import annotations

import functools
from typing import Tuple

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


def _int8_matmul_kernel(xq_ref, sx_ref, wq_ref, sw_ref, out_ref, *, bm, bn):
    acc = jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # (BM, BN) int32
    out = acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...]
    out_ref[...] = out.astype(out_ref.dtype)


def quantize_rows(x: jax.Array):
    """Per-row symmetric int8 activation quantization (one fused XLA pass).

    Done outside the matmul kernel so it runs once per activation rather than
    once per N-tile of the grid (the fused-in-kernel version repeated the
    VPU quant work N/BN times and lost to bf16)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf * (1.0 / sx)), -127, 127).astype(jnp.int8)
    return xq, sx


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def int8_matmul(
    x: jax.Array,        # (M, K) bf16/f32
    w_int8: jax.Array,   # (K, N) int8
    w_scale: jax.Array,  # (N,) f32
    *,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    _, n = w_int8.shape
    block_m = min(block_m, max(m, 8))
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
    w_scale2d = w_scale.reshape(1, -1)  # 2-D for Mosaic-friendly blocking
    kernel = functools.partial(_int8_matmul_kernel, bm=block_m, bn=block_n)
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m, npad // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, npad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xq, sx, w_int8, w_scale2d)
    return out[:m, :n]


def int8_matmul_reference(x, w_int8, w_scale):
    """jnp oracle with identical quantization math (CPU fallback + tests)."""
    xf = x.astype(jnp.float32)
    row_max = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(row_max, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int32)
    acc = xq @ w_int8.astype(jnp.int32)
    return (acc.astype(jnp.float32) * sx * w_scale[None, :]).astype(x.dtype)


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
