"""Fused int8 MLP kernel: fc1 -> gelu(tanh) -> requantize -> fc2 in ONE
Pallas pass with both weight matrices VMEM-resident.

Why: the int8 MXU mode runs at ~349 TF/s inside Pallas kernels at tower
shapes, but a chain of separate int8 matmuls is bound by the inter-op HBM
round trips (write bf16 intermediate + read back + re-quantize => measured
171 TF/s effective for the dependent fc1/fc2 chain, PERFORMANCE.md round 3).
Fusing the whole MLP keeps the (bm, I) intermediate in VMEM: per m-tile

  acc1 = xq @ W1 (int8 x int8 -> s32)       h = gelu(acc1 * sx * s1 + b1)
  hq, sh = row-quant(h)                     out = (hq @ W2) * sh * s2 + b2

The only HBM traffic is the int8 activations in, the bf16 output out, and
the two weight matrices ONCE (grid iterates m; weight blocks are constant).
Replaces the two `int8_linear` calls on the SigLIP tower's quantized MLP
path (reference hot loop: siglip_encoder.py:577-590; load_8bit
builder.py:30-34).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from memory_augmented_vlm_tpu.ops.pallas_int8 import quantize_rows


def _fused_mlp_kernel(xq_ref, sx_ref, w1_ref, s1_ref, b1_ref,
                      w2_ref, s2_ref, b2_ref, out_ref):
    acc1 = jax.lax.dot_general(
        xq_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # (BM, I) s32
    h = acc1.astype(jnp.float32) * sx_ref[...] * s1_ref[...] + b1_ref[...]
    h = jax.nn.gelu(h, approximate=True)                   # gelu_pytorch_tanh
    # per-row requantization (full row is resident: I == block width)
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True),
                     1e-12) / 127.0
    hq = jnp.clip(jnp.round(h * (1.0 / sh)), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # (BM, K) s32
    out = acc2.astype(jnp.float32) * sh * s2_ref[...] + b2_ref[...]
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def fused_mlp_int8(
    x: jax.Array,       # (M, K) bf16/f32
    w1_int8: jax.Array,  # (K, I) int8
    s1: jax.Array,       # (I,) f32 per-output-channel scale
    b1: jax.Array,       # (I,)
    w2_int8: jax.Array,  # (I, K) int8
    s2: jax.Array,       # (K,) f32
    b2: jax.Array,       # (K,)
    *,
    block_m: int = 256,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    i = w1_int8.shape[1]
    block_m = min(block_m, max(((m + 7) // 8) * 8, 8))
    mp = ((m + block_m - 1) // block_m) * block_m
    xq, sx = quantize_rows(x)
    if mp != m:
        xq = jnp.pad(xq, ((0, mp - m), (0, 0)))
        sx = jnp.pad(sx, ((0, mp - m), (0, 0)), constant_values=1.0)
    out = pl.pallas_call(
        _fused_mlp_kernel,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((i, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, k), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, k), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xq, sx,
      w1_int8, s1.reshape(1, -1).astype(jnp.float32),
      b1.reshape(1, -1).astype(jnp.float32),
      w2_int8, s2.reshape(1, -1).astype(jnp.float32),
      b2.reshape(1, -1).astype(jnp.float32))
    return out[:m]


def _fused_block_kernel(hid_ref, lnw_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                        w2_ref, s2_ref, b2_ref, out_ref, *, eps):
    hid = hid_ref[...].astype(jnp.float32)                 # (BM, K)
    mu = jnp.mean(hid, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(hid - mu), axis=1, keepdims=True)
    x = (hid - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[...] + lnb_ref[...]
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(x * (1.0 / sx)), -127, 127).astype(jnp.int8)
    acc1 = jax.lax.dot_general(
        xq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * sx * s1_ref[...] + b1_ref[...]
    h = jax.nn.gelu(h, approximate=True)
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True),
                     1e-12) / 127.0
    hq = jnp.clip(jnp.round(h * (1.0 / sh)), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    mlp = acc2.astype(jnp.float32) * sh * s2_ref[...] + b2_ref[...]
    out_ref[...] = (hid + mlp).astype(out_ref.dtype)       # residual add


@functools.partial(jax.jit, static_argnames=("eps", "block_m",
                                             "vmem_limit_bytes", "interpret"))
def fused_mlp_block_int8(
    hidden: jax.Array,   # (M, K) bf16/f32 — PRE-layernorm residual stream
    ln_w: jax.Array,     # (K,)
    ln_b: jax.Array,     # (K,)
    w1_int8: jax.Array,  # (K, I) int8
    s1: jax.Array, b1: jax.Array,
    w2_int8: jax.Array,  # (I, K) int8
    s2: jax.Array, b2: jax.Array,
    *,
    eps: float = 1e-6,
    block_m: int = 128,   # 256+ needs vmem_limit_bytes raised past the 16 MB
                          # scoped default beside the resident W1+W2 (~10 MB)
                          # at tower shapes (v5e has 128 MB physical VMEM)
    vmem_limit_bytes: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """The whole transformer MLP half-block in one kernel:
    hidden + fc2(requant(gelu(fc1(quant(LN(hidden)))))). HBM traffic is one
    read and one write of the (M, K) hidden state — the layernorm, both
    quantizations, the (BM, I) intermediate, and the residual add all stay
    in VMEM."""
    m, k = hidden.shape
    i = w1_int8.shape[1]
    block_m = min(block_m, max(((m + 7) // 8) * 8, 8))
    mp = ((m + block_m - 1) // block_m) * block_m
    hp = jnp.pad(hidden, ((0, mp - m), (0, 0))) if mp != m else hidden
    kern = functools.partial(_fused_block_kernel, eps=eps)
    out = pl.pallas_call(
        kern,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((i, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, k), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, k), hidden.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(hp,
      ln_w.reshape(1, -1).astype(jnp.float32),
      ln_b.reshape(1, -1).astype(jnp.float32),
      w1_int8, s1.reshape(1, -1).astype(jnp.float32),
      b1.reshape(1, -1).astype(jnp.float32),
      w2_int8, s2.reshape(1, -1).astype(jnp.float32),
      b2.reshape(1, -1).astype(jnp.float32))
    return out[:m]


def _fused_swiglu_kernel(hid_ref, w_ref, wg_ref, sg_ref, wu_ref, su_ref,
                         wd_ref, sd_ref, out_ref, *, eps):
    hid = hid_ref[...].astype(jnp.float32)                 # (BM, K)
    var = jnp.mean(jnp.square(hid), axis=1, keepdims=True)
    x = hid * jax.lax.rsqrt(var + eps) * w_ref[...]
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(x * (1.0 / sx)), -127, 127).astype(jnp.int8)
    g = jax.lax.dot_general(
        xq, wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * sx * sg_ref[...]
    u = jax.lax.dot_general(
        xq, wu_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * sx * su_ref[...]
    h = jax.nn.silu(g) * u                                 # (BM, I)
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True),
                     1e-12) / 127.0
    hq = jnp.clip(jnp.round(h * (1.0 / sh)), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq, wd_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    mlp = acc2.astype(jnp.float32) * sh * sd_ref[...]
    out_ref[...] = (hid + mlp).astype(out_ref.dtype)       # residual add


@functools.partial(jax.jit, static_argnames=("eps", "block_m",
                                             "vmem_limit_bytes", "interpret"))
def fused_swiglu_block_int8(
    hidden: jax.Array,   # (M, K) bf16/f32 — PRE-norm residual stream
    rms_w: jax.Array,    # (K,) effective RMSNorm weight (caller folds +1)
    wg_int8: jax.Array,  # (K, I) int8 gate_proj
    sg: jax.Array,
    wu_int8: jax.Array,  # (K, I) int8 up_proj
    su: jax.Array,
    wd_int8: jax.Array,  # (I, K) int8 down_proj
    sd: jax.Array,
    *,
    eps: float = 1e-6,
    block_m: int = 256,
    vmem_limit_bytes: int | None = 64 << 20,
    interpret: bool = False,
) -> jax.Array:
    """The LM's SwiGLU MLP half-block in one kernel:
    hidden + down(requant(silu(gate(quant(RMSNorm(hidden)))) * up(...))).
    The (M, I) gate/up/silu intermediates never touch HBM — at the 9.7k-row
    prefill shape the XLA int8 chain streams ~380 MB of them per layer
    (the HEAD trace's HBM-bound `fusion` class); here HBM traffic is one
    read + one write of the (M, K) hidden state plus the three weight
    matrices once. Gate/up/down carry no bias (the Llama/Qwen2 MLP;
    modeling_qwen2.py MLP has bias=False). Forward-only — the int8 LM is
    the serving configuration (`prequantize_int8`), never trained."""
    m, k = hidden.shape
    i = wg_int8.shape[1]
    block_m = min(block_m, max(((m + 7) // 8) * 8, 8))
    mp = ((m + block_m - 1) // block_m) * block_m
    hp = jnp.pad(hidden, ((0, mp - m), (0, 0))) if mp != m else hidden
    kern = functools.partial(_fused_swiglu_kernel, eps=eps)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)  # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((i, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, k), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, k), hidden.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(hp, row(rms_w), wg_int8, row(sg), wu_int8, row(su), wd_int8, row(sd))
    return out[:m]


def fused_swiglu_block_int8_reference(hidden, rms_w, wg_int8, sg, wu_int8,
                                      su, wd_int8, sd, eps=1e-6):
    """jnp oracle with identical math (CPU fallback + tests)."""
    hf = hidden.astype(jnp.float32)
    var = jnp.mean(jnp.square(hf), axis=-1, keepdims=True)
    x = hf * jax.lax.rsqrt(var + eps) * rms_w[None, :].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    dot = lambda a, w: jax.lax.dot_general(  # noqa: E731
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    g = dot(xq, wg_int8).astype(jnp.float32) * sx * sg[None, :]
    u = dot(xq, wu_int8).astype(jnp.float32) * sx * su[None, :]
    h = jax.nn.silu(g) * u
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                     1e-12) / 127.0
    hq = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
    mlp = dot(hq, wd_int8).astype(jnp.float32) * sh * sd[None, :]
    return (hf + mlp).astype(hidden.dtype)


def fused_mlp_block_int8_reference(hidden, ln_w, ln_b, w1_int8, s1, b1,
                                   w2_int8, s2, b2, eps=1e-6):
    """jnp oracle with identical math (CPU fallback + tests)."""
    hf = hidden.astype(jnp.float32)
    mu = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(hf - mu), axis=-1, keepdims=True)
    x = (hf - mu) * jax.lax.rsqrt(var + eps) * ln_w[None, :] + ln_b[None, :]
    mlp = fused_mlp_int8_reference(x, w1_int8, s1, b1, w2_int8, s2, b2)
    return (hf + mlp.astype(jnp.float32)).astype(hidden.dtype)


def fused_mlp_int8_reference(x, w1_int8, s1, b1, w2_int8, s2, b2):
    """jnp oracle with identical quantization math (CPU fallback + tests)."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int32)
    h = (xq @ w1_int8.astype(jnp.int32)).astype(jnp.float32) * sx \
        * s1[None, :] + b1[None, :]
    h = jax.nn.gelu(h, approximate=True)
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                     1e-12) / 127.0
    hq = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int32)
    out = (hq @ w2_int8.astype(jnp.int32)).astype(jnp.float32) * sh \
        * s2[None, :] + b2[None, :]
    return out.astype(x.dtype)
