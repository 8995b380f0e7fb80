"""Fused LN + row-quant + int8 QKV projections for the vision tower.

One Pallas pass per layer computes, for a (block_r, H) row block of the
residual stream:

    x  = LayerNorm_fp32(hidden)
    xq = per-row symmetric int8 quant of x
    q/k/v = (xq @ W{q,k,v}_int8) * sx * s{q,k,v} + b{q,k,v}

and writes q/k/v **head-major** — (B, NH, S_pad, HD) — which is exactly the
block layout `pallas_flash_attention(layout="bhsd")` consumes. Compared to
the composed XLA path this removes, per tower layer:

  - the LN output round-trip through HBM (read hidden, write x, re-read x),
  - the separate `quantize_rows` pass (re-read x, write xq + scales),
  - the three (B, S, NH, HD) -> (B, NH, S, HD) HBM transposes (+ pads) at
    the flash-kernel boundary,

leaving one read of `hidden` and one head-major write of q/k/v as the only
HBM traffic besides the (VMEM-resident) int8 weights.

The in-kernel head split is a (BR, H) -> (NH, BR, HD) VMEM relayout. At
HD=72 this is the lane-offset slicing Mosaic penalizes (see
ops/pallas_attn_block.py's verdict); here it is paid once per row block on
bf16 *outputs* (not inside a per-head attention loop), which measurement
must justify — see PERFORMANCE.md round 3.

Targets the reference SigLIP encoder hot loop
(llava/model/multimodal_encoder/siglip_encoder.py:577-590) under the
load_8bit serving mode (llava/model/builder.py:30-34).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_f32(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rowquant(x):
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(jnp.int8)
    return q, s


def _qkv_kernel(
    hid_ref,                      # (1, BR, H) bf16/f32
    lnw_ref, lnb_ref,             # (1, H) f32
    wq_ref, sq_ref, bq_ref,       # (H, H) int8, (1, H) f32, (1, H) f32
    wk_ref, sk_ref, bk_ref,
    wv_ref, sv_ref, bv_ref,
    q_out, k_out, v_out,          # (1, NH, BR, HD)
    *, nh, hd, eps,
):
    x = _ln_f32(hid_ref[0], lnw_ref[...], lnb_ref[...], eps)
    xq, sx = _rowquant(x)
    def proj(w_ref, s_ref, b_ref, out):
        acc = jax.lax.dot_general(
            xq, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sx * s_ref[...] + b_ref[...])
        y = y.astype(out.dtype)                     # (BR, H)
        # head split: static lane slices (Mosaic rejects the equivalent
        # (BR, NH, HD) shape cast + transpose)
        for hh in range(nh):
            out[0, hh] = y[:, hh * hd:(hh + 1) * hd]

    proj(wq_ref, sq_ref, bq_ref, q_out)
    proj(wk_ref, sk_ref, bk_ref, k_out)
    proj(wv_ref, sv_ref, bv_ref, v_out)


@functools.partial(jax.jit, static_argnames=("nh", "eps", "block_r",
                                             "interpret"))
def fused_qkv_int8(
    hidden: jax.Array,            # (B, S, H)
    ln_w: jax.Array, ln_b: jax.Array,               # (H,)
    wq: jax.Array, sq: jax.Array, bq: jax.Array,    # (H, H) int8, (H,), (H,)
    wk: jax.Array, sk: jax.Array, bk: jax.Array,
    wv: jax.Array, sv: jax.Array, bv: jax.Array,
    *,
    nh: int,
    eps: float = 1e-6,
    block_r: int = 384,
    interpret: bool = False,
):
    """Returns (q, k, v) each (B, NH, S_pad, HD) bf16 with S padded to the
    block multiple; pad rows carry LN(0)-projection garbage and MUST be
    masked downstream (pass kv_valid_len=S to the flash kernel)."""
    b, s, h = hidden.shape
    hd = h // nh
    s_pad = -(-s // block_r) * block_r
    if s_pad != s:
        hidden = jnp.pad(hidden, ((0, 0), (0, s_pad - s), (0, 0)))
    nr = s_pad // block_r

    def vec(x):
        return x.reshape(1, h).astype(jnp.float32)

    kern = functools.partial(_qkv_kernel, nh=nh, hd=hd, eps=eps)
    row = lambda b_, r_: (b_, r_, 0)          # noqa: E731
    const = lambda b_, r_: (0, 0)             # noqa: E731
    mat = lambda b_, r_: (0, 0)               # noqa: E731
    out_idx = lambda b_, r_: (b_, 0, r_, 0)   # noqa: E731

    out_shape = jax.ShapeDtypeStruct((b, nh, s_pad, hd), jnp.bfloat16)
    out_spec = pl.BlockSpec((1, nh, block_r, hd), out_idx,
                            memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((h, h), mat, memory_space=pltpu.VMEM)

    q, k, v = pl.pallas_call(
        kern,
        grid=(b, nr),
        in_specs=[
            pl.BlockSpec((1, block_r, h), row, memory_space=pltpu.VMEM),
            vspec, vspec,
            mspec, vspec, vspec,
            mspec, vspec, vspec,
            mspec, vspec, vspec,
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out_shape, out_shape, out_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(
        hidden,
        vec(ln_w), vec(ln_b),
        wq, vec(sq), vec(bq),
        wk, vec(sk), vec(bk),
        wv, vec(sv), vec(bv),
    )
    return q, k, v
