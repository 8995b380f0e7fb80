"""Fused attention half-block for the int8 vision tower (EXPERIMENTAL,
not wired — measured slower than the composed path; see below).

One Pallas pass computes, per transformer layer:

    hidden + Wo @ attn(LN1(hidden) @ {Wq, Wk, Wv})

i.e. layernorm, the three int8 input projections, per-head softmax
attention, the int8 output projection, and the residual add — with every
intermediate (normalized activations, q/k/v, the (S, S) score matrices,
the attention output) living in VMEM only.

Why: ablation of the in-context int8 tower (PERFORMANCE.md round 3) put the
XLA attention half at ~7.5 ms/layer: the (B, H, 729, 729) score tensors and
the q/k/v (B, S, H*D) intermediates all stream through HBM, plus layout
transposes at the flash-kernel boundary. Here the only HBM traffic per
layer is two reads + one write of the (B, S, H) hidden state and one read
of the four weight matrices.

Grid: (frames, 2 * nr) row-block steps per frame, two phases:
  - steps r < nr normalize/quantize/project row-block r to K / V and store
    them head-major into VMEM scratch ((nh, S, hd): head slices are
    leading-axis loads in the attention loop) — chunking keeps the fp32
    projection intermediates inside the ~16 MB VMEM budget;
  - steps r >= nr project the row-block's queries, loop the heads
    (python-unrolled), run one-shot softmax over the whole key axis
    (S_pad fits one kv pass — no running rescale), and apply the int8
    output projection + residual.

The reference hot path this targets is the SigLIP encoder self-attention
(llava/model/multimodal_encoder/siglip_encoder.py:577-590) under the
load_8bit serving mode (llava/model/builder.py:30-34).

MEASURED VERDICT (round 3, v5e): 6.9 ms/layer at tower shapes
(64x768x1152, nh=16, block_r=128, 2/18-rep differencing) vs ~7.5 ms for
the composed flash-attention + XLA-int8-projection path it would replace —
not enough to wire. The bottlenecks are structural at hd=72: head slices
of the (BR, 1152) projection outputs sit at 72-lane offsets (Mosaic
relayout per slice), the sequential fori head loop serializes 16 small
matmul pairs per row-block, and padding heads to 128-lane slots pushes
the four weight operands past the 16 MB scoped-VMEM budget (measured
23.4 MB at block_r=256 unrolled; 16.09 MB even at B=4/block_r=128).
Kept as a working, oracle-pinned experiment (tests/test_attn_block.py);
revisit if Mosaic grows cheap sub-lane-aligned slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ln_f32(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rowquant(x):
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(jnp.int8)
    return q, s


def _int8_mm(xq, sx, w_ref, s_ref, b_ref):
    acc = jax.lax.dot_general(
        xq, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * s_ref[...] + b_ref[...]


def _attn_block_kernel(
    hid_blk_ref, lnw_ref, lnb_ref,
    wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
    wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref,
    out_ref, q_scr, k_scr, v_scr,
    *, nh, hd, valid, eps, scale, block_r, nr,
):
    r = pl.program_id(1)
    s_pad = nr * block_r

    @pl.when(r < nr)
    def _qkv_phase():
        hid = hid_blk_ref[0]                               # (BR, H) bf16
        x = _ln_f32(hid, lnw_ref[...], lnb_ref[...], eps)
        xq, sx = _rowquant(x)
        row0 = r * block_r
        # head-major scratch stores: python loop => static lane offsets
        q = _int8_mm(xq, sx, wq_ref, sq_ref, bq_ref).astype(jnp.bfloat16)
        for h in range(nh):
            q_scr[h, pl.ds(row0, block_r), :] = q[:, h * hd:(h + 1) * hd]
        k = _int8_mm(xq, sx, wk_ref, sk_ref, bk_ref).astype(jnp.bfloat16)
        for h in range(nh):
            k_scr[h, pl.ds(row0, block_r), :] = k[:, h * hd:(h + 1) * hd]
        v = _int8_mm(xq, sx, wv_ref, sv_ref, bv_ref).astype(jnp.bfloat16)
        for h in range(nh):
            v_scr[h, pl.ds(row0, block_r), :] = v[:, h * hd:(h + 1) * hd]

    @pl.when(r >= nr)
    def _attn_phase():
        row0 = (r - nr) * block_r
        col = jax.lax.broadcasted_iota(jnp.int32, (block_r, s_pad), 1)
        key_mask = col < valid
        h_tot = nh * hd

        def head_body(h, acc):
            logits = jax.lax.dot_general(
                q_scr[h, pl.ds(row0, block_r), :], k_scr[h],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (BR, S)
            logits = jnp.where(key_mask, logits, NEG_INF)
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_scr[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / l      # (BR, hd)
            # per-(row, head) quantized slice of the output projection:
            # out = sum_h (o_h @ Wo[h]) — scales factor out per row
            oq, so_row = _rowquant(o)
            part = jax.lax.dot_general(
                oq, wo_ref[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)            # (BR, H)
            return acc + part.astype(jnp.float32) * so_row

        acc = jax.lax.fori_loop(
            0, nh, head_body, jnp.zeros((block_r, h_tot), jnp.float32),
            unroll=False)
        o = acc * so_ref[...] + bo_ref[...]
        hid = hid_blk_ref[0]
        out_ref[0] = (hid.astype(jnp.float32) + o).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "nh", "valid", "eps", "scale", "block_r", "interpret"))
def fused_attn_block_int8(
    hidden: jax.Array,     # (B, S_pad, H) bf16/f32, rows >= valid are padding
    ln_w: jax.Array, ln_b: jax.Array,            # (H,)
    wq: jax.Array, sq: jax.Array, bq: jax.Array,  # (H, H) int8, (H,), (H,)
    wk: jax.Array, sk: jax.Array, bk: jax.Array,
    wv: jax.Array, sv: jax.Array, bv: jax.Array,
    wo: jax.Array, so: jax.Array, bo: jax.Array,
    *,
    nh: int,
    valid: int,
    eps: float = 1e-6,
    scale: float | None = None,
    block_r: int = 256,
    interpret: bool = False,
) -> jax.Array:
    b, s_pad, h = hidden.shape
    hd = h // nh
    scale = scale if scale is not None else hd**-0.5
    block_r = min(block_r, s_pad)
    assert s_pad % block_r == 0, (s_pad, block_r)
    nr = s_pad // block_r

    def vec(x):
        return x.reshape(1, -1).astype(jnp.float32)

    kern = functools.partial(
        _attn_block_kernel, nh=nh, hd=hd, valid=valid, eps=eps, scale=scale,
        block_r=block_r, nr=nr)

    def row_idx(b_, r_):
        # phase 1 (r < nr) builds K/V for row-block r; phase 2 revisits the
        # same row-blocks for queries
        return (b_, jax.lax.rem(r_, nr), 0)

    def out_idx(b_, r_):
        # out blocks are written only in phase 2; phase-1 steps park on
        # block 0, which phase 2 then overwrites (blocks copy back only on
        # index change, after the real write)
        return (b_, jnp.maximum(r_ - nr, 0), 0)

    const = lambda b_, r_: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(b, 2 * nr),
        in_specs=[
            pl.BlockSpec((1, block_r, h), row_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, hd, h), lambda b_, r_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_r, h), out_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, h), hidden.dtype),
        scratch_shapes=[
            pltpu.VMEM((nh, s_pad, hd), jnp.bfloat16),
            pltpu.VMEM((nh, s_pad, hd), jnp.bfloat16),
            pltpu.VMEM((nh, s_pad, hd), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(hidden,
      vec(ln_w), vec(ln_b),
      wq, vec(sq), vec(bq),
      wk, vec(sk), vec(bk),
      wv, vec(sv), vec(bv),
      wo.reshape(nh, hd, h), vec(so), vec(bo))
    return out


def fused_attn_block_int8_reference(
    hidden, ln_w, ln_b, wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo,
    *, nh, valid, eps=1e-6, scale=None,
):
    """jnp oracle with identical quantization math (CPU fallback + tests)."""
    b, s_pad, h = hidden.shape
    hd = h // nh
    scale = scale if scale is not None else hd**-0.5

    def rowquant(x):
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                        1e-12) / 127.0
        q = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(jnp.int32)
        return q, s

    def int8_mm(xq, sx, w, s, bias):
        acc = jnp.einsum("...k,kn->...n", xq, w.astype(jnp.int32))
        return acc.astype(jnp.float32) * sx * s[None, :] + bias[None, :]

    hf = hidden.astype(jnp.float32)
    mu = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(hf - mu), axis=-1, keepdims=True)
    x = (hf - mu) * jax.lax.rsqrt(var + eps) * ln_w[None, None, :] \
        + ln_b[None, None, :]
    xq, sx = rowquant(x)
    q = int8_mm(xq, sx, wq, sq, bq)
    k = int8_mm(xq, sx, wk, sk, bk)
    v = int8_mm(xq, sx, wv, sv, bv)
    q3 = q.reshape(b, s_pad, nh, hd).astype(jnp.bfloat16)
    k3 = k.reshape(b, s_pad, nh, hd).astype(jnp.bfloat16)
    v3 = v.reshape(b, s_pad, nh, hd).astype(jnp.bfloat16)
    logits = jnp.einsum("bqnd,bknd->bnqk", q3, k3,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(s_pad)[None, None, None, :] < valid
    logits = jnp.where(mask, logits, NEG_INF)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bnqk,bknd->bqnd", p.astype(jnp.bfloat16), v3,
                   preferred_element_type=jnp.float32) / l.transpose(0, 2, 1, 3)
    # out-projection with per-(row, head) quantization, matching the kernel:
    # out = sum_h (quant(o_h) @ Wo[h]) * s_row_h, then * so + bo
    oq, sa = rowquant(o)                                   # (b, s, nh, hd)
    wo3 = wo.reshape(nh, hd, h).astype(jnp.int32)
    parts = jnp.einsum("bqnd,ndh->bqnh", oq, wo3)          # int32
    out = jnp.sum(parts.astype(jnp.float32) * sa, axis=2) * so[None, None, :] \
        + bo[None, None, :]
    return (hf + out).astype(hidden.dtype)
