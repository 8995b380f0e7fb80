"""Pallas flash-attention (forward) for TPU — the flash-attn-2 replacement on
the inference prefill path (SURVEY.md §2.9).

Online-softmax tiling over the KV sequence with causal block skipping and
per-batch valid-length masking (right-padded bucketed sequences). Statistics
(m, l, acc) accumulate in fp32 VMEM scratch; QK^T and PV run on the MXU with
fp32 accumulation. Layout: (B, H, S, D) blocks of (block_q x block_k).

The kernel itself is forward-only and tuned for single-batch long-prefill
latency, but the public wrapper carries a `jax.custom_vjp` whose backward
recomputes the exact same attention math in XLA — so differentiated callers
(the trainable memory fuser, DPO fusion) get correct gradients at the cost of
materializing the (B, H, Sq, Skv) fp32 logits in the backward. That is fine
for the memory module's moderate cross-attention shapes; the LM
self-attention *training* path instead uses the in-tree differentiable flash
kernel (jax.experimental.pallas.ops.tpu.flash_attention) via `ops.attention`,
which has a proper tiled backward.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128


def _flash_fwd_kernel(
    valid_len_ref,  # scalar prefetch: (B,) int32
    q_ref,          # (1, 1, BQ, D)
    k_ref,          # (1, 1, BK, D)
    v_ref,          # (1, 1, BK, D)
    o_ref,          # (1, 1, BQ, D)
    m_scratch,      # (BQ, NUM_LANES) fp32
    l_scratch,      # (BQ, NUM_LANES) fp32
    acc_scratch,    # (BQ, D) fp32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    static_valid_len: Optional[int] = None,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ikv = pl.program_id(3)

    @pl.when(ikv == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    # static_valid_len specializes the kernel on a compile-time valid length
    # (the single-clip serving path knows it at trace time): every
    # valid-length scalar compare folds to a constant, whole-block decisions
    # become static per-ikv arithmetic, and the SMEM prefetch is never read.
    valid_len = (static_valid_len if static_valid_len is not None
                 else valid_len_ref[b])

    if causal:
        # skip KV blocks entirely above the diagonal
        should_run = ((iq + 1) * block_q - 1) >= (ikv * block_k)
    else:
        should_run = True
    # skip KV blocks entirely beyond the valid length
    should_run = jnp.logical_and(should_run, ikv * block_k < valid_len)

    # Base-2 online softmax (round 5, same move as the merge kernel): the
    # softmax scale AND log2(e) fold into one multiply on the (BQ, D) q tile
    # — block_k/D times less VPU work than scaling the (BQ, BK) score block —
    # and every transcendental becomes the VPU-native exp2. Scores/stats then
    # live in log2 units; p_i = 2^(s_i - m) over log2-scaled scores is the
    # same softmax. (The previous pow2-only fold kept natural-log units; the
    # exp2 form subsumes it and also removes the non-pow2 score multiply for
    # the D=72 tower shapes.)
    c_log2 = sm_scale * 1.4426950408889634

    def _scores():
        q = (q_ref[0, 0].astype(jnp.float32) * c_log2).astype(q_ref.dtype)
        return jax.lax.dot_general(
            q, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK), log2-scaled

    def _accumulate(s):
        m_prev = m_scratch[...]  # (BQ, LANES) — lane-replicated row stats
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1)[:, None]  # (BQ, 1)
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast -> (BQ, LANES)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])       # (BQ, BK)
        l_curr = jnp.sum(p, axis=1)[:, None]  # (BQ, 1)
        l_next = alpha * l_prev + l_curr
        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]  # (BK, D)
        o_curr = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # (BQ, D)
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

    # The mask (2 iotas + 2 compares + and + select over the (BQ, BK) score
    # block) only changes anything on blocks the diagonal or the valid-length
    # edge actually crosses; interior blocks — the majority of a long causal
    # prefill — take a mask-free path. The kernel is VPU-bound at D=64 (the
    # MXU work per score element is tiny), so this is the hot-loop saving.
    needs_valid_mask = (ikv + 1) * block_k > valid_len
    if causal:
        needs_causal_mask = ((ikv + 1) * block_k - 1) > (iq * block_q)
        needs_mask = jnp.logical_or(needs_causal_mask, needs_valid_mask)
    else:
        needs_mask = needs_valid_mask

    @pl.when(jnp.logical_and(should_run, needs_mask))
    def _run_masked():
        s = _scores()
        row_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * block_q
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ikv * block_k
        mask = col_ids < valid_len
        if causal:
            mask = jnp.logical_and(mask, col_ids <= row_ids)
        _accumulate(jnp.where(mask, s, MASK_VALUE))

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(needs_mask)))
    def _run_interior():
        _accumulate(_scores())

    if causal:
        last_needed = jnp.minimum(
            num_kv_blocks - 1, ((iq + 1) * block_q - 1) // block_k
        )
    else:
        last_needed = num_kv_blocks - 1
    # the valid-length bound can end earlier than the causal bound
    last_valid = jnp.maximum((valid_len + block_k - 1) // block_k - 1, 0)
    last_needed = jnp.minimum(last_needed, last_valid)

    @pl.when(ikv == last_needed)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _pallas_forward(q, k, v, kv_valid_len, causal, scale, block_q, block_k,
                    interpret, layout="bshd", static_valid_len=None,
                    vmem_limit_bytes=None):
    if layout == "bhsd":
        # caller already supplies head-major tensors (e.g. the fused int8
        # QKV kernel, ops/pallas_qkv_int8.py) — no HBM transposes needed
        b, h, sq, d = q.shape
        skv = k.shape[2]
    else:
        b, sq, h, d = q.shape
        skv = k.shape[1]
    block_q = min(block_q, max(sq, 128))
    block_k = min(block_k, max(skv, 128))
    sq_pad = ((sq + block_q - 1) // block_q) * block_q
    skv_pad = ((skv + block_k - 1) // block_k) * block_k
    s_ax = 2 if layout == "bhsd" else 1

    def pad_s(x, target):
        pad = [(0, 0)] * 4
        pad[s_ax] = (0, target - x.shape[s_ax])
        return jnp.pad(x, pad)

    if sq_pad != sq:
        q = pad_s(q, sq_pad)
    if skv_pad != skv:
        k, v = pad_s(k, skv_pad), pad_s(v, skv_pad)
    if layout == "bhsd":
        qt, kt, vt = q, k, v
    else:
        # (B, H, S, D) layout for blocking
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
    nq, nkv = sq_pad // block_q, skv_pad // block_k

    kernel = functools.partial(
        _flash_fwd_kernel,
        causal=causal,
        sm_scale=scale,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=nkv,
        static_valid_len=static_valid_len,
    )
    def kv_index(b_i, h_i, iq, ikv, vl):
        # Skipped steps (above the causal diagonal or beyond the valid
        # length) redirect their K/V fetch to block 0 — the block the next
        # q row consumes first — so Mosaic's double-buffered DMA never
        # streams a block the kernel body won't read. Without this, a long
        # causal prefill DMAs ~2x the useful K/V bytes (half the grid is
        # skipped), and short prompts in large buckets stream the whole pad
        # region. (Same trick as the in-tree kernel's kv_index_map.)
        vlen = static_valid_len if static_valid_len is not None else vl[b_i]
        run = ikv * block_k < vlen
        if causal:
            run = jnp.logical_and(
                run, ((iq + 1) * block_q - 1) >= (ikv * block_k))
        nxt = jax.lax.select(run, ikv, 0)
        return (b_i, h_i, nxt, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ikv, vl: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), kv_index),
            pl.BlockSpec((1, 1, block_k, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ikv, vl: (b, h, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(kv_valid_len, qt, kt, vt)
    if layout == "bhsd":
        return out[:, :, :sq] if sq_pad != sq else out
    out = out.transpose(0, 2, 1, 3)
    if sq_pad != sq:
        out = out[:, :sq]
    return out


def _flash_merge_kernel(
    valid_len_ref,  # scalar prefetch: (B,) int32
    q_ref,          # (1, NH, BQ, D)
    k_ref,          # (1, NH, BK, D)
    v_ref,          # (1, NH, BK, D)
    o_ref,          # (1, BQ, NH*D)  — merged heads, residual-stream layout
    s_scr,          # (BQ, BK) f32 scratch — the head loop is python-unrolled
    p_scr,          # (BQ, BK) bf16 scratch   and Mosaic's stack allocator
                    # does not reuse temporaries across unrolled iterations
                    # (16 live score/probability tensors OOM the 16 MB
                    # scoped VMEM); routing them through shared scratch
                    # pins one buffer for all heads
    *,
    sm_scale: float,
    nh: int,
    hd: int,
    int8_scores: bool = False,
):
    b = pl.program_id(0)
    valid_len = valid_len_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, s_scr.shape, 1)
    key_mask = col < valid_len
    # VPU economics (round 5, PERFORMANCE.md): the softmax scale rides on the
    # (BQ, D) q tile instead of the (BQ, BK) score matrix (10x fewer mults),
    # log2(e) folds into that same scale so the transcendental is the
    # VPU-native exp2 (p_i = 2^(s_i - m) over log2-scaled scores is the same
    # softmax), and the (BQ, BK) division p/l becomes a (BQ, D) multiply by
    # 1/l folded into the output tile.
    c = sm_scale * 1.4426950408889634  # log2(e)
    for h in range(nh):
        if int8_scores:
            # int8 MXU mode for BOTH attention matmuls (the head_dim-72
            # contraction pads to 128 lanes either way, so the 2x int8 rate
            # is the only lever left on them). Per-tile SCALAR quantization:
            # the q/k scale product and the p scale (p is in (0, 1], so
            # x127 is exact) fold into scalars, never touching the (BQ, BK)
            # matrix beyond the one sq*sk multiply.
            qf = q_ref[0, h].astype(jnp.float32) * c
            sq = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-12) / 127.0
            qq = jnp.clip(jnp.round(qf * (1.0 / sq)), -127, 127
                          ).astype(jnp.int8)
            kf = k_ref[0, h].astype(jnp.float32)
            sk = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-12) / 127.0
            kq = jnp.clip(jnp.round(kf * (1.0 / sk)), -127, 127
                          ).astype(jnp.int8)
            raw = jax.lax.dot_general(
                qq, kq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s_scr[...] = jnp.where(
                key_mask, raw.astype(jnp.float32) * (sq * sk), MASK_VALUE)
            s = s_scr[...]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            p_scr[...] = jnp.round(p * 127.0).astype(p_scr.dtype)
            vf = v_ref[0, h].astype(jnp.float32)
            sv = jnp.maximum(jnp.max(jnp.abs(vf)), 1e-12) / 127.0
            vq = jnp.clip(jnp.round(vf * (1.0 / sv)), -127, 127
                          ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                p_scr[...], vq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o = acc.astype(jnp.float32) * ((sv / 127.0) / l)
            o_ref[0, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)
            continue
        q = (q_ref[0, h].astype(jnp.float32) * c).astype(q_ref.dtype)  # (BQ, D)
        k = k_ref[0, h]  # (BK, D)
        s_scr[...] = jnp.where(key_mask, jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ), MASK_VALUE)
        s = s_scr[...]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p_scr[...] = p.astype(p_scr.dtype)  # unnormalized; values in (0, 1]
        o = jax.lax.dot(
            p_scr[...], v_ref[0, h],
            preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = (o * (1.0 / l)).astype(o_ref.dtype)


def flash_attention_merge_heads(
    q: jax.Array,  # (B, NH, S_pad, D) — e.g. from fused_qkv_int8
    k: jax.Array,
    v: jax.Array,
    kv_valid_len: jax.Array,  # (B,) int32
    *,
    scale: Optional[float] = None,
    block_q: int = 128,
    vmem_limit_bytes: Optional[int] = None,
    int8_scores: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """One-shot flash attention that writes MERGED heads — (B, S_pad, NH*D),
    the residual-stream layout the out-projection consumes — so the
    (B, NH, S, D) attention intermediate never round-trips HBM and no
    boundary transpose remains. Queries stream in row blocks; K/V for the
    whole key axis stay parked in VMEM per batch step (the vision-tower
    case, S_pad <= ~1024 — a full-tower block set OOMs the 16 MB scoped
    VMEM). Non-causal; forward-only (the tower is frozen/stop-gradient'ed
    on the active path, llava_arch.py:302).

    ``int8_scores`` runs both attention matmuls on the int8 MXU with
    per-tile scalar quantization (q/k/p/v) — an APPROXIMATE mode in the
    same drift class as the int8 tower projections; qualified by the
    flagship greedy-agreement gate before defaulting on
    (tools_int8_qualify.py)."""
    b, nh, s_pad, d = q.shape
    scale = scale if scale is not None else d**-0.5
    block_q = min(block_q, s_pad)
    while s_pad % block_q:
        block_q //= 2  # s_pad is a multiple of 8, so this terminates aligned
    nq = s_pad // block_q
    kernel = functools.partial(
        _flash_merge_kernel, sm_scale=scale, nh=nh, hd=d,
        int8_scores=int8_scores)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, nh, block_q, d), lambda b, iq, vl: (b, 0, iq, 0)),
            pl.BlockSpec((1, nh, s_pad, d), lambda b, iq, vl: (b, 0, 0, 0)),
            pl.BlockSpec((1, nh, s_pad, d), lambda b, iq, vl: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, nh * d),
                               lambda b, iq, vl: (b, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, s_pad), jnp.float32),
            pltpu.VMEM((block_q, s_pad),
                       jnp.int8 if int8_scores else jnp.bfloat16),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, nh * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(kv_valid_len.astype(jnp.int32), q, k, v)


def _flash_merge_oproj_kernel(
    valid_len_ref,  # scalar prefetch: (B,) int32
    q_ref,          # (1, NH, BQ, D)
    k_ref,          # (1, NH, BK, D)
    v_ref,          # (1, NH, BK, D)
    hid_ref,        # (1, BQ, NH*D) — residual stream (padded rows ok)
    wo_ref,         # (NH*D, NH*D) int8 out-projection
    so_ref,         # (1, NH*D) f32 per-output-channel scale
    bo_ref,         # (1, NH*D) f32 bias
    out_ref,        # (1, BQ, NH*D) — hidden + out_proj(attn)
    s_scr,          # (BQ, BK) f32   (see _flash_merge_kernel on why scratch)
    p_scr,          # (BQ, BK) bf16
    a_scr,          # (BQ, NH*D) bf16 — merged attention output
    *,
    sm_scale: float,
    nh: int,
    hd: int,
):
    b = pl.program_id(0)
    valid_len = valid_len_ref[b]
    col = jax.lax.broadcasted_iota(jnp.int32, s_scr.shape, 1)
    key_mask = col < valid_len
    c = sm_scale * 1.4426950408889634  # base-2 softmax; see _flash_merge_kernel
    for h in range(nh):
        qh = (q_ref[0, h].astype(jnp.float32) * c).astype(q_ref.dtype)
        s_scr[...] = jnp.where(key_mask, jax.lax.dot_general(
            qh, k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), MASK_VALUE)
        s = s_scr[...]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p_scr[...] = p.astype(p_scr.dtype)
        o = jax.lax.dot(
            p_scr[...], v_ref[0, h], preferred_element_type=jnp.float32)
        a_scr[:, h * hd:(h + 1) * hd] = (o * (1.0 / l)).astype(a_scr.dtype)
    # int8 out-projection + residual, same row-quant math as
    # ops/quant.int8_linear (per-row scale over the full NH*D row)
    x = a_scr[...].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x * (1.0 / sx)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * so_ref[...] + bo_ref[...]
    out_ref[0] = (hid_ref[0].astype(jnp.float32) + y).astype(out_ref.dtype)


def flash_attention_out_proj_int8(
    q: jax.Array,  # (B, NH, S_pad, D) — from fused_qkv_int8
    k: jax.Array,
    v: jax.Array,
    kv_valid_len: jax.Array,  # (B,) int32
    hidden: jax.Array,        # (B, S_pad, NH*D) residual stream
    wo: jax.Array, so: jax.Array, bo: jax.Array,
    *,
    scale: Optional[float] = None,
    block_q: int = 128,
    vmem_limit_bytes: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """`flash_attention_merge_heads` + the int8 out-projection + residual
    add in the same pass: returns hidden + attn @ Wo directly, so neither
    the merged attention output nor the quantized activations round-trip
    HBM. Requires the residual stream padded to S_pad (whole-stream padding
    — see models/siglip.py). Forward-only, non-causal (frozen tower)."""
    b, nh, s_pad, d = q.shape
    h_tot = nh * d
    if hidden.shape != (b, s_pad, h_tot):
        raise ValueError(
            f"residual stream {hidden.shape} must match q's padded geometry "
            f"{(b, s_pad, h_tot)} — pad the whole stream (models/siglip.py)")
    scale = scale if scale is not None else d**-0.5
    block_q = min(block_q, s_pad)
    while s_pad % block_q:
        block_q //= 2
    nq = s_pad // block_q
    kernel = functools.partial(
        _flash_merge_oproj_kernel, sm_scale=scale, nh=nh, hd=d)

    def vec(x):
        return x.reshape(1, h_tot).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, nh, block_q, d), lambda b, iq, vl: (b, 0, iq, 0)),
            pl.BlockSpec((1, nh, s_pad, d), lambda b, iq, vl: (b, 0, 0, 0)),
            pl.BlockSpec((1, nh, s_pad, d), lambda b, iq, vl: (b, 0, 0, 0)),
            pl.BlockSpec((1, block_q, h_tot), lambda b, iq, vl: (b, iq, 0)),
            pl.BlockSpec((h_tot, h_tot), lambda b, iq, vl: (0, 0)),
            pl.BlockSpec((1, h_tot), lambda b, iq, vl: (0, 0)),
            pl.BlockSpec((1, h_tot), lambda b, iq, vl: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, h_tot),
                               lambda b, iq, vl: (b, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, s_pad), jnp.float32),
            pltpu.VMEM((block_q, s_pad), jnp.bfloat16),
            pltpu.VMEM((block_q, h_tot), jnp.bfloat16),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, h_tot), hidden.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(kv_valid_len.astype(jnp.int32), q, k, v, hidden, wo, vec(so), vec(bo))


def _xla_attention(q, k, v, kv_valid_len, causal, scale, layout="bshd"):
    """Exact XLA restatement of the kernel's math (fp32 logits + softmax,
    prefix valid-length mask, optional causal mask) — used only to derive the
    backward pass of `pallas_flash_attention`."""
    if layout == "bhsd":
        sq, skv = q.shape[2], k.shape[2]
        qk, pv = "bhqd,bhkd->bhqk", "bhqk,bhkd->bhqd"
    else:
        sq, skv = q.shape[1], k.shape[1]
        qk, pv = "bqhd,bkhd->bhqk", "bhqk,bkhd->bqhd"
    logits = jnp.einsum(qk, q, k, preferred_element_type=jnp.float32) * scale
    col = jnp.arange(skv)[None, None, None, :]
    mask = col < kv_valid_len[:, None, None, None]
    if causal:
        mask = jnp.logical_and(mask, col <= jnp.arange(sq)[None, None, :, None])
    logits = jnp.where(mask, logits, MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(pv, probs.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(static, q, k, v, kv_valid_len):
    # static = (causal, scale, block_q, block_k, interpret, layout,
    #           static_valid_len) — the trailing entries optional.
    return _pallas_forward(q, k, v, kv_valid_len, *static)


def _flash_fwd(static, q, k, v, kv_valid_len):
    return _flash(static, q, k, v, kv_valid_len), (q, k, v, kv_valid_len)


def _flash_bwd(static, res, g):
    causal, scale = static[0], static[1]
    layout = static[5] if len(static) > 5 else "bshd"
    q, k, v, kv_valid_len = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_attention(q, k, v, kv_valid_len, causal, scale,
                                       layout),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, np.zeros(kv_valid_len.shape, jax.dtypes.float0)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k",
                              "interpret", "layout", "static_valid_len",
                              "vmem_limit_bytes")
)
def _pallas_flash_attention_jit(q, k, v, kv_valid_len, *, causal, scale,
                                block_q, block_k, interpret, layout,
                                static_valid_len, vmem_limit_bytes=None):
    return _flash((causal, scale, block_q, block_k, interpret, layout,
                   static_valid_len, vmem_limit_bytes),
                  q, k, v, kv_valid_len)


def pallas_flash_attention(
    q: jax.Array,  # (B, S, H, D)
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    kv_valid_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    layout: str = "bshd",
    static_valid_len: Optional[int] = None,
    vmem_limit_bytes: Optional[int] = None,
) -> jax.Array:
    """Flash attention; q and k/v sequence lengths may differ
    (cross-attention). Sequences are padded to block multiples internally;
    `causal` assumes q and kv share one timeline (self-attention).
    Differentiable: the backward recomputes via XLA (see module docstring).

    `layout="bhsd"` takes and returns head-major (B, H, S, D) tensors —
    the kernel's native block layout — skipping the boundary transposes
    (used with ops/pallas_qkv_int8.fused_qkv_int8).

    `static_valid_len` bakes the valid length into the compiled kernel:
    the per-grid-step SMEM scalar read, valid-length compares, and the
    DMA-redirect select fold to constants (measured 2.78 -> 2.47 ms/layer
    at the flagship 9.7k prefill, tools_prefill_flash_ab2.py). When both
    it and `kv_valid_len` are passed, the kernel uses the static value —
    the caller must keep them consistent. With neither, the full `skv` is
    baked in (every key valid). A concrete (non-tracer) `kv_valid_len`
    with one distinct value — e.g. the single-clip pipeline's
    `jnp.asarray([s])` built from a static shape at trace time — is
    lifted to `static_valid_len` automatically; bucketed serving paths
    pass traced lengths and keep the dynamic kernel."""
    if layout == "bhsd":
        b, h, sq, d = q.shape
        skv = k.shape[2]
    else:
        b, sq, h, d = q.shape
        skv = k.shape[1]
    if causal and sq != skv:
        raise ValueError("causal flash attention requires equal q/kv lengths")
    scale = scale if scale is not None else d**-0.5
    if kv_valid_len is None:
        if static_valid_len is None:
            static_valid_len = skv
        kv_valid_len = jnp.full((b,), static_valid_len, jnp.int32)
    else:
        kv_valid_len = jnp.asarray(kv_valid_len).astype(jnp.int32)
        if static_valid_len is None and not isinstance(
                kv_valid_len, jax.core.Tracer):
            vals = np.asarray(kv_valid_len)
            if vals.size and bool((vals == vals.flat[0]).all()):
                static_valid_len = int(vals.flat[0])
    return _pallas_flash_attention_jit(
        q, k, v, kv_valid_len, causal=causal, scale=scale, block_q=block_q,
        block_k=block_k, interpret=interpret, layout=layout,
        static_valid_len=static_valid_len, vmem_limit_bytes=vmem_limit_bytes)
