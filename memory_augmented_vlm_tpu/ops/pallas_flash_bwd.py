"""Tiled flash-attention BACKWARD for TPU — the training-path kernel behind
`ops.attention.flash_attention(differentiable=True)`.

FlashAttention-2-style backward over saved (q, k, v, out, lse):

  delta = rowsum(dO * O)                                  (XLA, cheap)
  dq   : grid (b, h, iq, jk) — accumulate per q block over kv blocks
  dk/dv: grid (b, h, jk, iq) — accumulate per kv block over q blocks

Both passes compute the score tile TRANSPOSED (s_T = k @ q^T, shape
(block_k, block_q)): in that orientation every matmul of the backward is a
natural MXU contraction (dv = p_T @ dO, dk = ds_T @ q, dq = ds_T^T-contracted
@ k) AND the per-row softmax statistics broadcast as (1, block_q) row
vectors. That lets lse/delta stream as (B, H, 8, S) sublane-replicated
arrays with (1, 1, 8, block_q) blocks (8 = min fp32 sublane tile) — ~16 KB
per grid step instead of the lane-replicated (block_q, 128)
fp32 buffers of the first version of this kernel (256 KB per step each,
which dominated the dkv pass's HBM traffic and made it lose to the in-tree
kernel; see PERFORMANCE.md round 3).

p is recomputed per tile from exp(s - lse) — no (S, S) materialization —
with causal block skipping and right-padded prefix masking identical to the
forward kernel (ops/pallas_flash.py). Replaces the role of flash-attn-2's
backward in reference training (llava/train/train.py:188).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from memory_augmented_vlm_tpu.ops.pallas_flash import MASK_VALUE, NUM_LANES

# ---------------------------------------------------------------------------
# Forward with LSE output (same math as ops/pallas_flash._flash_fwd_kernel)
# ---------------------------------------------------------------------------


def _fwd_lse_kernel(
    valid_len_ref,
    q_ref, k_ref, v_ref,
    o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
    num_kv_blocks: int,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ikv = pl.program_id(3)

    @pl.when(ikv == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    valid_len = valid_len_ref[b]
    if causal:
        should_run = ((iq + 1) * block_q - 1) >= (ikv * block_k)
    else:
        should_run = True
    should_run = jnp.logical_and(should_run, ikv * block_k < valid_len)

    # base-2 online softmax (round 5, same as the inference kernels): the
    # softmax scale and log2(e) fold into one multiply on the (BQ, D) q
    # tile, every transcendental is the VPU-native exp2, and the stored lse
    # is in LOG2 units — the dq/dkv kernels consume it as exp2(st - lse).
    c_log2 = sm_scale * 1.4426950408889634
    # interior blocks (not crossed by the causal diagonal or the valid-length
    # edge) skip the iota/compare/select mask entirely — the round-4 forward
    # trick, which the backward never got (VERDICT round-4 item 4)
    needs_valid_mask = (ikv + 1) * block_k > valid_len
    if causal:
        needs_mask = jnp.logical_or(
            ((ikv + 1) * block_k - 1) > (iq * block_q), needs_valid_mask)
    else:
        needs_mask = needs_valid_mask

    def _scores():
        q = (q_ref[0, 0].astype(jnp.float32) * c_log2).astype(q_ref.dtype)
        return jax.lax.dot_general(
            q, k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def _accumulate(s):
        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_curr = jnp.sum(p, axis=1)[:, None]
        l_next = alpha * l_prev + l_curr
        m_scratch[...] = m_next
        l_scratch[...] = l_next
        v = v_ref[0, 0]
        o_curr = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

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
            num_kv_blocks - 1, ((iq + 1) * block_q - 1) // block_k)
    else:
        last_needed = num_kv_blocks - 1
    last_valid = jnp.maximum((valid_len + block_k - 1) // block_k - 1, 0)
    last_needed = jnp.minimum(last_needed, last_valid)

    @pl.when(ikv == last_needed)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        # LOG2 units (m is log2-scaled; log2(l) completes the lse)
        lse = m_scratch[...] + jnp.log2(jnp.maximum(l_scratch[...], 1e-30))
        # (block_q, 1) -> (8, block_q) row layout (8 = min fp32 sublane tile):
        # one small relayout per q block, amortized over the whole kv loop
        lse_ref[0, 0] = jnp.broadcast_to(
            jnp.transpose(lse[:, :1], (1, 0)), (8, lse.shape[0]))


# ---------------------------------------------------------------------------
# dq kernel: q-major grid, transposed score space, accumulate over kv blocks
# ---------------------------------------------------------------------------


def _dq_kernel(
    valid_len_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scratch,
    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
    num_kv_blocks: int,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ikv = pl.program_id(3)

    @pl.when(ikv == 0)
    def _init():
        dq_scratch[...] = jnp.zeros(dq_scratch.shape, jnp.float32)

    valid_len = valid_len_ref[b]
    if causal:
        should_run = ((iq + 1) * block_q - 1) >= (ikv * block_k)
    else:
        should_run = True
    should_run = jnp.logical_and(should_run, ikv * block_k < valid_len)

    # lse arrives in LOG2 units (see _fwd_lse_kernel); st is log2-scaled by
    # folding sm_scale*log2(e) onto the q tile, so pt = exp2(st - lse) gives
    # the same probabilities. dst stays in RAW-score units (the sm_scale
    # factor is the d(scaled)/d(raw) chain-rule term, unchanged by the base).
    c_log2 = sm_scale * 1.4426950408889634
    needs_valid_mask = (ikv + 1) * block_k > valid_len
    if causal:
        needs_mask = jnp.logical_or(
            ((ikv + 1) * block_k - 1) > (iq * block_q), needs_valid_mask)
    else:
        needs_mask = needs_valid_mask

    def _pt(masked):
        q = (q_ref[0, 0].astype(jnp.float32) * c_log2).astype(q_ref.dtype)
        lse = lse_ref[0, 0][:1]      # (1, BQ) fp32, log2 units
        # transposed scores: rows = kv positions, cols = q positions
        st = jax.lax.dot_general(
            k_ref[0, 0], q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        pt = jnp.exp2(st - lse)
        if masked:
            kv_ids = jax.lax.broadcasted_iota(
                jnp.int32, st.shape, 0) + ikv * block_k
            q_ids = jax.lax.broadcasted_iota(
                jnp.int32, st.shape, 1) + iq * block_q
            mask = kv_ids < valid_len
            if causal:
                mask = jnp.logical_and(mask, kv_ids <= q_ids)
            pt = jnp.where(mask, pt, 0.0)
        return pt                                               # (BK, BQ)

    def _accum(pt):
        k = k_ref[0, 0]
        delta = delta_ref[0, 0][:1]  # (1, BQ) fp32
        dpt = jax.lax.dot_general(
            v_ref[0, 0], do_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dst = pt * (dpt - delta) * sm_scale                     # (BK, BQ)
        # dq += ds^T-contraction @ k : contract the kv dim of both operands
        dq_scratch[...] += jax.lax.dot_general(
            dst.astype(k.dtype), k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(should_run, needs_mask))
    def _run_masked():
        _accum(_pt(True))

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(needs_mask)))
    def _run_interior():
        _accum(_pt(False))

    @pl.when(ikv == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_scratch[...].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# dk/dv kernel: kv-major grid, transposed score space, accumulate over q
# ---------------------------------------------------------------------------


def _dkv_kernel(
    valid_len_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, causal: bool, sm_scale: float, block_q: int, block_k: int,
    num_q_blocks: int,
):
    b = pl.program_id(0)
    jk = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    valid_len = valid_len_ref[b]
    if causal:
        # q blocks strictly above the diagonal contribute nothing to this kv
        should_run = ((iq + 1) * block_q - 1) >= (jk * block_k)
    else:
        should_run = True
    should_run = jnp.logical_and(should_run, jk * block_k < valid_len)

    # same base-2 + mask-free-interior scheme as _dq_kernel (lse in log2
    # units; pad-query columns self-neutralize through zero dO rows)
    c_log2 = sm_scale * 1.4426950408889634
    needs_valid_mask = (jk + 1) * block_k > valid_len
    if causal:
        needs_mask = jnp.logical_or(
            ((jk + 1) * block_k - 1) > (iq * block_q), needs_valid_mask)
    else:
        needs_mask = needs_valid_mask

    def _pt(masked):
        qc = (q_ref[0, 0].astype(jnp.float32) * c_log2).astype(q_ref.dtype)
        lse = lse_ref[0, 0][:1]      # (1, BQ) fp32, log2 units
        st = jax.lax.dot_general(
            k_ref[0, 0], qc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        pt = jnp.exp2(st - lse)
        if masked:
            kv_ids = jax.lax.broadcasted_iota(
                jnp.int32, st.shape, 0) + jk * block_k
            q_ids = jax.lax.broadcasted_iota(
                jnp.int32, st.shape, 1) + iq * block_q
            mask = kv_ids < valid_len
            if causal:
                mask = jnp.logical_and(mask, kv_ids <= q_ids)
            pt = jnp.where(mask, pt, 0.0)
        return pt                                               # (BK, BQ)

    def _accum(pt):
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        delta = delta_ref[0, 0][:1]  # (1, BQ) fp32
        # dv += p^T @ do — already transposed, a natural contraction
        dv_scratch[...] += jax.lax.dot(
            pt.astype(do.dtype), do, preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(
            v_ref[0, 0], do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dst = pt * (dpt - delta) * sm_scale
        # dk += ds^T @ q — natural contraction in transposed space
        dk_scratch[...] += jax.lax.dot(
            dst.astype(q.dtype), q, preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(should_run, needs_mask))
    def _run_masked():
        _accum(_pt(True))

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(needs_mask)))
    def _run_interior():
        _accum(_pt(False))

    @pl.when(iq == num_q_blocks - 1)
    def _store():
        dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side assembly
# ---------------------------------------------------------------------------


def _pad_qkv(q, k, v, block_q, block_k):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    sq_pad = ((sq + block_q - 1) // block_q) * block_q
    skv_pad = ((skv + block_k - 1) // block_k) * block_k
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0), (0, 0)))
    if skv_pad != skv:
        pad = ((0, 0), (0, skv_pad - skv), (0, 0), (0, 0))
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)
    return q, k, v, sq_pad, skv_pad


def _forward_with_lse(q, k, v, kv_valid_len, causal, scale, block_q, block_k,
                      interpret, vmem_limit_bytes=None):
    b, sq, h, d = q.shape
    q, k, v, sq_pad, skv_pad = _pad_qkv(q, k, v, block_q, block_k)
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    nq, nkv = sq_pad // block_q, skv_pad // block_k
    kernel = functools.partial(
        _fwd_lse_kernel, causal=causal, sm_scale=scale, block_q=block_q,
        block_k=block_k, num_kv_blocks=nkv)

    def kv_index(b_i, h_i, iq, ikv, vl):
        # skipped grid steps redirect their K/V fetch to block 0 so the
        # double-buffered DMA never streams bytes the body won't read
        # (round-4 forward trick; a causal backward skips ~half its grid)
        run = ikv * block_k < vl[b_i]
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
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ikv, vl: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, 8, block_q),
                         lambda b, h, iq, ikv, vl: (b, h, 0, iq)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(qt.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, 8, sq_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(kv_valid_len, qt, kt, vt)
    out = out.transpose(0, 2, 1, 3)[:, :sq]
    return out, lse  # lse is (B, H, 8, Sq_pad) fp32, sublane-replicated


def _backward(q, k, v, out, lse, g, kv_valid_len, causal, scale, block_q,
              block_k, interpret, vmem_limit_bytes=None):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    q_p, k_p, v_p, sq_pad, skv_pad = _pad_qkv(q, k, v, block_q, block_k)
    g_p = jnp.pad(g, ((0, 0), (0, sq_pad - sq), (0, 0), (0, 0))) \
        if sq_pad != sq else g
    out_p = jnp.pad(out, ((0, 0), (0, sq_pad - sq), (0, 0), (0, 0))) \
        if sq_pad != sq else out
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q_p, k_p, v_p))
    dot = g_p.transpose(0, 2, 1, 3)
    ot = out_p.transpose(0, 2, 1, 3)
    # delta = rowsum(dO * O) — sublane-replicated to the same (B, H, 8, S)
    # row layout as lse so both stream as tiny (1, 1, 8, block_q) blocks
    delta = jnp.sum(dot.astype(jnp.float32) * ot.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, :, None, :], (b, h, 8, sq_pad))
    nq, nkv = sq_pad // block_q, skv_pad // block_k

    dq_kernel = functools.partial(
        _dq_kernel, causal=causal, sm_scale=scale, block_q=block_q,
        block_k=block_k, num_kv_blocks=nkv)

    def dq_kv_index(b_i, h_i, iq, ikv, vl):
        # skipped-step DMA redirect (see _forward_with_lse.kv_index)
        run = ikv * block_k < vl[b_i]
        if causal:
            run = jnp.logical_and(
                run, ((iq + 1) * block_q - 1) >= (ikv * block_k))
        nxt = jax.lax.select(run, ikv, 0)
        return (b_i, h_i, nxt, 0)

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ikv, vl: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, d), dq_kv_index),
            pl.BlockSpec((1, 1, block_k, d), dq_kv_index),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, iq, ikv, vl: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, 8, block_q),
                         lambda b, h, iq, ikv, vl: (b, h, 0, iq)),
            pl.BlockSpec((1, 1, 8, block_q),
                         lambda b, h, iq, ikv, vl: (b, h, 0, iq)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, iq, ikv, vl: (b, h, iq, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(kv_valid_len, qt, kt, vt, dot, lse, delta)

    dkv_kernel = functools.partial(
        _dkv_kernel, causal=causal, sm_scale=scale, block_q=block_q,
        block_k=block_k, num_q_blocks=nq)

    def dkv_run(b_i, jk, iq, vl):
        run = jk * block_k < vl[b_i]
        if causal:
            run = jnp.logical_and(
                run, ((iq + 1) * block_q - 1) >= (jk * block_k))
        return run

    def dkv_q_index(b_i, h_i, jk, iq, vl):
        # q-major operands: redirect skipped steps' fetches to the first
        # q block this kv block will actually consume
        first = (jk * block_k) // block_q if causal else 0
        nxt = jax.lax.select(dkv_run(b_i, jk, iq, vl), iq, first)
        return (b_i, h_i, nxt, 0)

    def dkv_row_index(b_i, h_i, jk, iq, vl):
        first = (jk * block_k) // block_q if causal else 0
        nxt = jax.lax.select(dkv_run(b_i, jk, iq, vl), iq, first)
        return (b_i, h_i, 0, nxt)

    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, nkv, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), dkv_q_index),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, jk, iq, vl: (b, h, jk, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, jk, iq, vl: (b, h, jk, 0)),
            pl.BlockSpec((1, 1, block_q, d), dkv_q_index),
            pl.BlockSpec((1, 1, 8, block_q), dkv_row_index),
            pl.BlockSpec((1, 1, 8, block_q), dkv_row_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, jk, iq, vl: (b, h, jk, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, jk, iq, vl: (b, h, jk, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kt.shape, k.dtype),
            jax.ShapeDtypeStruct(vt.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(kv_valid_len, qt, kt, vt, dot, lse, delta)

    dq = dq.transpose(0, 2, 1, 3)[:, :sq]
    dk = dk.transpose(0, 2, 1, 3)[:, :skv]
    dv = dv.transpose(0, 2, 1, 3)[:, :skv]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public custom-vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_train(static, q, k, v, kv_valid_len):
    causal, scale, block_q, block_k, interpret, vmem = static
    out, _ = _forward_with_lse(q, k, v, kv_valid_len, causal, scale,
                               block_q, block_k, interpret, vmem)
    return out


def _flash_train_fwd(static, q, k, v, kv_valid_len):
    causal, scale, block_q, block_k, interpret, vmem = static
    out, lse = _forward_with_lse(q, k, v, kv_valid_len, causal, scale,
                                 block_q, block_k, interpret, vmem)
    return out, (q, k, v, out, lse, kv_valid_len)


def _flash_train_bwd(static, res, g):
    causal, scale, block_q, block_k, interpret, vmem = static
    q, k, v, out, lse, kv_valid_len = res
    dq, dk, dv = _backward(q, k, v, out, lse, g, kv_valid_len, causal, scale,
                           block_q, block_k, interpret, vmem)
    return dq, dk, dv, np.zeros(kv_valid_len.shape, jax.dtypes.float0)


_flash_train.defvjp(_flash_train_fwd, _flash_train_bwd)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k",
                              "interpret", "vmem_limit_bytes"))
def flash_attention_train(
    q: jax.Array,  # (B, S, H, D)
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    kv_valid_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,  # round-5 sweep at the flagship shape: 512/1024 =
                          # 31.9 ms fwd+bwd incl dispatch vs 34.7 at 512/512
                          # (tools_flashbwd_sweep.py)
    interpret: bool = False,
    vmem_limit_bytes: Optional[int] = None,
) -> jax.Array:
    """Differentiable flash attention with a tiled Pallas backward.

    Same contract as `pallas_flash_attention` (cross-attention allowed when
    causal=False; right-padded prefix masking via kv_valid_len)."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if causal and sq != skv:
        raise ValueError("causal flash attention requires equal q/kv lengths")
    scale = scale if scale is not None else d**-0.5
    # clamp blocks to the (128-rounded) sequence lengths like the inference
    # wrapper, so short sequences don't pad to full default blocks
    block_q = min(block_q, max(((sq + 127) // 128) * 128, 128))
    block_k = min(block_k, max(((skv + 127) // 128) * 128, 128))
    if kv_valid_len is None:
        kv_valid_len = jnp.full((b,), skv, jnp.int32)
    kv_valid_len = kv_valid_len.astype(jnp.int32)
    return _flash_train(
        (causal, scale, block_q, block_k, interpret, vmem_limit_bytes),
        q, k, v, kv_valid_len)
