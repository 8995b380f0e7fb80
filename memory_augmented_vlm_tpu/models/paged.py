"""Paged KV cache for the continuous-batching engine (vLLM-class block
tables, TPU-native static shapes).

The reference routes serving to an sglang runtime (llava/serve/
sglang_worker.py); modern serving runtimes back their KV memory with a
PAGED pool so concurrent long-context requests share physical HBM instead
of each reserving a worst-case contiguous region. This module is that
memory manager's device side, designed for XLA's static-shape world:

  - one physical page pool per layer axis: ``k``/``v`` of shape
    ``(L, P + 1, page_size, Hkv, Dh)``. Page ``P`` (the last) is the TRASH
    page — writes routed there are garbage by construction (inactive
    slots, right-pad rows), so every scatter keeps a static shape and no
    branch ever leaves the graph;
  - per-slot BLOCK TABLES ``(B, max_pages)`` of physical page ids (unused
    entries point at the trash page), where ``max_pages * page_size`` is
    the engine's ``max_len``. A slot's logical position ``p`` lives at
    ``(table[slot, p // page_size], p % page_size)``;
  - all placement policy (allocation, preemption, prefix sharing /
    copy-on-write) stays HOST-side in the engine: the device functions
    below only read the tables they are given.

Decode attention gathers a slot's pages back into a contiguous
``(B, max_len, Hkv, Dh)`` view per layer (one XLA gather feeding the
existing GQA decode einsums). That gather is an extra HBM copy of the
cache read — the correctness-first trade for page indirection; the
fused-kernel path (reading pages directly via a scalar-prefetched block
table, as the contiguous path's Pallas kernels do for flash) is the
follow-up optimization documented in PERFORMANCE.md.

No counterpart exists in the reference (its sglang dependency supplies
this); cited for the serving surface: llava/serve/sglang_worker.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.models.qwen2 import _norm, _proj, _qkv, _layer_mlp
from memory_augmented_vlm_tpu.ops.attention import (
    decode_attention,
    mha_attention,
    repeat_kv,
)
from memory_augmented_vlm_tpu.ops.rope import (
    apply_rope,
    compute_rope_freqs,
    rope_cos_sin,
)


class PagedKVCache(NamedTuple):
    """Page pool + block tables. ``k``/``v``: (L, P + 1, page_size, Hkv,
    Dh) with the last page reserved as the trash page; ``table``:
    (B, max_pages) int32 physical page ids (unused -> trash); ``length``:
    (B,) int32 valid logical positions per slot."""

    k: jax.Array
    v: jax.Array
    table: jax.Array
    length: jax.Array

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def trash(self) -> int:
        return self.k.shape[1] - 1

    @property
    def max_pages(self) -> int:
        return self.table.shape[1]

    @staticmethod
    def zeros(cfg: LMConfig, num_slots: int, max_len: int, *,
              page_size: int, num_pages: int,
              dtype=jnp.bfloat16) -> "PagedKVCache":
        if max_len % page_size:
            raise ValueError("max_len must be a multiple of page_size")
        max_pages = max_len // page_size
        shape = (cfg.num_hidden_layers, num_pages + 1, page_size,
                 cfg.num_key_value_heads, cfg.head_dim)
        return PagedKVCache(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            table=jnp.full((num_slots, max_pages), num_pages, jnp.int32),
            length=jnp.zeros((num_slots,), jnp.int32),
        )


def _gather_slot_kv(kc, vc, table_row):
    """One slot's logical (1, max_len, Hkv, Dh) K/V view from the layer
    pool: kc/vc (P+1, page_size, Hkv, Dh), table_row (max_pages,)."""
    mp = table_row.shape[0]
    ps, hkv, d = kc.shape[1:]
    k = jnp.take(kc, table_row, axis=0).reshape(1, mp * ps, hkv, d)
    v = jnp.take(vc, table_row, axis=0).reshape(1, mp * ps, hkv, d)
    return k, v


def prefill_into_pages(params, cfg: VLMConfig, embeds, valid_len, pages,
                       slot, pcache: PagedKVCache, *, rope_seq_len: int):
    """One-shot prefill of a request into its allocated pages.

    embeds: (1, Sp, H) right-padded to a page multiple; valid_len: (1,)
    int32; pages: (Sp / page_size,) int32 physical page ids for the
    prompt's logical pages IN ORDER (entries past the valid prompt may be
    the trash page — their rows are pad garbage). Writes the prompt K/V
    into the pool, installs the table row, and pins length[slot].
    Returns (first-token logits (V,), cache). ``rope_seq_len`` is the
    engine's max_len so the dynamic-NTK basis matches decode.
    """
    lm = params["language_model"]
    sp = embeds.shape[1]
    ps = pcache.page_size
    hidden, pre = qwen2.forward(
        lm, cfg.lm, embeds, jnp.arange(sp)[None],
        valid_len=valid_len, cache_max_len=rope_seq_len,
    )
    last = jnp.take_along_axis(hidden, (valid_len - 1)[:, None, None], axis=1)
    logits = qwen2.unembed(lm, cfg.lm, last)[0, 0]
    # (L, Sp, Hkv, Dh) -> (L, n_pages, ps, Hkv, Dh) page-major rows
    n = sp // ps
    rows_k = pre.k[:, 0, :sp].reshape(pre.k.shape[0], n, ps, *pre.k.shape[3:])
    rows_v = pre.v[:, 0, :sp].reshape(*rows_k.shape)
    kc = pcache.k.at[:, pages].set(rows_k.astype(pcache.k.dtype))
    vc = pcache.v.at[:, pages].set(rows_v.astype(pcache.v.dtype))
    table = pcache.table.at[slot].set(pcache.trash)
    table = jax.lax.dynamic_update_slice(
        table, pages[None], (slot, 0))
    length = pcache.length.at[slot].set(valid_len[0])
    return logits, PagedKVCache(k=kc, v=vc, table=table, length=length)


def chunk_into_pages(params, cfg: VLMConfig, emb_chunk, off, chunk_valid,
                     slot, pcache: PagedKVCache, *, rope_seq_len: int):
    """One chunk of a chunked/suffix prefill against the slot's PAGED
    prefix: C tokens at global offset ``off`` attend to logical rows
    [0, off) (gathered from the slot's pages) plus their own causal
    triangle, and their K/V scatter to (table[off+i] // ..) positions.
    The pages covering [off, off + C) must already be installed in the
    slot's table row (the engine allocates a whole admission's pages up
    front). Mirrors qwen2.forward_chunk's semantics for the contiguous
    cache — including length[slot] = off + chunk_valid on return.
    """
    if cfg.lm.position_embedding == "alibi":
        raise NotImplementedError("paged chunk prefill requires RoPE")
    lm = params["language_model"]
    b, c, _ = emb_chunk.shape
    ps = pcache.page_size
    max_len = pcache.max_pages * ps
    inv_freq = compute_rope_freqs(
        cfg.lm.head_dim, cfg.lm.rope_theta,
        scaling_type=cfg.lm.rope_scaling_type,
        scaling_factor=cfg.lm.rope_scaling_factor,
        max_position_embeddings=cfg.lm.max_position_embeddings,
        seq_len=rope_seq_len,
    )
    qpos = off + jnp.arange(c)
    cos, sin = rope_cos_sin(jnp.broadcast_to(qpos[None], (b, c)), inv_freq)
    mask = (jnp.arange(max_len)[None, :] <= qpos[:, None])[None, None]
    table_row = jax.lax.dynamic_index_in_dim(
        pcache.table, slot, 0, keepdims=False)          # (max_pages,)
    # physical scatter coordinates for the chunk's C rows (clamped gather:
    # qpos stays < max_len because the engine caps C at max_len - off)
    w_pages = jnp.take(table_row, qpos // ps)           # (C,)
    w_offs = qpos % ps
    lp_all = lm["layers"]

    def layer_body(l, carry):
        hidden, kc, vc = carry
        lp = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
            lp_all)
        residual = hidden
        x = _norm(hidden, lp["input_layernorm"], cfg.lm)
        q, k, v = _qkv(lp, cfg.lm, x)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kc = kc.at[l, w_pages, w_offs].set(k[0].astype(kc.dtype))
        vc = vc.at[l, w_pages, w_offs].set(v[0].astype(vc.dtype))
        layer_k, layer_v = _gather_slot_kv(
            jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False),
            table_row)
        kq = repeat_kv(layer_k.astype(hidden.dtype), cfg.lm.kv_groups)
        vq = repeat_kv(layer_v.astype(hidden.dtype), cfg.lm.kv_groups)
        attn = mha_attention(q, kq, vq, mask=mask)
        hidden = residual + _proj(lp["o_proj"], attn.reshape(b, c, -1))
        residual = hidden
        x = _norm(hidden, lp["post_attention_layernorm"], cfg.lm)
        hidden = residual + _layer_mlp(lp, x, cfg.lm.mlp_act, cfg.lm)
        return hidden, kc, vc

    hidden, kc, vc = jax.lax.fori_loop(
        0, cfg.lm.num_hidden_layers, layer_body,
        (emb_chunk, pcache.k, pcache.v))
    hidden = _norm(hidden, lm["norm"], cfg.lm)
    last = jax.lax.dynamic_index_in_dim(
        hidden[0], chunk_valid - 1, 0, keepdims=True)
    logits = qwen2.unembed(lm, cfg.lm, last[None])[0, 0]
    length = pcache.length.at[slot].set(
        jnp.asarray(off + chunk_valid, jnp.int32))
    return logits, PagedKVCache(k=kc, v=vc, table=pcache.table,
                                length=length)


def decode_step_paged(params, cfg: VLMConfig, logits, pcache: PagedKVCache,
                      active, temps, top_ps, rng, *, rope_seq_len: int):
    """One token for every slot against the paged pool (the paged
    counterpart of batch_engine._decode_step — same sampling semantics).
    Inactive slots' K/V writes route to the trash page, so a freed slot's
    pages can be reused by another request immediately with no scrub
    dispatch. Returns (tokens (B,), next logits (B, V), cache)."""
    lm = params["language_model"]
    b = logits.shape[0]
    ps = pcache.page_size
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    warped = logits / jnp.maximum(temps, 1e-4)[:, None]

    def nucleus(w):
        asc = jnp.sort(w, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(asc, axis=-1), axis=-1)
        keep = cum > (1.0 - top_ps)[:, None]
        keep = keep.at[:, -1].set(True)
        first_kept = jnp.argmax(keep, axis=-1)
        threshold = jnp.take_along_axis(asc, first_kept[:, None], axis=-1)
        return jnp.where((w < threshold) & (top_ps[:, None] < 1.0), -1e30, w)

    warped = jax.lax.cond(jnp.all(top_ps >= 1.0), lambda w: w, nucleus,
                          warped)
    sampled = jax.random.categorical(rng, warped, axis=-1).astype(jnp.int32)
    tok = jnp.where(temps > 0, sampled, greedy)
    tok = jnp.where(active, tok, 0)
    act_dtype = jnp.bfloat16 if cfg.lm.dtype == "bfloat16" else jnp.float32
    emb = qwen2.embed_tokens(lm, tok[:, None], cfg.lm).astype(act_dtype)

    pos = pcache.length                                  # (B,)
    inv_freq = compute_rope_freqs(
        cfg.lm.head_dim, cfg.lm.rope_theta,
        scaling_type=cfg.lm.rope_scaling_type,
        scaling_factor=cfg.lm.rope_scaling_factor,
        max_position_embeddings=cfg.lm.max_position_embeddings,
        seq_len=rope_seq_len,
    )
    cos, sin = rope_cos_sin(pos[:, None], inv_freq)
    # physical write coordinates: active slots are < max_len by the
    # engine's close invariant, so pos // ps never leaves the table
    w_pages = jnp.take_along_axis(pcache.table, (pos // ps)[:, None],
                                  axis=1)[:, 0]
    w_pages = jnp.where(active, w_pages, pcache.trash)
    w_offs = pos % ps
    batch_idx = jnp.arange(b)
    lp_all = lm["layers"]

    def layer_body(l, carry):
        hidden, kc, vc = carry
        lp = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
            lp_all)
        residual = hidden
        x = _norm(hidden, lp["input_layernorm"], cfg.lm)
        q, k, v = _qkv(lp, cfg.lm, x)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kc = kc.at[l, w_pages, w_offs].set(k[:, 0].astype(kc.dtype))
        vc = vc.at[l, w_pages, w_offs].set(v[:, 0].astype(vc.dtype))
        # gather every slot's pages into the contiguous decode view
        layer_k = jnp.take(
            jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False),
            pcache.table, axis=0)                        # (B, mp, ps, Hkv, D)
        layer_v = jnp.take(
            jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False),
            pcache.table, axis=0)
        mp = pcache.max_pages
        layer_k = layer_k.reshape(b, mp * ps, *layer_k.shape[3:])
        layer_v = layer_v.reshape(b, mp * ps, *layer_v.shape[3:])
        attn = decode_attention(q, layer_k.astype(act_dtype),
                                layer_v.astype(act_dtype), pos + 1,
                                kv_groups=cfg.lm.kv_groups)
        attn = attn.reshape(b, 1, -1)
        hidden = residual + _proj(lp["o_proj"], attn)
        residual = hidden
        x = _norm(hidden, lp["post_attention_layernorm"], cfg.lm)
        hidden = residual + _layer_mlp(lp, x, cfg.lm.mlp_act, cfg.lm)
        return hidden, kc, vc

    hidden, kc, vc = jax.lax.fori_loop(
        0, cfg.lm.num_hidden_layers, layer_body,
        (emb, pcache.k, pcache.v))
    hidden = _norm(hidden, lm["norm"], cfg.lm)
    new_logits = qwen2.unembed(lm, cfg.lm, hidden)[:, 0]
    cache = PagedKVCache(k=kc, v=vc, table=pcache.table,
                         length=jnp.where(active, pos + 1, pos))
    return tok, new_logits, cache


def decode_multi_step_paged(params, cfg: VLMConfig, logits,
                            pcache: PagedKVCache, active, temps, top_ps,
                            rng, *, steps: int, rope_seq_len: int):
    """`steps` dependent paged decode steps in one dispatch (multi-step
    scheduling). The engine pre-installs pages covering every active
    slot's next `steps` positions, so in-graph page-boundary crossings
    find their table entries already set. Returns (tokens (B, steps),
    final logits, cache)."""
    def body(carry, sub):
        lg, c = carry
        tok, lg, c = decode_step_paged(params, cfg, lg, c, active, temps,
                                       top_ps, sub,
                                       rope_seq_len=rope_seq_len)
        return (lg, c), tok
    (logits, pcache), toks = jax.lax.scan(
        body, (logits, pcache), jax.random.split(rng, steps))
    return toks.T, logits, pcache


def write_prefix_pages(prefix_k, prefix_v, pages, pcache: PagedKVCache):
    """Install a shared prefix's FULL pages into the pool: prefix_k/v
    (L, n_full * page_size, Hkv, Dh) page-aligned rows, pages (n_full,)
    physical ids. Table rows are per-request (the engine points each
    use_prefix admission's table at these shared, read-only pages)."""
    ps = pcache.page_size
    n = pages.shape[0]
    rows_k = prefix_k.reshape(prefix_k.shape[0], n, ps, *prefix_k.shape[2:])
    rows_v = prefix_v.reshape(*rows_k.shape)
    kc = pcache.k.at[:, pages].set(rows_k.astype(pcache.k.dtype))
    vc = pcache.v.at[:, pages].set(rows_v.astype(pcache.v.dtype))
    return pcache._replace(k=kc, v=vc)


def write_partial_page(rows_k, rows_v, page, pcache: PagedKVCache):
    """Copy-on-write install of a prefix's PARTIAL trailing page: rows_k/v
    (L, r, Hkv, Dh) with r < page_size, into rows [0, r) of physical page
    ``page`` (freshly allocated per use_prefix request — the suffix and
    decode rows of that request fill [r, page_size) privately)."""
    kc = jax.lax.dynamic_update_slice(
        pcache.k, rows_k[:, None].astype(pcache.k.dtype), (0, page, 0, 0, 0))
    vc = jax.lax.dynamic_update_slice(
        pcache.v, rows_v[:, None].astype(pcache.v.dtype), (0, page, 0, 0, 0))
    return pcache._replace(k=kc, v=vc)
