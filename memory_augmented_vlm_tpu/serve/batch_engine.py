"""Continuous-batching decode engine — the TPU-native counterpart of the
reference's SGLang worker (llava/serve/sglang_worker.py routes generation to
an sglang runtime whose core trick is continuous batching).

Design (all device state lives in jax arrays owned by the engine):
  - a fixed pool of B slots over one batched KV cache (L, B, Smax, Hkv, Dh);
  - `_prefill_into_slot`: run the (B=1) prefill for a new request and write
    its K/V into the slot via dynamic_update_slice — admission never stalls
    other slots' decoding beyond this one call;
  - `_decode_step`: ONE token for every active slot per call (per-row RoPE
    positions and cache lengths already make ragged batches exact — decode
    parity with the single-request path is pinned in tests);
  - per-slot greedy / temperature sampling, eos + max-token stopping; rows
    that finish are recycled for queued requests between steps.

The host-side `BatchEngine.submit` is thread-safe; a single engine thread
owns the device loop (serve/sglang_worker.py builds the worker protocol on
top of this).
"""

from __future__ import annotations

import functools
import math
import queue
import threading
from collections import deque
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import paged as paged_kv
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.utils.logging import build_logger

logger = build_logger("batch_engine")


def _prefill_into_slot(params, cfg: VLMConfig, embeds, valid_len, slot,
                       cache, *, max_len: int):
    """Prefill one request (embeds (1, Sp, H) right-padded) and write its
    K/V into `slot` of the batched cache. Returns (first logits row, cache).
    `cache_max_len=max_len` keeps the RoPE basis identical between
    this prefill and later decode steps (qwen2.forward's dynamic-NTK
    invariant: both must derive frequencies from the same cache bound).
    An int8 cache (kv_int8 serving mode) quantizes the prefill K/V per
    (position, head) row on write."""
    lm = params["language_model"]
    hidden, pre_cache = qwen2.forward(
        lm, cfg.lm, embeds, jnp.arange(embeds.shape[1])[None],
        valid_len=valid_len, cache_max_len=max_len,
    )
    last = jnp.take_along_axis(hidden, (valid_len - 1)[:, None, None], axis=1)
    logits = qwen2.unembed(lm, cfg.lm, last)[0, 0]          # (V,)
    # write the (L, 1, max_len, Hkv, Dh) prefill K/V into the slot
    k, v = pre_cache.k, pre_cache.v
    k_scale, v_scale = cache.k_scale, cache.v_scale
    if cache.k.dtype == jnp.int8:
        k, k_s = qwen2.quantize_kv_rows(k)
        v, v_s = qwen2.quantize_kv_rows(v)
        k_scale = jax.lax.dynamic_update_slice(k_scale, k_s, (0, slot, 0, 0))
        v_scale = jax.lax.dynamic_update_slice(v_scale, v_s, (0, slot, 0, 0))
    cache_k = jax.lax.dynamic_update_slice(
        cache.k, k.astype(cache.k.dtype), (0, slot, 0, 0, 0))
    cache_v = jax.lax.dynamic_update_slice(
        cache.v, v.astype(cache.v.dtype), (0, slot, 0, 0, 0))
    cache_len = cache.length.at[slot].set(valid_len[0])
    return logits, qwen2.KVCache(k=cache_k, v=cache_v, length=cache_len,
                                 k_scale=k_scale, v_scale=v_scale)


def _prefill_chunk_into_slot(params, cfg: VLMConfig, emb_chunk, off,
                             chunk_valid, slot, cache, *, max_len: int):
    """One chunk of a CHUNKED prefill: C tokens at global offset `off` for
    `slot`, attending to the slot's already-written cache prefix [0, off)
    plus causally within the chunk (qwen2.forward_chunk with row=slot).
    Keeps admission of long (video) prompts from stalling other slots'
    decoding for a whole-prompt prefill — the engine interleaves one decode
    step per chunk (vLLM-class chunked prefill; the reference's sglang
    runtime has no equivalent).

    emb_chunk: (1, C, H) right-padded; chunk_valid: scalar int32 valid rows
    (C for every chunk but the last). Only the LAST chunk may be partial —
    the prefix rows [0, off) must all be valid tokens. Returns
    (last-valid-row logits, cache with rows [off, off+C) written and
    length[slot] = off + chunk_valid).

    RoPE frequencies derive from the same `max_len` cache bound as the
    one-shot prefill and decode steps (dynamic-NTK invariant)."""
    lm = params["language_model"]
    hidden, cache = qwen2.forward_chunk(
        lm, cfg.lm, emb_chunk, cache, off, row=slot, rope_seq_len=max_len)
    last = jax.lax.dynamic_index_in_dim(
        hidden[0], chunk_valid - 1, 0, keepdims=True)
    logits = qwen2.unembed(lm, cfg.lm, last[None])[0, 0]
    length = cache.length.at[slot].set(off + chunk_valid)
    return logits, cache._replace(length=length)


def _spec_verify_step(params, cfg: VLMConfig, logits, drafts, cache, active,
                      *, max_len: int):
    """Batched speculative verification: one K-token forward for every
    active slot (qwen2.decode_chunk_batched with per-row starts). Row b's
    chunk is [argmax(logits_b), drafts_b...] — the chunk head comes from
    the IN-GRAPH argmax so the host never round-trips for it (one device
    sync per round, same as the plain tick; the old g0-fetch design paid
    two, which dominates dispatch-bound serving). The longest chunk prefix
    whose greedy predictions match is accepted. Inactive rows park their
    start at max_len so their writes drop. Returns (packed (B, 1 + K)
    int32 = [accepted draft count | chunk tokens] — one array so the host
    pays ONE fetch round-trip per round, next logits (B, V), cache with
    active lengths advanced by 1 + accepted)."""
    lm = params["language_model"]
    g0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    chunk_toks = jnp.concatenate([g0[:, None], drafts], axis=1)
    b, kk = chunk_toks.shape
    act_dtype = jnp.bfloat16 if cfg.lm.dtype == "bfloat16" else jnp.float32
    starts = jnp.where(active, cache.length, max_len)
    emb = qwen2.embed_tokens(lm, chunk_toks, cfg.lm).astype(act_dtype)
    hidden, cache = qwen2.decode_chunk_batched(
        lm, cfg.lm, emb, cache, starts, rope_seq_len=max_len)
    logits_all = qwen2.unembed(lm, cfg.lm, hidden)       # (B, K, V)
    preds = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)
    acc = jnp.cumprod((preds[:, :-1] == chunk_toks[:, 1:]).astype(jnp.int32),
                      axis=1)
    n_acc = jnp.sum(acc, axis=1)                         # (B,)
    next_logits = jnp.take_along_axis(
        logits_all, n_acc[:, None, None], axis=1)[:, 0]  # (B, V)
    length = jnp.where(active, cache.length + 1 + n_acc, cache.length)
    packed = jnp.concatenate([n_acc[:, None], chunk_toks], axis=1)
    return packed, next_logits, cache._replace(length=length)


def _decode_step(params, cfg: VLMConfig, logits, cache,
                 active, temps, top_ps, rng):
    """One token for every slot. Inactive slots decode garbage into their own
    row (cheap; the row is re-prefilled on reuse) but never affect others.
    temps/top_ps are per-row (ragged sampling params across the batch)."""
    lm = params["language_model"]
    b = logits.shape[0]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    warped = logits / jnp.maximum(temps, 1e-4)[:, None]

    def nucleus(w):
        # per-row top-p; the top token always survives (min_tokens_to_keep=1
        # — top_p ~ 0 must pick the argmax, not fall open to the full dist)
        asc = jnp.sort(w, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(asc, axis=-1), axis=-1)
        keep = cum > (1.0 - top_ps)[:, None]
        keep = keep.at[:, -1].set(True)
        first_kept = jnp.argmax(keep, axis=-1)
        threshold = jnp.take_along_axis(asc, first_kept[:, None], axis=-1)
        return jnp.where((w < threshold) & (top_ps[:, None] < 1.0), -1e30, w)

    # skip the full-vocab sort on the common all-greedy / top_p=1 path
    warped = jax.lax.cond(jnp.all(top_ps >= 1.0), lambda w: w, nucleus, warped)
    sampled = jax.random.categorical(rng, warped, axis=-1).astype(jnp.int32)
    tok = jnp.where(temps > 0, sampled, greedy)
    tok = jnp.where(active, tok, 0)
    act_dtype = jnp.bfloat16 if cfg.lm.dtype == "bfloat16" else jnp.float32
    emb = qwen2.embed_tokens(lm, tok[:, None], cfg.lm).astype(act_dtype)
    hidden, cache = qwen2.decode_step(lm, cfg.lm, emb, cache)
    new_logits = qwen2.unembed(lm, cfg.lm, hidden)[:, 0]
    return tok, new_logits, cache


def _decode_multi_step(params, cfg: VLMConfig, logits, cache, active,
                       temps, top_ps, rng, *, steps: int):
    """`steps` dependent decode steps in ONE dispatch (vLLM-class
    multi-step scheduling): through a dispatch-bound host loop (relay/RPC
    serving, ~tens of ms per round-trip) the engine pays one dispatch +
    one token fetch per K tokens instead of per token. Emission, eos and
    stop-sequence handling happen host-side after the single fetch;
    tokens decoded past a slot's close point are discarded there (same
    semantics as the speculative path's rejected tail — the garbage K/V
    rows beyond the emitted prefix are never read once the slot retires,
    and a reused slot re-prefills its row from position 0). Returns
    (tokens (B, steps), final logits, cache)."""
    def body(carry, sub):
        lg, c = carry
        tok, lg, c = _decode_step(params, cfg, lg, c, active, temps,
                                  top_ps, sub)
        return (lg, c), tok
    (logits, cache), toks = jax.lax.scan(
        body, (logits, cache), jax.random.split(rng, steps))
    return toks.T, logits, cache


def _lookup_draft(hist: list, n: int) -> Tuple[np.ndarray, bool]:
    """n proposal tokens for the positions AFTER the next (still
    device-side) greedy token, plus a hit flag. Keys on the corpus's last
    bigram (hist[-2], hist[-1]) — the HF prompt-lookup scheme — so the
    draft needs no host fetch of the pending argmax: if the last match of
    that bigram sits at j, the corpus predicts hist[j+2] for the pending
    token and hist[j+3:] for the draft positions; when the in-graph
    argmax disagrees with hist[j+2] the drafts simply all reject (any
    draft is correctness-neutral). hit=False means the lookup found
    nothing — the caller should take a plain one-token tick instead of
    paying the verify forward."""
    out = np.zeros((n,), np.int32)
    if len(hist) < 2:
        return out, False
    a, b = hist[-2], hist[-1]
    for j in range(len(hist) - 4, -1, -1):
        if hist[j] == a and hist[j + 1] == b:
            cont = hist[j + 3:j + 3 + n]  # non-empty: j <= len-4
            out[:len(cont)] = cont
            out[len(cont):] = cont[-1]
            return out, True
    return out, False


@dataclass
class _Request:
    embeds: np.ndarray            # (S, H) spliced sequence (suffix only
                                  # when use_prefix — the engine's shared
                                  # prefix KV is installed ahead of it)
    max_new_tokens: int
    eos_ids: Tuple[int, ...]
    temperature: float
    top_p: float = 1.0
    stop_sequences: Tuple[Tuple[int, ...], ...] = ()
    use_prefix: bool = False
    draft_ids: Tuple[int, ...] = ()   # prompt text ids seeding the
                                      # speculation lookup corpus
    out: "queue.Queue[Optional[np.ndarray]]" = field(
        default_factory=queue.Queue)
    slot: int = -1
    emitted: int = 0
    recent: list = field(default_factory=list)  # host-side stop-seq tail
    history: list = field(default_factory=list)  # lookup corpus
    generated: list = field(default_factory=list)  # emitted tokens — the
                                                   # recompute-preemption
                                                   # prompt extension
    seq: int = -1                     # admission order (preemption picks
                                      # the youngest victim first)

    def hits_stop(self, tok: int) -> bool:
        if not self.stop_sequences:
            return False
        self.recent.append(tok)
        lmax = max(len(s) for s in self.stop_sequences)
        del self.recent[:-lmax]
        return any(len(self.recent) >= len(s)
                   and tuple(self.recent[-len(s):]) == tuple(s)
                   for s in self.stop_sequences)


class BatchEngine:
    """Continuous-batching generation over a fixed slot pool."""

    def __init__(self, params, cfg: VLMConfig, *, num_slots: int = 4,
                 max_len: int = 2048, pad_to_multiple: int = 128,
                 kv_int8: bool = False, chunk_prefill: int = 0,
                 speculative: int = 0, decode_ticks: int = 1,
                 paged_page_size: int = 0,
                 paged_pages: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        self.max_len = max_len
        self.pad = pad_to_multiple
        self._dtype = jnp.bfloat16 if cfg.lm.dtype == "bfloat16" else jnp.float32
        # paged_page_size = ps > 0: the KV cache becomes a PAGED pool
        # (models/paged.py) — `paged_pages` physical pages of ps positions
        # each, shared across slots via block tables. Sizing the pool below
        # num_slots * max_len/ps OVERSUBSCRIBES it: admission blocks until
        # pages free, and a decode-time allocation failure preempts the
        # youngest slot (recompute-style: its prompt + generated tokens
        # re-prefill later — greedy outputs are unchanged; sampled requests
        # resample their remaining tokens). Shared prefixes (set_prefix)
        # install page-aligned rows ONCE and per-request tables alias them;
        # a partial trailing prefix page is copied per request (COW).
        self.paged = int(paged_page_size)
        if self.paged:
            if kv_int8:
                raise ValueError("paged + kv_int8 not supported yet")
            if speculative:
                raise ValueError("paged + speculative not supported yet")
            if max_len % self.paged:
                raise ValueError("max_len must be a multiple of the page size")
            self.max_pages = max_len // self.paged
            npages = (num_slots * self.max_pages if paged_pages is None
                      else int(paged_pages))
            if npages < self.max_pages:
                raise ValueError(
                    "page pool smaller than one slot's worst case "
                    f"({npages} < {self.max_pages}) — a lone request could "
                    "exhaust it with nothing left to preempt")
            self.num_pages = npages
            self._free: List[int] = list(range(npages))
            self._slot_pages: List[List[int]] = [[] for _ in range(num_slots)]
            # table entries installed per slot (shared prefix + private) —
            # position coverage is _slot_npages[s] * page_size
            self._slot_npages: List[int] = [0] * num_slots
            self._admit_seq = 0
            self._requeue: "deque[_Request]" = deque()
            self._prefix_req: Optional[list] = None  # [rows, Event, err]
            self._perm_pages = 0   # pages held forever by shared prefixes
            # (prefix_len, shared page ids, device rows for re-install on
            # failure reset: (L, full*ps, Hkv, D), partial (L, r, Hkv, D))
            self._prefix_pg: Optional[Tuple] = None
            self._cache = paged_kv.PagedKVCache.zeros(
                cfg.lm, num_slots, max_len, page_size=self.paged,
                num_pages=npages, dtype=self._dtype)
            # pool buffers are donated: every jit below consumes its cache
            # argument in place (the pool can dwarf a contiguous per-slot
            # cache's working set — a copy per tick would defeat paging)
            self._prefill_pg = jax.jit(
                functools.partial(paged_kv.prefill_into_pages,
                                  rope_seq_len=max_len),
                static_argnames=("cfg",), donate_argnums=(6,))
            self._chunk_pg = jax.jit(
                functools.partial(paged_kv.chunk_into_pages,
                                  rope_seq_len=max_len),
                static_argnames=("cfg",), donate_argnums=(6,))
            self._step_pg = jax.jit(
                functools.partial(paged_kv.decode_step_paged,
                                  rope_seq_len=max_len),
                static_argnames=("cfg",), donate_argnums=(3,))
            if decode_ticks > 1:
                self._multi_pg = jax.jit(
                    functools.partial(paged_kv.decode_multi_step_paged,
                                      steps=int(decode_ticks),
                                      rope_seq_len=max_len),
                    static_argnames=("cfg",), donate_argnums=(3,))
            self._cow = jax.jit(paged_kv.write_partial_page,
                                donate_argnums=(3,))
        else:
            # kv_int8 halves the slot-pool cache footprint + decode-read HBM
            # traffic (per-row symmetric int8, qwen2.quantize_kv_rows) — the
            # lever for more slots / longer contexts per chip
            cache_dtype = jnp.int8 if kv_int8 else self._dtype
            self._cache = qwen2.KVCache.zeros(cfg.lm, num_slots, max_len,
                                              cache_dtype)
        self._logits = jnp.zeros((num_slots, cfg.lm.vocab_size), jnp.float32)
        self._temps = jnp.zeros((num_slots,), jnp.float32)
        self._topps = jnp.ones((num_slots,), jnp.float32)
        self._rng = jax.random.key(0)
        self._prefill = jax.jit(
            functools.partial(_prefill_into_slot, max_len=max_len),
            static_argnames=("cfg",))
        self._step = jax.jit(_decode_step, static_argnames=("cfg",))
        # decode_ticks = K > 1: multi-step scheduling — K dependent decode
        # steps per dispatch (one host round-trip per K tokens; admissions
        # and chunk-prefill interleaving happen between multi-ticks, so
        # they wait at most K tokens instead of 1)
        self.decode_ticks = int(decode_ticks)
        if self.decode_ticks < 1:
            raise ValueError("decode_ticks must be >= 1")
        if self.decode_ticks > 1:
            self._multi = jax.jit(
                functools.partial(_decode_multi_step,
                                  steps=self.decode_ticks),
                static_argnames=("cfg",))
        # speculative = K > 1: greedy-only ticks verify K tokens per slot
        # per LM forward (prompt-lookup drafts from per-request histories);
        # ticks with any sampled or near-max_len slot fall back to the
        # plain one-token step
        self.speculative = int(speculative)
        if self.speculative:
            if self.speculative < 2:
                raise ValueError("speculative must be >= 2 tokens")
            self._verify = jax.jit(
                functools.partial(_spec_verify_step, max_len=max_len),
                static_argnames=("cfg",))
        # adaptive speculation: consecutive zero-acceptance rounds trigger
        # an exponentially growing cooldown of plain ticks (reset on any
        # acceptance) so incompressible streams degrade to ~plain cost
        self._spec_zero_rounds = 0
        self._spec_cooldown = 0
        # chunk_prefill > 0: prompts longer than the chunk prefill
        # incrementally (one chunk per tick) so admission of a long video
        # prompt never stalls active slots for a whole-prompt prefill
        self.chunk_prefill = int(chunk_prefill)
        # the chunk prefill also serves prefix-cached admissions (suffix
        # prefill at offset P against the installed prefix rows)
        self._chunk = jax.jit(
            functools.partial(_prefill_chunk_into_slot, max_len=max_len),
            static_argnames=("cfg",))
        # req, slot, next absolute offset, prompt base offset (prefix len)
        self._pending: Optional[Tuple[_Request, int, int, int]] = None
        # shared prompt-prefix KV (set_prefix): rows installed into a slot
        # before its suffix prefills — system prompts compute once, not per
        # request
        self._prefix: Optional[Tuple] = None
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._slots: List[Optional[_Request]] = [None] * num_slots
        # host mirror of cache.length per slot (set at activation, advanced
        # by each tick) — keeps the decode loop free of pre-dispatch device
        # fetches, which cost a full dispatch round-trip each
        self._len: List[int] = [0] * num_slots
        # forward/token counters (speculation telemetry; read-only for
        # callers — tokens/decode_forwards = mean accepted run length)
        self.stats = {"decode_forwards": 0, "spec_forwards": 0, "tokens": 0,
                      "preemptions": 0, "decode_rounds": 0}
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- public API ----------------------------------------------------------
    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def shutdown(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=30)

    def set_prefix(self, embeds: np.ndarray):
        """Compute and store a shared prompt-prefix KV (e.g. the system
        prompt): one B=1 prefill at positions 0..P-1 under the engine's
        RoPE cache bound; requests submitted with use_prefix=True install
        these rows and prefill only their suffix (vLLM-class prefix
        caching)."""
        emb = jnp.asarray(np.asarray(embeds), self._dtype)[None]
        p = emb.shape[1]
        if not 0 < p < self.max_len:
            raise ValueError(f"prefix length {p} out of range")
        _, pre = qwen2.forward(
            self.params["language_model"], self.cfg.lm, emb,
            jnp.arange(p)[None], cache_max_len=self.max_len)
        if self.paged:
            # install into shared pool pages — but the ENGINE thread owns
            # the (donated) pool buffers, so hand the rows over and wait:
            # a caller-thread pool write could race a tick's donation
            rows = (p, pre.k[:, 0, :p], pre.v[:, 0, :p])
            if self._thread is None or not self._thread.is_alive():
                self._apply_prefix_pg(rows)
            else:
                handoff = [rows, threading.Event(), None]
                self._prefix_req = handoff
                if not handoff[1].wait(timeout=300):
                    raise TimeoutError("engine thread did not install prefix")
                if handoff[2] is not None:
                    raise handoff[2]
            return
        # slice to the P prefix rows — forward pads its cache buffer to
        # max_len, and storing that would pin a full slot's worth of HBM
        k, v = pre.k[:, :, :p], pre.v[:, :, :p]   # (L, 1, P, Hkv, Dh)
        ks = vs = None
        if self._cache.k.dtype == jnp.int8:
            k, ks = qwen2.quantize_kv_rows(k)
            v, vs = qwen2.quantize_kv_rows(v)
        # one atomic (len, rows...) tuple: _admit snapshots it in a single
        # read, so a concurrent re-registration can't pair a new length
        # with old rows
        self._prefix = (p, jax.device_put(k.astype(self._cache.k.dtype)),
                        jax.device_put(v.astype(self._cache.v.dtype)),
                        None if ks is None else jax.device_put(ks),
                        None if vs is None else jax.device_put(vs))

    # -- paged-pool management (host-side policy; models/paged.py is the
    # -- device side) ---------------------------------------------------------
    def _alloc(self, n: int) -> Optional[List[int]]:
        """Pop n pages off the free list; None (nothing taken) if short."""
        if n <= 0:
            return []
        if len(self._free) < n:
            return None
        return [self._free.pop() for _ in range(n)]

    def _apply_prefix_pg(self, rows):
        """Engine-thread install of a shared prefix into pool pages.
        Page-aligned rows go into permanently-held shared pages (aliased by
        every use_prefix table row — never freed, including on
        re-registration: an older request may still be reading them); the
        partial trailing page's rows are kept device-side and copied into a
        fresh page per request (COW)."""
        p, k_rows, v_rows = rows
        ps = self.paged
        full, r = divmod(p, ps)
        if self.num_pages - (self._perm_pages + full) < self.max_pages:
            # a lone NON-prefix request must still be able to reach max_len
            # with prefixes permanently holding their pages (re-registered
            # prefixes keep their old pages too — live tables may alias them)
            raise ValueError(
                "prefix would leave the pool unable to serve one worst-case "
                "request — raise paged_pages to >= max_pages + prefix pages")
        pages = self._alloc(full)
        if pages is None:
            raise ValueError("page pool too small for the prefix")
        self._perm_pages += full
        k_full = k_rows[:, :full * ps].astype(self._cache.k.dtype)
        v_full = v_rows[:, :full * ps].astype(self._cache.v.dtype)
        k_part = v_part = None
        if full:
            self._cache = paged_kv.write_prefix_pages(
                k_full, v_full, jnp.asarray(pages, jnp.int32), self._cache)
        if r:
            k_part = jax.device_put(k_rows[:, full * ps:]
                                    .astype(self._cache.k.dtype))
            v_part = jax.device_put(v_rows[:, full * ps:]
                                    .astype(self._cache.v.dtype))
        # k_full/v_full stay referenced for the failure-reset re-install
        self._prefix_pg = (p, pages, k_full if full else None,
                           v_full if full else None, k_part, v_part)

    def _release_pages(self, slot: int):
        self._free.extend(self._slot_pages[slot])
        self._slot_pages[slot] = []
        self._slot_npages[slot] = 0

    def _preempt_one(self) -> Optional[int]:
        """Free pages by evicting work, youngest admission first (vLLM's
        recompute preemption): the victim's prompt grows by its generated
        tokens and goes to the FRONT of the queue — greedy outputs are
        bit-identical to an uninterrupted run (the re-prefill's last-row
        logits equal the logits the evicted decode would have produced);
        sampled requests resample their remaining tokens. Falls back to
        aborting the in-flight chunked admission when it is the only page
        holder. Returns the freed slot, or None if nothing holds pages."""
        victim = None
        for s, r in enumerate(self._slots):
            if r is None or (self._pending and r is self._pending[0]):
                continue
            if victim is None or r.seq > self._slots[victim].seq:
                victim = s
        if victim is None and self._pending is not None:
            req, slot, _off, _base = self._pending
            self._pending = None
            self._requeue.appendleft(req)
            self._slots[slot] = None
            req.slot = -1
            self._release_pages(slot)
            self.stats["preemptions"] += 1
            return slot
        if victim is None:
            return None
        req = self._slots[victim]
        if req.generated:
            lm = self.params["language_model"]
            gen = qwen2.embed_tokens(
                lm, jnp.asarray(req.generated, jnp.int32), self.cfg.lm)
            req.embeds = np.concatenate(
                [req.embeds, np.asarray(gen, req.embeds.dtype)])
            req.generated = []
        self._slots[victim] = None
        req.slot = -1
        self._requeue.appendleft(req)
        self._release_pages(victim)
        self.stats["preemptions"] += 1
        return victim

    def _install_pages(self, slot: int, pages: List[int]):
        """Append freshly allocated pages to a slot's table row."""
        tbl = self._cache.table
        base = self._slot_npages[slot]
        tbl = tbl.at[slot, base:base + len(pages)].set(
            jnp.asarray(pages, jnp.int32))
        self._cache = self._cache._replace(table=tbl)
        self._slot_pages[slot].extend(pages)
        self._slot_npages[slot] += len(pages)

    def _ensure_headroom_pg(self, k: int) -> None:
        """Guarantee every active slot's table covers its next k decode
        positions, preempting (youngest first — possibly the very slot
        being grown, which then simply goes back to the queue) when the
        free list runs dry."""
        for slot in range(self.num_slots):
            req = self._slots[slot]
            if req is None or (self._pending and req is self._pending[0]):
                continue
            while self._slots[slot] is req and req.slot == slot:
                need = min(-(-(self._len[slot] + k) // self.paged),
                           self.max_pages)
                short = need - self._slot_npages[slot]
                if short <= 0:
                    break
                pages = self._alloc(short)
                if pages is not None:
                    self._install_pages(slot, pages)
                    break
                if self._preempt_one() is None:
                    # unreachable given the pool-size invariant; fail loud
                    raise RuntimeError("page pool exhausted with nothing "
                                       "left to preempt")

    def submit(self, embeds: np.ndarray, *, max_new_tokens: int = 128,
               eos_token_ids: Tuple[int, ...] = (151645,),
               temperature: float = 0.0, top_p: float = 1.0,
               stop_sequences: Tuple[Tuple[int, ...], ...] = (),
               use_prefix: bool = False,
               draft_ids: Tuple[int, ...] = (),
               ) -> "queue.Queue[Optional[np.ndarray]]":
        """Enqueue a spliced sequence; returns a queue yielding np token
        chunks and a final None sentinel. top_p applies per row inside the
        batched sampler; stop_sequences match host-side per token.
        use_prefix=True: `embeds` is the SUFFIX after the shared prefix
        registered with set_prefix(). draft_ids: the prompt's text token
        ids — seeds the speculation lookup corpus when the engine runs
        with speculative=K."""
        req = _Request(np.asarray(embeds), max_new_tokens,
                       tuple(eos_token_ids), float(temperature),
                       float(top_p),
                       tuple(tuple(int(t) for t in s) for s in stop_sequences),
                       use_prefix=use_prefix,
                       draft_ids=tuple(int(t) for t in draft_ids))
        req.history = list(req.draft_ids)
        self._queue.put(req)
        return req.out

    def generate(self, embeds, **kw) -> np.ndarray:
        """Blocking convenience wrapper around submit()."""
        out = self.submit(embeds, **kw)
        toks: List[np.ndarray] = []
        while True:
            item = out.get()
            if item is None:
                break
            toks.append(item)
        return (np.concatenate(toks) if toks
                else np.zeros((0,), np.int32))

    # -- engine loop ----------------------------------------------------------
    def _admit_paged(self, req: _Request, slot: int) -> str:
        """Admission against the page pool. Allocates ALL of the prompt's
        pages up front (an in-flight chunked admission then never needs a
        mid-flight allocation); decode-time growth happens page-by-page in
        _ensure_headroom_pg. Returns "done" (slot active), "pending"
        (chunked/suffix prefill claimed the slot), "stall" (free list too
        short — retry after completions), or "rejected"."""
        prefix = self._prefix_pg if req.use_prefix else None
        base = prefix[0] if (req.use_prefix and prefix) else 0
        s = base + req.embeds.shape[0]
        if (req.embeds.ndim != 2 or req.embeds.shape[0] == 0
                or s >= self.max_len
                or (req.use_prefix and prefix is None)):
            req.out.put(None)
            return "rejected"
        if req.seq < 0:
            req.seq = self._admit_seq
            self._admit_seq += 1
        ps = self.paged
        total_pages = -(-s // ps)
        if req.use_prefix:
            full = prefix[0] // ps
            pages = self._alloc(total_pages - full)
            if pages is None:
                return "stall"
            row = np.full((self.max_pages,), self.num_pages, np.int32)
            row[:full] = prefix[1]
            row[full:total_pages] = pages
            self._cache = self._cache._replace(
                table=self._cache.table.at[slot].set(jnp.asarray(row)))
            self._slot_pages[slot] = pages
            self._slot_npages[slot] = total_pages
            if prefix[0] % ps:
                # COW: the partial trailing prefix page copies into this
                # request's first private page; its suffix rows fill the
                # remainder of that page
                self._cache = self._cow(prefix[4], prefix[5], pages[0],
                                        self._cache)
            req.slot = slot
            self._slots[slot] = req
            self._pending = (req, slot, base, base)
            return "pending"
        pages = self._alloc(total_pages)
        if pages is None:
            return "stall"
        if self.chunk_prefill and s > self.chunk_prefill:
            row = np.full((self.max_pages,), self.num_pages, np.int32)
            row[:total_pages] = pages
            self._cache = self._cache._replace(
                table=self._cache.table.at[slot].set(jnp.asarray(row)))
            self._slot_pages[slot] = pages
            self._slot_npages[slot] = total_pages
            req.slot = slot
            self._slots[slot] = req
            self._pending = (req, slot, 0, 0)
            return "pending"
        # one-shot: pad the prompt to a (bucket, page) multiple; pad pages
        # beyond the prompt's point at the trash page
        unit = math.lcm(self.pad, ps)
        sp = min(-(-s // unit) * unit, self.max_len)
        pages_arr = np.full((sp // ps,), self.num_pages, np.int32)
        pages_arr[:total_pages] = pages
        # claim the slot BEFORE the device call: if the dispatch throws, the
        # _loop reset fails this caller instead of stranding it
        self._slot_pages[slot] = pages
        self._slot_npages[slot] = total_pages
        req.slot = slot
        self._slots[slot] = req
        emb = jnp.pad(jnp.asarray(req.embeds, self._dtype),
                      ((0, sp - s), (0, 0)))[None]
        logits_row, self._cache = self._prefill_pg(
            self.params, self.cfg, emb, jnp.asarray([s], jnp.int32),
            jnp.asarray(pages_arr), slot, self._cache)
        self._logits = self._logits.at[slot].set(logits_row)
        self._temps = self._temps.at[slot].set(req.temperature)
        self._topps = self._topps.at[slot].set(req.top_p)
        self._len[slot] = s
        return "done"

    def _admit(self):
        if self._pending is not None:
            return  # finish the in-flight chunked admission first
        for slot in range(self.num_slots):
            if self._slots[slot] is not None:
                continue
            if self.paged and self._requeue:
                req = self._requeue.popleft()   # preempted work goes first
            else:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    return
            if self.paged:
                state = self._admit_paged(req, slot)
                if state == "stall":
                    # not enough free pages: keep FIFO order and retry next
                    # tick (completions / preemptions free pages)
                    self._requeue.appendleft(req)
                    return
                if state == "pending":
                    return
                continue   # "done" or "rejected": try the next free slot
            try:
                # snapshot the (len, rows) pair once — set_prefix may swap
                # it from the caller thread concurrently
                prefix = self._prefix if req.use_prefix else None
                base = prefix[0] if req.use_prefix and prefix else 0
                s = base + req.embeds.shape[0]
                if (req.embeds.ndim != 2 or req.embeds.shape[0] == 0
                        or s >= self.max_len
                        or (req.use_prefix and prefix is None)):
                    # reject malformed/empty/oversized prompts instead of
                    # killing the engine thread (callers block on the
                    # sentinel); s == max_len leaves no cache row for the
                    # first decode write (it would clamp onto the last
                    # prompt row), and an empty suffix has no row to take
                    # first-token logits from
                    req.out.put(None)
                    continue
                if req.use_prefix:
                    # install the shared prefix rows, then the suffix
                    # prefills as pending chunks starting at offset P
                    _, pk, pv, pks, pvs = prefix
                    c = self._cache
                    kc = jax.lax.dynamic_update_slice(
                        c.k, pk, (0, slot, 0, 0, 0))
                    vc = jax.lax.dynamic_update_slice(
                        c.v, pv, (0, slot, 0, 0, 0))
                    ksc, vsc = c.k_scale, c.v_scale
                    if pks is not None:
                        ksc = jax.lax.dynamic_update_slice(
                            ksc, pks, (0, slot, 0, 0))
                        vsc = jax.lax.dynamic_update_slice(
                            vsc, pvs, (0, slot, 0, 0))
                    self._cache = qwen2.KVCache(
                        k=kc, v=vc, length=c.length.at[slot].set(base),
                        k_scale=ksc, v_scale=vsc)
                    req.slot = slot
                    self._slots[slot] = req
                    self._pending = (req, slot, base, base)
                    return
                if self.chunk_prefill and s > self.chunk_prefill:
                    # claim the slot; chunks advance one per tick so the
                    # decode step for active slots interleaves with this
                    # prompt's prefill
                    req.slot = slot
                    self._slots[slot] = req
                    self._pending = (req, slot, 0, 0)
                    return
                sp = min(((s + self.pad - 1) // self.pad) * self.pad,
                         self.max_len)
                emb = jnp.pad(jnp.asarray(req.embeds, self._dtype),
                              ((0, sp - s), (0, 0)))[None]
                logits_row, self._cache = self._prefill(
                    self.params, self.cfg, emb, jnp.asarray([s], jnp.int32),
                    slot, self._cache)
            except Exception:  # noqa: BLE001 — release THIS caller, keep serving
                logger.exception("batch-engine admit failed; request dropped")
                req.out.put(None)
                continue
            self._logits = self._logits.at[slot].set(logits_row)
            self._temps = self._temps.at[slot].set(req.temperature)
            self._topps = self._topps.at[slot].set(req.top_p)
            req.slot = slot
            self._slots[slot] = req
            self._len[slot] = s

    def _loop(self):
        while not self._stop.is_set():
            try:
                self._tick()
            except Exception:  # noqa: BLE001 — never strand blocked callers
                logger.exception("batch-engine step failed; resetting slots")
                self._pending = None
                for slot, req in enumerate(self._slots):
                    if req is not None:
                        req.out.put(None)
                        self._slots[slot] = None
                if self.paged:
                    self._reset_paged()

    def _reset_paged(self):
        """Rebuild the page pool after an engine-loop failure: the failing
        dispatch may have consumed the donated pool buffers, so nothing
        device-side is trustworthy. Shared prefix rows re-install from
        their kept device copies into their original page ids."""
        for r in self._requeue:
            r.out.put(None)
        self._requeue.clear()
        self._slot_pages = [[] for _ in range(self.num_slots)]
        self._slot_npages = [0] * self.num_slots
        held = set(self._prefix_pg[1]) if self._prefix_pg else set()
        self._free = [p for p in range(self.num_pages) if p not in held]
        self._perm_pages = len(held)  # leaked re-registrations reclaim here
        self._cache = paged_kv.PagedKVCache.zeros(
            self.cfg.lm, self.num_slots, self.max_len,
            page_size=self.paged, num_pages=self.num_pages,
            dtype=self._dtype)
        if self._prefix_pg and self._prefix_pg[2] is not None:
            _p, pages, k_full, v_full, _kp, _vp = self._prefix_pg
            self._cache = paged_kv.write_prefix_pages(
                k_full, v_full, jnp.asarray(pages, jnp.int32), self._cache)

    def _advance_chunk(self):
        """Advance an in-flight chunked admission by ONE chunk. The slot's
        decode-garbage row (inactive slots still decode into their own row)
        lands exactly at the next chunk's first position, so each chunk
        write overwrites it; the chunk call re-pins length[slot]."""
        if self._pending is None:
            return
        req, slot, off, base = self._pending
        try:
            s = base + req.embeds.shape[0]
            # chunk size: the configured chunk, or (prefix-cached suffix
            # with chunking off) the whole suffix padded to the bucket —
            # always capped at max_len - off, or the final padded chunk's
            # dynamic_update_slice would CLAMP its start index and silently
            # shift the K/V write backwards over valid rows
            c = self.chunk_prefill or ((s - base + self.pad - 1)
                                       // self.pad) * self.pad
            c = min(c, self.max_len - off)
            chunk = req.embeds[off - base:off - base + c]
            cv = chunk.shape[0]
            emb = jnp.pad(jnp.asarray(chunk, self._dtype),
                          ((0, c - cv), (0, 0)))[None]
            logits_row, self._cache = (
                self._chunk_pg if self.paged else self._chunk)(
                self.params, self.cfg, emb, off, cv, slot, self._cache)
        except Exception:  # noqa: BLE001 — release THIS caller, keep serving
            logger.exception("batch-engine chunk prefill failed; dropped")
            req.out.put(None)
            self._slots[slot] = None
            self._pending = None
            if self.paged:
                self._release_pages(slot)
            return
        if off + cv >= s:
            # final chunk: activate the slot
            self._logits = self._logits.at[slot].set(logits_row)
            self._temps = self._temps.at[slot].set(req.temperature)
            self._topps = self._topps.at[slot].set(req.top_p)
            self._pending = None
            self._len[slot] = off + cv
        else:
            self._pending = (req, slot, off + cv, base)

    def _emit_token(self, slot, req, t: int, length: int) -> bool:
        """Emit one token to the caller; returns True when the slot
        closed. eos is emitted and counted, matching vlm.generate's
        GenerateResult (callers strip specials when decoding)."""
        done = t in req.eos_ids or req.hits_stop(t)
        req.out.put(np.asarray([t], np.int32))
        req.emitted += 1
        req.generated.append(t)
        self.stats["tokens"] += 1
        if done or req.emitted >= req.max_new_tokens or length >= self.max_len:
            req.out.put(None)
            self._slots[slot] = None
            if self.paged:
                # retired slot's table row still points at the freed pages,
                # but it is inactive from here (writes route to trash,
                # logits row unused) until a prefill reinstalls the row
                self._release_pages(slot)
            return True
        return False

    def _tick(self):
        if self.paged and self._prefix_req is not None:
            # engine-thread prefix install (the pool is donated each tick;
            # a caller-thread write would race the donation)
            handoff = self._prefix_req
            self._prefix_req = None
            try:
                self._apply_prefix_pg(handoff[0])
            except Exception as e:  # noqa: BLE001 — surface to set_prefix
                handoff[2] = e
            finally:
                handoff[1].set()
        self._admit()
        self._advance_chunk()
        pending_req = self._pending[0] if self._pending else None
        if all(r is None or r is pending_req for r in self._slots):
            if pending_req is None:
                self._stop.wait(0.01)  # idle: nothing admitted this round
            return
        actives = [r is not None and r is not pending_req
                   for r in self._slots]
        if self.speculative and self._can_speculate(actives):
            if self._spec_cooldown > 0:
                self._spec_cooldown -= 1
            elif self._spec_tick(actives):
                return
            # no lookup hit on any slot (or cooling down): plain tick
        want_multi = self._can_multi_tick(actives, pending_req)
        if self.paged:
            # grow tables before dispatch; preemption may shrink the active
            # set (never grow it), so re-derive it
            self._ensure_headroom_pg(self.decode_ticks if want_multi else 1)
            pending_req = self._pending[0] if self._pending else None
            actives = [r is not None and r is not pending_req
                       for r in self._slots]
            if not any(actives):
                return
            want_multi = want_multi and self._can_multi_tick(
                actives, pending_req)
        active = jnp.asarray(actives)
        self._rng, sub = jax.random.split(self._rng)
        if want_multi:
            k = self.decode_ticks
            self.stats["decode_forwards"] += k
            self.stats["decode_rounds"] += 1
            toks, self._logits, self._cache = (
                self._multi_pg if self.paged else self._multi)(
                self.params, self.cfg, self._logits, self._cache,
                active, self._temps, self._topps, sub)
            toks = np.asarray(toks)  # (B, K) — single fetch per K tokens
            for slot, req in enumerate(self._slots):
                if req is None or req is pending_req:
                    continue
                for t in toks[slot].tolist():
                    req.history.append(int(t))
                    self._len[slot] += 1
                    if self._emit_token(slot, req, int(t), self._len[slot]):
                        break  # tokens past the close point are discarded
            return
        self.stats["decode_forwards"] += 1
        self.stats["decode_rounds"] += 1
        tok, self._logits, self._cache = (
            self._step_pg if self.paged else self._step)(
            self.params, self.cfg, self._logits, self._cache,
            active, self._temps, self._topps, sub)
        toks = np.asarray(tok)
        for slot, req in enumerate(self._slots):
            if req is None or req is pending_req:
                continue
            t = int(toks[slot])
            req.history.append(t)
            self._len[slot] += 1
            self._emit_token(slot, req, t, self._len[slot])

    def _can_multi_tick(self, actives, pending_req) -> bool:
        """Multi-step ticks need K rows of cache headroom on every active
        slot (boundary writes would drop) and must not starve an in-flight
        chunked admission (its chunks advance once per tick)."""
        if self.decode_ticks < 2 or pending_req is not None:
            return False
        for slot, req in enumerate(self._slots):
            if not actives[slot]:
                continue
            if self._len[slot] + self.decode_ticks > self.max_len:
                return False
        return True

    def _can_speculate(self, actives) -> bool:
        """Speculative ticks are greedy-only and need K rows of cache
        headroom per active slot (near-boundary writes would drop and
        leave accepted tokens without their K/V). Uses the host length
        mirror — no device fetch."""
        for slot, req in enumerate(self._slots):
            if not actives[slot]:
                continue
            if req.temperature > 0:
                return False
            if self._len[slot] + self.speculative > self.max_len:
                return False
        return True

    def _spec_tick(self, actives) -> bool:
        """One speculative round: K tokens verified per active slot in a
        single batched forward; per-slot prompt-lookup drafts built from
        history alone (no device fetch before dispatch). Returns False —
        take a plain tick — when no slot has a lookup hit."""
        k = self.speculative
        drafts = np.zeros((self.num_slots, k - 1), np.int32)
        any_hit = False
        for slot, req in enumerate(self._slots):
            if actives[slot]:
                drafts[slot], hit = _lookup_draft(req.history, k - 1)
                any_hit = any_hit or hit
        if not any_hit:
            return False
        self.stats["decode_forwards"] += 1
        self.stats["spec_forwards"] += 1
        self.stats["decode_rounds"] += 1
        packed, self._logits, self._cache = self._verify(
            self.params, self.cfg, self._logits, jnp.asarray(drafts),
            self._cache, jnp.asarray(actives))
        packed = np.asarray(packed)  # single fetch: [n_acc | chunk tokens]
        n_acc, chunks = packed[:, 0], packed[:, 1:]
        total_accepted = 0
        for slot, req in enumerate(self._slots):
            if not actives[slot]:
                continue
            emitted = 1 + int(n_acc[slot])
            total_accepted += int(n_acc[slot])
            base_len = self._len[slot]
            self._len[slot] += emitted
            for i, t in enumerate(chunks[slot][:emitted].tolist()):
                req.history.append(int(t))
                # per-token length (base + i + 1) keeps the max_len close
                # point identical to the one-token-per-tick path
                if self._emit_token(slot, req, int(t), base_len + i + 1):
                    break
        if total_accepted == 0:
            self._spec_zero_rounds += 1
            if self._spec_zero_rounds >= 2:
                self._spec_cooldown = min(32, 2 ** (self._spec_zero_rounds - 1))
        else:
            self._spec_zero_rounds = 0
        return True
