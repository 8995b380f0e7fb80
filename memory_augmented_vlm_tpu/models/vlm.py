"""Full multimodal model assembly — the TPU rebuild of the reference's
`prepare_inputs_labels_for_multimodal` spine + `generate`
(llava/model/llava_arch.py:388-878, llava/model/language_model/llava_qwen.py).

Pipeline for the flagship video path (SURVEY.md §3.1):

  host: decode/sample frames -> `sample_video_frames` (reproduces
        llava_arch.py:437-457: F<32 keeps all, else (F//32)*32 with min 64,
        truncating linspace) and `fine_frame_indices`
        (llava_arch.py:520-522: rounding linspace, clamped)
  device (all jit, static shapes keyed on (frame bucket, nseg, nfine)):
        SigLIP tower -> mlp2x_gelu projector (stop_gradient == .detach(),
        llava_arch.py:302) -> 2x2 bilinear pool -> temporal PE ->
        recurrent memory scan -> memory fuser -> token-type embeds ->
        one_token flatten + image_newline -> prompt splice ->
        Qwen2 prefill -> greedy/sampled decode with KV cache.

Token accounting matches the reference exactly: 10 memory-prompt + nseg*8*196
memory + 1 newline + 9 frame-prompt + nfine*196 fine + 1 newline visual
tokens (BASELINE.md invariant).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import encoders as encoders_mod
from memory_augmented_vlm_tpu.models import memory as memory_mod
from memory_augmented_vlm_tpu.models import projector as projector_mod
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.models import sampling
from memory_augmented_vlm_tpu.models.position_encoding import add_temporal_pe
from memory_augmented_vlm_tpu.models.position_encoding import init_params as pe_init
from memory_augmented_vlm_tpu.ops import preprocess as preprocess_ops
from memory_augmented_vlm_tpu.ops.pooling import spatial_pool_2x2


# ---------------------------------------------------------------------------
# Host-side frame sampling (exact reference arithmetic)
# ---------------------------------------------------------------------------

def sample_video_frames(num_frames: int) -> np.ndarray:
    """Frame re-sampling at fusion time (llava_arch.py:437-457).

    <32 frames: keep all. Otherwise (F//32)*32, floored at 64; indices are
    `torch.linspace(0, F-1, n).long()` — i.e. truncation, not rounding.
    """
    if num_frames < 32:
        return np.arange(num_frames, dtype=np.int64)
    n = (num_frames // 32) * 32
    if n < 64:
        n = 64
    return np.linspace(0, num_frames - 1, n).astype(np.int64)  # trunc like .long()


def fine_frame_indices(num_frames: int, num_samples: int = 32) -> np.ndarray:
    """Fine-grained frame sampling (llava_arch.py:520-522): rounding linspace,
    clamped. num_frames here is the *sampled* frame count."""
    n = min(num_samples, num_frames)
    idx = np.round(np.linspace(0, num_frames - 1, n))
    return np.clip(idx, 0, num_frames - 1).astype(np.int64)


def pad_frames_to_segment_multiple(f: int, segment: int = 32) -> int:
    return ((f + segment - 1) // segment) * segment


# ---------------------------------------------------------------------------
# Parameter assembly
# ---------------------------------------------------------------------------

def init_params(cfg: VLMConfig, key: jax.Array, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    h = cfg.lm.hidden_size
    embed_std = 1.0 / np.sqrt(h)
    tower = encoders_mod.tower_for(cfg)
    return {
        "vision_tower": tower.init_params(ks[0], dtype),
        "mm_projector": projector_mod.init_params(
            cfg.pipeline.mm_projector_type, tower.hidden_size, h, ks[1], dtype
        ),
        "language_model": qwen2.init_params(cfg.lm, ks[2], dtype),
        "memory": {
            "recurrent_memory_transformer": memory_mod.init_params(cfg.memory, ks[3], dtype),
            "memory_fuser": {
                "fc1": {"kernel": (jax.random.normal(ks[4], (h, 4 * h)) * 0.02).astype(dtype),
                        "bias": jnp.zeros((4 * h,), dtype)},
                "fc2": {"kernel": (jax.random.normal(ks[5], (4 * h, h)) * 0.02).astype(dtype),
                        "bias": jnp.zeros((h,), dtype)},
            },
            "token_type_embedding": (jax.random.normal(ks[6], (2, h)) * 0.02).astype(dtype),
            "image_newline": (jax.random.normal(ks[7], (h,)) * embed_std).astype(dtype),
        },
        "positional_encoding": pe_init(
            cfg.memory.max_temporal_frames, h, cfg.memory.learnable_pe,
            key=jax.random.fold_in(ks[6], 1), dtype=dtype,
        ),
    }


# ---------------------------------------------------------------------------
# Device-side encode path
# ---------------------------------------------------------------------------

def encode_frames(params, cfg: VLMConfig, pixels: jax.Array) -> jax.Array:
    """(F, 384, 384, 3) pixels -> (F, 196, H) pooled projected features.

    Tower + projector outputs are stop_gradient'ed: the reference detaches
    vision features even during training (llava_arch.py:302).
    """
    tower = encoders_mod.tower_for(cfg)
    feats = tower.forward(params["vision_tower"], pixels)
    feats = projector_mod.forward(
        params["mm_projector"], cfg.pipeline.mm_projector_type, feats
    )
    feats = jax.lax.stop_gradient(feats)
    if tower.num_patches_per_side == 1:
        return feats  # global-embedding towers (imagebind) — nothing to pool
    return spatial_pool_2x2(
        feats,
        tower.num_patches_per_side,
        mode=cfg.pipeline.mm_spatial_pool_mode,
        stride=cfg.pipeline.mm_spatial_pool_stride,
    )


def build_video_embeds(
    params,
    cfg: VLMConfig,
    feats: jax.Array,          # (Fmax, 196, H) pooled features, padded
    frame_indices: jax.Array,  # (Fmax,) original indices for temporal PE
    frame_valid: jax.Array,    # (Fmax,) bool
    fine_idx: jax.Array,       # (nfine,) indices into the Fmax axis
    nseg: int,                 # static: number of valid segments (<= cache cap)
    *,
    drop_fine_frames: bool = False,
) -> jax.Array:
    """Memory + fine-frame visual stream with prompts, newline, type embeds.

    Returns (Lvis, H) with
    Lvis = 10 + nseg*8*196 + 1 [+ 9 + nfine*196 + 1 unless drop_fine_frames].
    """
    mcfg = cfg.memory
    feats = add_temporal_pe(params["positional_encoding"], feats, frame_indices)

    # recurrent memory over segments
    state = memory_mod.run_video(
        params["memory"]["recurrent_memory_transformer"], mcfg, feats, frame_valid
    )
    fused, _ = memory_mod.fuse_memory_bank(params["memory"]["memory_fuser"], state)
    # static slice: the first nseg cache entries are exactly the valid ones
    # (cache overflow only beyond cap segments; callers clamp nseg <= cap)
    mem_tokens = fused[: nseg * mcfg.num_memory_tokens]  # (nseg*8, 196, H)

    tte = params["memory"]["token_type_embedding"]
    mem_tokens = mem_tokens + tte[0][None, None, :]
    h = mem_tokens.shape[-1]
    newline = params["memory"]["image_newline"][None, :].astype(mem_tokens.dtype)

    lm = params["language_model"]
    mem_prompt = qwen2.embed_tokens(lm, jnp.asarray(constants.MEMORY_PROMPT_IDS), cfg.lm).astype(mem_tokens.dtype)

    mem_stream = jnp.concatenate(
        [mem_prompt, _merge_frames(cfg, mem_tokens, newline)], axis=0
    )
    if drop_fine_frames:
        return mem_stream

    fine = jnp.take(feats, fine_idx, axis=0)  # (nfine, 196, H)
    fine = fine + tte[1][None, None, :]
    frame_prompt = qwen2.embed_tokens(lm, jnp.asarray(constants.FRAME_PROMPT_IDS), cfg.lm).astype(mem_tokens.dtype)
    fine_stream = jnp.concatenate(
        [frame_prompt, _merge_frames(cfg, fine, newline)], axis=0)
    return jnp.concatenate([mem_stream, fine_stream], axis=0)


def add_token_per_frame(feature: jax.Array, newline: jax.Array) -> jax.Array:
    """`mm_newline_position="frame"`: append image_newline after every frame
    (llava_arch.py:353-357) -> (N*(P+1), H)."""
    n, p, h = feature.shape
    nl = jnp.broadcast_to(newline.reshape(1, 1, h), (n, 1, h)).astype(feature.dtype)
    return jnp.concatenate([feature, nl], axis=1).reshape(-1, h)


def add_token_per_grid(feature: jax.Array, newline: jax.Array) -> jax.Array:
    """`mm_newline_position="grid"`: append image_newline after every grid
    row of every frame (llava_arch.py:330-351) -> (N*side*(side+1), H)."""
    n, p, h = feature.shape
    side = int(round(p**0.5))
    grid = feature.reshape(n, side, side, h)
    nl = jnp.broadcast_to(newline.reshape(1, 1, 1, h), (n, side, 1, h)).astype(feature.dtype)
    return jnp.concatenate([grid, nl], axis=2).reshape(-1, h)


def _merge_frames(cfg: VLMConfig, feature: jax.Array, newline: jax.Array) -> jax.Array:
    """Apply the configured mm_newline_position merge to a (N, P, H) stream
    (llava_arch.py:583-634 video branch)."""
    pos = cfg.pipeline.mm_newline_position
    h = feature.shape[-1]
    if pos == "one_token":
        flat = feature.reshape(-1, h)
        if "unpad" in cfg.pipeline.mm_patch_merge_type:
            flat = jnp.concatenate([flat, newline.reshape(1, h)], axis=0)
        return flat
    if pos == "frame":
        return add_token_per_frame(feature, newline)
    if pos == "grid":
        return add_token_per_grid(feature, newline)
    if pos == "no_token":
        return feature.reshape(-1, h)
    raise ValueError(f"Unexpected mm_newline_position: {pos}")


def splice_image_embeds(
    params,
    text_ids_before: jax.Array,
    visual: jax.Array,
    text_ids_after: jax.Array,
    lm_cfg=None,
) -> jax.Array:
    """Replace the single <image> sentinel with visual embeddings
    (llava_arch.py:766-815, batch of 1)."""
    lm = params["language_model"]
    before = qwen2.embed_tokens(lm, text_ids_before, lm_cfg).astype(visual.dtype)
    after = qwen2.embed_tokens(lm, text_ids_after, lm_cfg).astype(visual.dtype)
    return jnp.concatenate([before, visual, after], axis=0)


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------

class GenerateResult(NamedTuple):
    tokens: jax.Array      # (max_new,) or (B, max_new) int32, 0-padded after stop
    num_tokens: jax.Array  # () or (B,) int32 — includes any stop keyword tokens


def _prefill_and_decode(
    params, cfg: VLMConfig, embeds: jax.Array, valid_len: jax.Array,
    eos_ids: jax.Array, stop_seqs: jax.Array, stop_lens: jax.Array,
    rng: jax.Array,
    *, max_new_tokens: int, temperature: float, top_p: float, top_k: int,
    repetition_penalty: float, do_sample: bool,
):
    """jit-compiled core: embeds (B, Smax, H) right-padded per row.

    Matches the reference's HF-generate path (llava_qwen.py:116-136 ->
    GenerationMixin.sample/greedy + KeywordsStoppingCriteria,
    llava/mm_utils.py:372): repetition penalty over generated ids,
    temperature/top-k/top-p warping, per-row eos and keyword stopping.
    Right-pad + per-row valid_len is the functional equivalent of HF's
    left-padding (RoPE positions and last-valid-logit selection are per row).
    """
    lm = params["language_model"]
    b, smax = embeds.shape[0], embeds.shape[1]
    positions = jnp.arange(smax)[None]
    hidden, cache = qwen2.forward(
        lm, cfg.lm, embeds, positions, valid_len=valid_len,
        cache_max_len=smax + max_new_tokens,
    )
    # logits at the last *valid* position per row
    last = jnp.take_along_axis(hidden, (valid_len - 1)[:, None, None], axis=1)
    logits = qwen2.unembed(lm, cfg.lm, last)[:, 0]  # (B, V)

    sampled = do_sample and temperature > 0.0
    track_presence = repetition_penalty != 1.0
    body = _decode_body(
        lm, cfg, eos_ids, stop_seqs, stop_lens, embeds.dtype, b,
        temperature=temperature, top_p=top_p, top_k=top_k,
        repetition_penalty=repetition_penalty, sampled=sampled)

    def cond(state):
        return jnp.logical_and(state["step"] < max_new_tokens,
                               jnp.logical_not(jnp.all(state["done"])))

    state = _decode_state0(cfg, b, max_new_tokens, stop_seqs, logits, cache,
                           rng, track_presence)
    final = jax.lax.while_loop(cond, body, state)
    num = jnp.where(final["done"], final["num"], max_new_tokens)
    return final["tokens"], num


def _decode_state0(cfg: VLMConfig, b: int, tokens_width: int, stop_seqs,
                   logits, cache, rng, track_presence: bool) -> dict:
    lstop = max(int(stop_seqs.shape[1]), 1)
    state = dict(
        step=jnp.asarray(0), done=jnp.zeros((b,), bool),
        num=jnp.zeros((b,), jnp.int32), logits=logits, cache=cache,
        tokens=jnp.zeros((b, tokens_width), jnp.int32),
        recent=jnp.full((b, lstop), -1, jnp.int32), key=rng,
    )
    if track_presence:
        state["presence"] = jnp.zeros((b, cfg.lm.vocab_size), bool)
    return state


def _decode_body(lm, cfg: VLMConfig, eos_ids, stop_seqs, stop_lens,
                 embeds_dtype, b: int, *, temperature: float, top_p: float,
                 top_k: int, repetition_penalty: float, sampled: bool):
    """One decode transition on the state dict (shared by the jitted
    while_loop core and the chunked streaming scan). `tokens` is written at
    `step % width`, so a chunk-sized ring works the same as the full buffer."""
    track_presence = repetition_penalty != 1.0

    def pick(logits, presence, key):
        warped = sampling.process_logits(
            logits, presence,
            temperature=temperature if sampled else 1.0,
            top_k=top_k if sampled else 0,
            top_p=top_p if sampled else 1.0,
            repetition_penalty=repetition_penalty,
        )
        if sampled:
            return jax.random.categorical(key, warped, axis=-1).astype(jnp.int32)
        return jnp.argmax(warped, axis=-1).astype(jnp.int32)

    def body(state):
        step, done = state["step"], state["done"]
        key, sub = jax.random.split(state["key"])
        tok = pick(state["logits"], state.get("presence"), sub)  # (B,)
        # rows already done keep emitting pad(0) without extending anything
        tok = jnp.where(done, 0, tok)
        width = state["tokens"].shape[1]
        tokens = state["tokens"].at[:, step % width].set(tok)
        recent = jnp.concatenate(
            [state["recent"][:, 1:], tok[:, None]], axis=1)
        hit_eos = jnp.any(tok[:, None] == eos_ids[None, :], axis=-1)
        hit_kw = sampling.stop_sequence_hit(recent, stop_seqs, stop_lens,
                                            state["num"] + 1)
        newly_done = ~done & (hit_eos | hit_kw)
        num = jnp.where(done, state["num"], state["num"] + 1)
        done = done | newly_done
        emb = qwen2.embed_tokens(lm, tok[:, None], cfg.lm).astype(embeds_dtype)
        hidden, cache = qwen2.decode_step(lm, cfg.lm, emb, state["cache"])
        logits = qwen2.unembed(lm, cfg.lm, hidden)[:, 0]
        out = dict(step=step + 1, done=done, num=num, logits=logits,
                   cache=cache, tokens=tokens, recent=recent, key=key)
        if track_presence:
            out["presence"] = state["presence"].at[jnp.arange(b), tok].set(True)
        return out

    return body


@functools.lru_cache(maxsize=32)
def _jit_generate(cfg: VLMConfig, max_new_tokens: int, temperature: float,
                  top_p: float, top_k: int, repetition_penalty: float,
                  do_sample: bool):
    return jax.jit(
        functools.partial(
            _prefill_and_decode, max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p, top_k=top_k,
            repetition_penalty=repetition_penalty, do_sample=do_sample),
        static_argnames=("cfg",),
    )


def generate_batched(
    params,
    cfg: VLMConfig,
    inputs_embeds: jax.Array,      # (B, Smax, H) right-padded
    valid_len: jax.Array,          # (B,) int32
    *,
    max_new_tokens: int = 128,
    eos_token_ids: Tuple[int, ...] = (151645,),  # <|im_end|>
    do_sample: bool = False,
    temperature: float = 0.0,
    top_p: float = 1.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    stop_sequences: Tuple[Tuple[int, ...], ...] = (),
    rng: Optional[jax.Array] = None,
) -> GenerateResult:
    """Batched HF-semantics decode over right-padded spliced sequences."""
    eos = jnp.asarray(eos_token_ids, jnp.int32)
    seqs, lens = sampling.pack_stop_sequences(stop_sequences)
    rng = rng if rng is not None else jax.random.key(0)
    fn = _jit_generate(cfg, max_new_tokens, float(temperature), float(top_p),
                       int(top_k), float(repetition_penalty), bool(do_sample))
    tokens, n = fn(params, cfg, inputs_embeds, valid_len, eos_ids=eos,
                   stop_seqs=jnp.asarray(seqs), stop_lens=jnp.asarray(lens),
                   rng=rng)
    return GenerateResult(tokens=tokens, num_tokens=n)


def generate(
    params,
    cfg: VLMConfig,
    inputs_embeds: jax.Array,      # (S, H) spliced sequence (single sample)
    *,
    max_new_tokens: int = 128,
    eos_token_ids: Tuple[int, ...] = (151645,),  # <|im_end|>
    do_sample: bool = False,
    temperature: float = 0.0,
    top_p: float = 1.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    stop_sequences: Tuple[Tuple[int, ...], ...] = (),
    pad_to_multiple: int = 128,
    rng: Optional[jax.Array] = None,
) -> GenerateResult:
    """Greedy / sampled decode for a single spliced sequence."""
    # pre-sampling-knobs callers passed temperature>0 to mean "sample"
    if temperature > 0.0:
        do_sample = True
    s = inputs_embeds.shape[0]
    smax = ((s + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    embeds = jnp.pad(inputs_embeds, ((0, smax - s), (0, 0)))[None]
    out = generate_batched(
        params, cfg, embeds, jnp.asarray([s], jnp.int32),
        max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
        do_sample=do_sample, temperature=temperature, top_p=top_p,
        top_k=top_k, repetition_penalty=repetition_penalty,
        stop_sequences=stop_sequences, rng=rng,
    )
    return GenerateResult(tokens=out.tokens[0], num_tokens=out.num_tokens[0])


# ---------------------------------------------------------------------------
# Prompt-lookup speculative decoding (greedy; decode is HBM-bound, so
# verifying K tokens per forward amortizes the per-step weight read)
# ---------------------------------------------------------------------------

def _spec_decode(params, cfg: VLMConfig, embeds, valid_len, eos_ids,
                 hist, hist_n, *, max_new_tokens: int, spec_k: int):
    """jit core of generate_speculative. `hist` is the lookup corpus
    (prompt text ids, then emitted tokens, 0-padded to a static cap).

    Per iteration: the next greedy token g0 is certain (argmax of carried
    logits); a bigram prompt-lookup proposes spec_k-1 continuation tokens
    after it; one qwen2.forward_chunk verifies all spec_k positions, and
    the longest prefix whose greedy predictions match the proposal is
    emitted. Draft quality affects ONLY speed — output equals plain greedy
    by construction. Rejected rows' cache entries are garbage that the
    next chunk (written at the rolled-back offset) overwrites."""
    lm = params["language_model"]
    b, smax = embeds.shape[0], embeds.shape[1]
    # prefill with PLAIN generate's cache bound so the dynamic-NTK RoPE
    # basis matches exactly (the exactness contract), then widen the cache
    # buffers by spec_k rows for the speculation window's garbage writes —
    # forward_chunk gets the same basis via rope_seq_len
    rope_bound = smax + max_new_tokens
    hidden, cache = qwen2.forward(
        lm, cfg.lm, embeds, jnp.arange(smax)[None], valid_len=valid_len,
        cache_max_len=rope_bound,
    )
    pad_rows = [(0, 0), (0, 0), (0, spec_k), (0, 0)]
    cache = cache._replace(
        k=jnp.pad(cache.k, pad_rows + [(0, 0)]),
        v=jnp.pad(cache.v, pad_rows + [(0, 0)]),
        k_scale=None if cache.k_scale is None else jnp.pad(cache.k_scale,
                                                           pad_rows),
        v_scale=None if cache.v_scale is None else jnp.pad(cache.v_scale,
                                                           pad_rows),
    )
    last = jnp.take_along_axis(hidden, (valid_len - 1)[:, None, None], axis=1)
    logits = qwen2.unembed(lm, cfg.lm, last)[0, 0]   # (V,)
    hist_cap = hist.shape[0]
    width = max_new_tokens + spec_k

    def lookup(t_prev, g0, hist, hist_n):
        # last occurrence of the (t_prev, g0) bigram inside the corpus; the
        # tokens after it are the proposal. No match -> repeat g0 (any
        # draft is correctness-neutral).
        idx = jnp.arange(hist_cap - 1)
        m = ((hist[:-1] == t_prev) & (hist[1:] == g0)
             & (idx + 1 < hist_n) & (t_prev >= 0))
        j = jnp.max(jnp.where(m, idx, -1))
        start = jnp.clip(j + 2, 0, hist_cap - (spec_k - 1))
        cont = jax.lax.dynamic_slice(hist, (start,), (spec_k - 1,))
        # the continuation may run past the corpus end (hist_n) into
        # padding — patch those entries with the fallback token
        in_corpus = (start + jnp.arange(spec_k - 1)) < hist_n
        cont = jnp.where(in_corpus, cont, g0)
        return jnp.where(j >= 0, cont, jnp.full((spec_k - 1,), g0))

    def body(state):
        num, cur_len = state["num"], state["cur_len"]
        g0 = jnp.argmax(state["logits"]).astype(jnp.int32)
        t_prev = jnp.where(state["hist_n"] > 0,
                           state["hist"][jnp.clip(state["hist_n"] - 1, 0)],
                           -1)
        draft = lookup(t_prev, g0, state["hist"], state["hist_n"])
        chunk = jnp.concatenate([g0[None], draft])            # (K,)
        emb = qwen2.embed_tokens(lm, chunk[None], cfg.lm).astype(embeds.dtype)
        hidden, cache = qwen2.forward_chunk(lm, cfg.lm, emb, state["cache"],
                                            cur_len, rope_seq_len=rope_bound)
        logits_all = qwen2.unembed(lm, cfg.lm, hidden)[0]     # (K, V)
        preds = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)
        acc = jnp.cumprod((preds[:-1] == chunk[1:]).astype(jnp.int32))
        n_acc = jnp.sum(acc)
        emitted = 1 + n_acc
        next_logits = logits_all[n_acc]
        # cap to the token budget, then to the first eos inside the window
        emitted = jnp.minimum(emitted, max_new_tokens - num)
        is_eos = jnp.any(chunk[:, None] == eos_ids[None, :], axis=-1)
        in_window = jnp.arange(spec_k) < emitted
        hit = is_eos & in_window
        any_hit = jnp.any(hit)
        emitted = jnp.where(any_hit, jnp.argmax(hit) + 1, emitted)
        tokens = jax.lax.dynamic_update_slice(state["tokens"], chunk, (num,))
        hist = jax.lax.dynamic_update_slice(state["hist"], chunk,
                                            (state["hist_n"],))
        return dict(
            num=num + emitted, cur_len=cur_len + emitted,
            done=state["done"] | any_hit, logits=next_logits, cache=cache,
            tokens=tokens, hist=hist, hist_n=state["hist_n"] + emitted,
            iters=state["iters"] + 1,
        )

    def cond(state):
        return jnp.logical_and(state["num"] < max_new_tokens,
                               jnp.logical_not(state["done"]))

    state = dict(
        num=jnp.asarray(0, jnp.int32), cur_len=valid_len[0],
        done=jnp.asarray(False), logits=logits, cache=cache,
        tokens=jnp.zeros((width,), jnp.int32), hist=hist, hist_n=hist_n,
        iters=jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, state)
    tokens = jnp.where(jnp.arange(width) < final["num"], final["tokens"], 0)
    return tokens[:max_new_tokens], final["num"], final["iters"]


@functools.lru_cache(maxsize=16)
def _jit_spec(cfg: VLMConfig, max_new_tokens: int, spec_k: int):
    return jax.jit(
        functools.partial(_spec_decode, max_new_tokens=max_new_tokens,
                          spec_k=spec_k),
        static_argnames=("cfg",))


def generate_speculative(
    params,
    cfg: VLMConfig,
    inputs_embeds: jax.Array,      # (S, H) spliced sequence (single sample)
    *,
    draft_ids=None,                # prompt TEXT ids for the lookup corpus
    max_new_tokens: int = 128,
    eos_token_ids: Tuple[int, ...] = (151645,),
    spec_k: int = 4,
    pad_to_multiple: int = 128,
) -> Tuple[GenerateResult, dict]:
    """Greedy decode with prompt-lookup speculation: emits the exact plain-
    greedy tokens while running ~(accepted+1) tokens per LM forward.
    `draft_ids` (the prompt's text token ids) seed the lookup corpus;
    generated tokens join it as they are emitted. Returns the
    GenerateResult plus {"iterations": n} (tokens/iterations = mean
    accepted run length; equal to num_tokens when nothing accepts)."""
    if spec_k < 2:
        raise ValueError("spec_k must be >= 2 (1 certain + >=1 proposed)")
    s = inputs_embeds.shape[0]
    smax = ((s + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    embeds = jnp.pad(inputs_embeds, ((0, smax - s), (0, 0)))[None]
    n_draft = 0 if draft_ids is None else len(draft_ids)
    hist_cap = -(-(n_draft + max_new_tokens + spec_k) // 128) * 128
    hist = np.zeros((hist_cap,), np.int32)
    if n_draft:
        hist[:n_draft] = np.asarray(draft_ids, np.int32)
    fn = _jit_spec(cfg, max_new_tokens, spec_k)
    tokens, num, iters = fn(
        params, cfg, embeds, jnp.asarray([s], jnp.int32),
        jnp.asarray(eos_token_ids, jnp.int32), jnp.asarray(hist),
        jnp.asarray(n_draft, jnp.int32))
    return (GenerateResult(tokens=tokens, num_tokens=num),
            {"iterations": int(iters)})


# ---------------------------------------------------------------------------
# Incremental streaming decode (the worker's TextIteratorStreamer equivalent)
# ---------------------------------------------------------------------------

def _prefill_core(params, cfg: VLMConfig, embeds, valid_len, *,
                  cache_extra: int):
    lm = params["language_model"]
    smax = embeds.shape[1]
    hidden, cache = qwen2.forward(
        lm, cfg.lm, embeds, jnp.arange(smax)[None], valid_len=valid_len,
        cache_max_len=smax + cache_extra,
    )
    last = jnp.take_along_axis(hidden, (valid_len - 1)[:, None, None], axis=1)
    logits = qwen2.unembed(lm, cfg.lm, last)[:, 0]
    return logits, cache


@functools.lru_cache(maxsize=16)
def _jit_stream_fns(cfg: VLMConfig, cache_extra: int, chunk: int,
                    temperature: float, top_p: float, top_k: int,
                    repetition_penalty: float, do_sample: bool):
    prefill = jax.jit(functools.partial(_prefill_core, cache_extra=cache_extra),
                      static_argnames=("cfg",))

    def chunk_core(params, cfg, state, eos_ids, stop_seqs, stop_lens):
        body = _decode_body(
            params["language_model"], cfg, eos_ids, stop_seqs, stop_lens,
            state["cache"].k.dtype, state["done"].shape[0],
            temperature=temperature, top_p=top_p, top_k=top_k,
            repetition_penalty=repetition_penalty,
            sampled=do_sample and temperature > 0.0)

        def scan_body(st, _):
            # frozen after done: body keeps emitting pad without extending num
            return body(st), None

        state = dict(state, step=jnp.asarray(0),
                     tokens=jnp.zeros(state["tokens"].shape, jnp.int32))
        state, _ = jax.lax.scan(scan_body, state, None, length=chunk)
        return state

    step = jax.jit(chunk_core, static_argnames=("cfg",))
    return prefill, step


def generate_stream(
    params,
    cfg: VLMConfig,
    inputs_embeds: jax.Array,      # (S, H) single spliced sequence
    *,
    max_new_tokens: int = 256,
    eos_token_ids: Tuple[int, ...] = (151645,),
    do_sample: bool = False,
    temperature: float = 0.0,
    top_p: float = 1.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    stop_sequences: Tuple[Tuple[int, ...], ...] = (),
    chunk_size: int = 8,
    pad_to_multiple: int = 128,
    rng: Optional[jax.Array] = None,
):
    """Yield decoded token-id chunks incrementally (np.ndarray per chunk) —
    the serving equivalent of the reference's TextIteratorStreamer thread
    (serve/model_worker.py:107-180), without leaving the jitted decode."""
    if temperature > 0.0:
        do_sample = True
    s = inputs_embeds.shape[0]
    smax = ((s + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    embeds = jnp.pad(inputs_embeds, ((0, smax - s), (0, 0)))[None]
    cache_extra = ((max_new_tokens + chunk_size - 1) // chunk_size) * chunk_size
    prefill, step = _jit_stream_fns(
        cfg, cache_extra, chunk_size, float(temperature), float(top_p),
        int(top_k), float(repetition_penalty), bool(do_sample))
    logits, cache = prefill(params, cfg, embeds, jnp.asarray([s], jnp.int32))
    seqs, lens = sampling.pack_stop_sequences(stop_sequences)
    state = _decode_state0(cfg, 1, chunk_size, jnp.asarray(seqs), logits,
                           cache, rng if rng is not None else jax.random.key(0),
                           repetition_penalty != 1.0)
    emitted = 0
    prev_num = 0
    while emitted < max_new_tokens:
        state = step(params, cfg, state, jnp.asarray(eos_token_ids, jnp.int32),
                     jnp.asarray(seqs), jnp.asarray(lens))
        num = int(state["num"][0])
        fresh = np.asarray(state["tokens"][0, : num - prev_num])
        emitted += chunk_size
        if fresh.size:
            yield fresh[: max(0, max_new_tokens - prev_num)]
        prev_num = num
        if bool(state["done"][0]):
            break


# ---------------------------------------------------------------------------
# Log-likelihood scoring (lmms-eval `loglikelihood` protocol)
# ---------------------------------------------------------------------------

def _score_core(params, cfg: VLMConfig, embeds: jax.Array, valid_len: jax.Array,
                cont_ids: jax.Array, cont_len: jax.Array):
    """embeds (1, Smax, H) right-padded; the last `cont_len` valid positions
    embed `cont_ids[:cont_len]` (right-padded to a static Tmax).  Returns
    (sum log p(continuation | prefix), all-greedy flag) — the (float, bool)
    pair lmms-eval's `loglikelihood` expects per request."""
    lm = params["language_model"]
    smax = embeds.shape[1]
    positions = jnp.arange(smax)[None]
    hidden, _ = qwen2.forward(lm, cfg.lm, embeds, positions, valid_len=valid_len)
    logits = qwen2.unembed(lm, cfg.lm, hidden)[0]          # (Smax, V) fp32
    logp = jax.nn.log_softmax(logits, axis=-1)
    tmax = cont_ids.shape[0]
    # continuation token j (0-based) sits at sequence index valid-cont_len+j;
    # its predictive logits live one position earlier
    idx = valid_len[0] - cont_len + jnp.arange(tmax) - 1   # (Tmax,)
    idx = jnp.clip(idx, 0, smax - 1)
    rows = jnp.take(logp, idx, axis=0)                     # (Tmax, V)
    tok_logp = jnp.take_along_axis(rows, cont_ids[:, None], axis=-1)[:, 0]
    mask = jnp.arange(tmax) < cont_len
    total = jnp.sum(jnp.where(mask, tok_logp, 0.0))
    greedy = jnp.all(jnp.where(mask, jnp.argmax(rows, axis=-1) == cont_ids, True))
    return total, greedy


@functools.lru_cache(maxsize=8)
def _jit_score(cfg: VLMConfig):
    return jax.jit(_score_core, static_argnames=("cfg",))


def score_continuation(
    params,
    cfg: VLMConfig,
    inputs_embeds: jax.Array,   # (S, H) full spliced sequence incl. continuation
    cont_ids: np.ndarray,       # (T,) continuation token ids (the last T tokens)
    *,
    pad_to_multiple: int = 128,
) -> Tuple[float, bool]:
    s = inputs_embeds.shape[0]
    t = int(len(cont_ids))
    smax = ((s + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    tmax = ((t + 15) // 16) * 16
    embeds = jnp.pad(inputs_embeds, ((0, smax - s), (0, 0)))[None]
    cont = jnp.pad(jnp.asarray(cont_ids, jnp.int32), (0, tmax - t))
    total, greedy = _jit_score(cfg)(
        params, cfg, embeds, jnp.asarray([s], jnp.int32), cont,
        jnp.asarray(t, jnp.int32))
    return float(total), bool(greedy)


# ---------------------------------------------------------------------------
# High-level video QA entry (host orchestration)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 6, 7))
def _encode_and_fuse(params, cfg, frames, frame_indices, frame_valid,
                     fine_idx, nseg, drop_fine_frames):
    """One compiled graph for tower + fusion — eval/serving calls would
    otherwise run the 26-layer tower eagerly (each op a ~28 ms relay
    dispatch on this setup). Recompiles are bounded by frame buckets.

    Frames arriving as uint8 take the device-preprocess path
    (ops/preprocess.py): resize + rescale + normalize run in-graph, so the
    host ships raw decoded bytes instead of running the PIL loop."""
    if frames.dtype == jnp.uint8:
        s = cfg.vision.image_size
        frames = preprocess_ops.preprocess_frames(
            frames, size=(s, s),
            dtype=jnp.bfloat16 if cfg.lm.dtype == "bfloat16" else jnp.float32)
    feats = encode_frames(params, cfg, frames)
    return build_video_embeds(
        params, cfg, feats, frame_indices, frame_valid, fine_idx, nseg,
        drop_fine_frames=drop_fine_frames,
    )


def video_qa_embeds(
    params,
    cfg: VLMConfig,
    pixels: np.ndarray,          # (F0, 384, 384, 3) preprocessed frames,
                                 # or raw (F0, H, W, 3) uint8 for the
                                 # device-preprocess path (ops/preprocess.py)
    input_ids: np.ndarray,       # (S,) with exactly one IMAGE_TOKEN_INDEX
    *,
    training_drop_frames: bool = False,
) -> jax.Array:
    """Full host+device pipeline from preprocessed frames + token ids to the
    spliced embedding sequence (ready for `generate` or the train step)."""
    f0 = pixels.shape[0]
    sample_idx = sample_video_frames(f0)
    f1 = len(sample_idx)
    fmax = pad_frames_to_segment_multiple(f1, cfg.memory.segment_frames)
    nseg = min(fmax // cfg.memory.segment_frames, cfg.memory.cache_cap)

    frames = pixels[sample_idx]
    pad = fmax - f1
    if pad:
        frames = np.concatenate([frames, np.zeros((pad,) + frames.shape[1:], frames.dtype)])
    frame_valid = np.arange(fmax) < f1
    frame_indices = np.concatenate([sample_idx, np.zeros(pad, np.int64)])
    fine_idx = fine_frame_indices(f1, cfg.memory.num_fine_frames)

    dtype = jnp.bfloat16 if cfg.lm.dtype == "bfloat16" else jnp.float32
    if frames.dtype == np.uint8:
        dtype = jnp.uint8  # ship raw bytes; _encode_and_fuse resizes+normalizes
    visual = _encode_and_fuse(
        params, cfg, jnp.asarray(frames, dtype), jnp.asarray(frame_indices),
        jnp.asarray(frame_valid), jnp.asarray(fine_idx), nseg,
        training_drop_frames,
    )

    image_pos = int(np.where(input_ids == constants.IMAGE_TOKEN_INDEX)[0][0])
    before = jnp.asarray(input_ids[:image_pos], jnp.int32)
    after = jnp.asarray(input_ids[image_pos + 1 :], jnp.int32)
    return splice_image_embeds(params, before, visual, after, cfg.lm)


# ---------------------------------------------------------------------------
# Dormant faster-video stream (llava_arch.py:201-206,320-322,590-601)
# ---------------------------------------------------------------------------

def build_faster_video_embeds(
    params,
    cfg: VLMConfig,
    feats_729: jax.Array,     # (F, 729, H) pre-pool projected features
    faster_token: jax.Array,  # (H,) learnable separator (init_params extra)
    faster_token_stride: int = 10,
) -> jax.Array:
    """`add_faster_video` capability: a second, 2x-coarser pooled stream
    interleaved with the slow stream per `faster_token_stride`, each frame
    row terminated by the learnable `faster_token`. Returns (L, H)."""
    pipe = cfg.pipeline
    side = cfg.vision.num_patches_per_side
    slow = spatial_pool_2x2(feats_729, side, mode=pipe.mm_spatial_pool_mode,
                            stride=pipe.mm_spatial_pool_stride)
    fast = spatial_pool_2x2(feats_729, side, mode=pipe.mm_spatial_pool_mode,
                            stride=pipe.mm_spatial_pool_stride * 2)
    h = slow.shape[-1]
    tok = faster_token.reshape(1, h).astype(slow.dtype)
    rows = []
    for f in range(slow.shape[0]):
        src = slow[f] if f % faster_token_stride == 0 else fast[f]
        rows.append(jnp.concatenate([src.reshape(-1, h), tok], axis=0))
    return jnp.concatenate(rows, axis=0)
