"""Beam search decode — the HF `GenerationMixin` beam path of the reference's
`generate` surface (llava_qwen.py:116-136 accepts num_beams), jitted.

Semantics mirror HF beam_search with do_sample=False:
  - the prefill's top-K tokens seed K beams (first step draws from one
    distribution, scores = logprob);
  - each step ranks the K*V continuations, takes the top 2K candidates,
    moves eos candidates into a K-slot finished pool (score =
    sum_logprobs / len**length_penalty), and keeps the best K non-eos
    candidates as running beams (HF's "top 2K so K survivors always exist");
  - early_stopping=True semantics: stop when the finished pool holds K
    hypotheses (or max_new_tokens is reached); remaining running beams then
    compete with the pool at their current length, exactly like HF's
    finalize step.

The KV cache is carried at batch K and gathered by parent-beam index each
step. Parity vs HF generate(num_beams=k, early_stopping=True) is pinned in
tests/test_beam_search.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, sampling

# sentinel for "no candidate": must rank below ANY genuine score. Beam
# SAMPLING scores compound by 1/temperature each step (the HF formula
# warps the accumulated sum), so tiny temperatures push real scores to
# ~-1e33 — only -inf is safely below them (finite sentinels broke the
# eos masking at temperature 1e-4; comparisons use isfinite-style
# `> -inf` instead of `> sentinel/2`).
NEG_INF = -float("inf")


def _beam_core(params, cfg: VLMConfig, embeds, valid_len, eos_ids,
               stop_seqs, stop_lens, rng,
               *, num_beams: int, max_new_tokens: int, length_penalty: float,
               repetition_penalty: float = 1.0, do_sample: bool = False,
               temperature: float = 1.0, top_p: float = 1.0,
               top_k: int = 0):
    """embeds (1, Smax, H) right-padded. Returns (tokens (max_new,), n).

    `repetition_penalty` follows HF's beam path exactly: the
    RepetitionPenaltyLogitsProcessor runs on the log-softmaxed scores
    (GenerationMixin._beam_search applies processors to `next_token_scores`),
    over the generated ids only — with `inputs_embeds` and no `input_ids`,
    HF's rolling `input_ids` holds just the generated tokens, so the prompt
    is never penalized (matching the reference's multimodal generate,
    llava_qwen.py:116-136).

    `do_sample=True` is HF beam SAMPLING (GenerationMixin._beam_search with
    do_sample, transformers 4.57 semantics, generation/utils.py
    `_get_top_k_continuations`): the logits warpers (temperature -> top-k
    -> top-p) run on the PER-BEAM log-probs BEFORE the running beam scores
    are added (the warpers ride inside `logits_processor` when sampling),
    then the 2K candidates are drawn WITHOUT replacement from the softmax
    over the flattened (K*V) accumulated scores (torch.multinomial,
    realized here as Gumbel-top-k, equal in distribution) and kept in DRAW
    order — HF's `top_num_beam_mask` makes the first K draw positions the
    pool-eligible ones, so no descending sort happens on the sampled
    candidates."""
    lm = params["language_model"]
    k = num_beams
    track = repetition_penalty != 1.0
    track_kw = int(stop_seqs.shape[0]) > 0

    def select2k(beam_scores, logp_rows, step_key):
        """2K candidates from running scores (R,) + processed log-probs
        (R, V) -> (scores (2K,), flat idx (2K,)): top-2K of the accumulated
        scores (search), or 2K multinomial draws without replacement in
        draw order (sampling)."""
        if do_sample:
            if temperature not in (0.0, 1.0):
                logp_rows = logp_rows / temperature
            logp_rows = sampling.apply_top_k(logp_rows, top_k)
            logp_rows = sampling.apply_top_p(logp_rows, top_p)
        acc = (beam_scores[:, None] + logp_rows).reshape(-1)
        if not do_sample:
            return jax.lax.top_k(acc, 2 * k)
        # Gumbel-top-k == multinomial without replacement over softmax(acc)
        # (log_softmax differs from acc by a constant; argtop is invariant)
        u = jax.random.uniform(step_key, acc.shape, jnp.float32,
                               minval=1e-20, maxval=1.0)
        gumbel = -jnp.log(-jnp.log(u))
        _, idx = jax.lax.top_k(acc + gumbel, 2 * k)
        return jnp.take(acc, idx), idx

    smax = embeds.shape[1]
    hidden, cache0 = qwen2.forward(
        lm, cfg.lm, embeds, jnp.arange(smax)[None], valid_len=valid_len,
        cache_max_len=smax + max_new_tokens,
    )
    last = jnp.take_along_axis(hidden, (valid_len - 1)[:, None, None], axis=1)
    logits0 = qwen2.unembed(lm, cfg.lm, last)[0, 0]          # (V,)
    logp0 = jax.nn.log_softmax(logits0)

    def is_eos(tok):
        return jnp.any(tok[..., None] == eos_ids[None, :], axis=-1)

    # seed from the top-2K (or 2K sampled) of the prefill distribution with
    # HF's split rule: eos candidates among the first K ranks go to the
    # hypothesis pool, the best K non-eos candidates become the running
    # beams (BeamSearchScorer.process applied to a first step where all
    # beams share one history; HF's -1e9 init on beams 1..K-1 makes the
    # flattened first-step draw equivalent to drawing from beam 0's row)
    cand_scores0, cand_tok0 = select2k(jnp.zeros((1,)), logp0[None],
                                       jax.random.fold_in(rng, 0))
    cand_tok0 = cand_tok0.astype(jnp.int32)
    cand_done0 = is_eos(cand_tok0)
    if track_kw:
        # stopping-criteria hits act exactly like eos in HF's vectorized
        # beam search (_update_finished_beams consumes one merged
        # `next_token_hits_stopping_criteria` mask)
        lstop = int(stop_seqs.shape[1])
        cand_recent0 = (jnp.full((2 * k, lstop), -1, jnp.int32)
                        .at[:, -1].set(cand_tok0))
        cand_done0 = cand_done0 | sampling.stop_sequence_hit(
            cand_recent0, stop_seqs, stop_lens, jnp.ones((2 * k,), jnp.int32))
    rank_lt_k0 = jnp.arange(2 * k) < k
    fin_scores0 = jnp.full((k,), NEG_INF)
    fin_tokens0 = jnp.zeros((k, max_new_tokens), jnp.int32)
    pool_cand0 = jnp.where(cand_done0 & rank_lt_k0,
                           cand_scores0 / (1.0 ** length_penalty), NEG_INF)
    fin_scores0, fin_sel0 = jax.lax.top_k(
        jnp.concatenate([fin_scores0, pool_cand0]), k)
    fin_tokens_all0 = jnp.concatenate(
        [fin_tokens0,
         jnp.zeros((2 * k, max_new_tokens), jnp.int32).at[:, 0].set(cand_tok0)])
    fin_tokens0 = jnp.take(fin_tokens_all0, fin_sel0, axis=0)
    run_rank0 = jnp.where(cand_done0, NEG_INF, cand_scores0)
    scores, run_sel0 = jax.lax.top_k(run_rank0, k)
    first_tok = jnp.take(cand_tok0, run_sel0)
    cache = qwen2.KVCache(
        k=jnp.repeat(cache0.k, k, axis=1),
        v=jnp.repeat(cache0.v, k, axis=1),
        length=jnp.repeat(cache0.length, k, axis=0),
    )
    tokens0 = jnp.zeros((k, max_new_tokens), jnp.int32).at[:, 0].set(first_tok)

    def advance(state):
        step, scores, tokens, cache = (state["step"], state["scores"],
                                       state["tokens"], state["cache"])
        fin_scores, fin_tokens = state["fin_scores"], state["fin_tokens"]
        emb = qwen2.embed_tokens(
            lm, tokens[:, step - 1][:, None], cfg.lm).astype(embeds.dtype)
        hidden, cache = qwen2.decode_step(lm, cfg.lm, emb, cache)
        logp = jax.nn.log_softmax(
            qwen2.unembed(lm, cfg.lm, hidden)[:, 0])          # (K, V)
        if track:
            pen = jnp.where(logp < 0, logp * repetition_penalty,
                            logp / repetition_penalty)
            logp = jnp.where(state["presence"], pen, logp)
        v = logp.shape[-1]
        cand_scores, cand_idx = select2k(scores, logp,
                                         jax.random.fold_in(rng, step))
        cand_beam = cand_idx // v
        cand_tok = (cand_idx % v).astype(jnp.int32)
        cand_tokens = jnp.take(tokens, cand_beam, axis=0).at[:, step].set(cand_tok)
        cand_done = is_eos(cand_tok)
        if track_kw:
            cand_recent = jnp.concatenate(
                [jnp.take(state["recent"], cand_beam, axis=0)[:, 1:],
                 cand_tok[:, None]], axis=1)
            cand_done = cand_done | sampling.stop_sequence_hit(
                cand_recent, stop_seqs, stop_lens,
                jnp.full((2 * k,), step + 1, jnp.int32))

        # finished pool: merge eos candidates among the FIRST K ranks (HF
        # BeamSearchScorer.process skips eos with beam_token_rank >= K),
        # scored at length step+1
        rank_lt_k = jnp.arange(2 * k) < k
        cand_fin = jnp.where(
            cand_done & rank_lt_k,
            cand_scores / ((step + 1.0) ** length_penalty), NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin])
        all_fin_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=0)
        fin_scores, fin_sel = jax.lax.top_k(all_fin_scores, k)
        fin_tokens = jnp.take(all_fin_tokens, fin_sel, axis=0)

        # running beams: best K non-eos candidates (order-preserving)
        run_rank = jnp.where(cand_done, NEG_INF, cand_scores)
        new_scores, run_sel = jax.lax.top_k(run_rank, k)
        parent = jnp.take(cand_beam, run_sel)
        tokens = jnp.take(cand_tokens, run_sel, axis=0)
        cache = qwen2.KVCache(
            k=jnp.take(cache.k, parent, axis=1),
            v=jnp.take(cache.v, parent, axis=1),
            length=jnp.take(cache.length, parent, axis=0),
        )
        out = dict(step=step + 1, scores=new_scores, tokens=tokens,
                   cache=cache, fin_scores=fin_scores, fin_tokens=fin_tokens)
        if track:
            new_tok = jnp.take(cand_tok, run_sel)
            out["presence"] = (jnp.take(state["presence"], parent, axis=0)
                               .at[jnp.arange(k), new_tok].set(True))
        if track_kw:
            out["recent"] = jnp.take(cand_recent, run_sel, axis=0)
            # HF's `valid_continuations`: the search dies when every top-2K
            # candidate hits a stopping criterion
            out["all_cand_done"] = jnp.all(cand_done)
        return out

    def cond(state):
        # early_stopping=True
        done = jnp.sum(state["fin_scores"] > NEG_INF) >= k
        if track_kw:
            done = jnp.logical_or(done, state["all_cand_done"])
        return jnp.logical_and(state["step"] < max_new_tokens,
                               jnp.logical_not(done))

    state = dict(step=jnp.asarray(1), scores=scores, tokens=tokens0,
                 cache=cache, fin_scores=fin_scores0, fin_tokens=fin_tokens0)
    if track:
        state["presence"] = (jnp.zeros((k, logp0.shape[-1]), bool)
                             .at[jnp.arange(k), first_tok].set(True))
    if track_kw:
        state["recent"] = jnp.take(cand_recent0, run_sel0, axis=0)
        state["all_cand_done"] = jnp.all(cand_done0)
    state = jax.lax.while_loop(cond, advance, state)
    step, scores, tokens = state["step"], state["scores"], state["tokens"]
    fin_scores, fin_tokens = state["fin_scores"], state["fin_tokens"]

    # finalize: HF's finalize adds running beams ONLY when the search was
    # not early-stopped (pool not yet full); after an early stop the pool
    # alone competes
    pool_full = jnp.sum(fin_scores > NEG_INF) >= k
    run_fin = jnp.where(
        pool_full, NEG_INF,
        scores / (step.astype(jnp.float32) ** length_penalty))
    all_scores = jnp.concatenate([fin_scores, run_fin])
    all_tokens = jnp.concatenate([fin_tokens, tokens], axis=0)
    best = jnp.argmax(all_scores)
    best_tokens = jnp.take(all_tokens, best, axis=0)
    # sequence length: finished beams end at their eos position + 1
    eos_hits = jnp.any(best_tokens[:, None] == eos_ids[None, :], axis=-1)
    has_eos = jnp.any(eos_hits)
    first_eos = jnp.argmax(eos_hits)
    n = jnp.where(has_eos, first_eos + 1, step)
    return best_tokens, n.astype(jnp.int32)


@functools.lru_cache(maxsize=16)
def _jit_beam(cfg: VLMConfig, num_beams: int, max_new_tokens: int,
              length_penalty: float, repetition_penalty: float,
              do_sample: bool, temperature: float, top_p: float,
              top_k: int):
    return jax.jit(
        functools.partial(_beam_core, num_beams=num_beams,
                          max_new_tokens=max_new_tokens,
                          length_penalty=length_penalty,
                          repetition_penalty=repetition_penalty,
                          do_sample=do_sample, temperature=temperature,
                          top_p=top_p, top_k=top_k),
        static_argnames=("cfg",),
    )


def beam_search(
    params,
    cfg: VLMConfig,
    inputs_embeds: jax.Array,     # (S, H) single spliced sequence
    *,
    num_beams: int = 4,
    max_new_tokens: int = 128,
    eos_token_ids: Tuple[int, ...] = (151645,),
    length_penalty: float = 1.0,
    repetition_penalty: float = 1.0,
    stop_sequences: Tuple[Tuple[int, ...], ...] = (),
    pad_to_multiple: int = 128,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: float = 1.0,
    top_k: int = 0,
    rng: jax.Array = None,
) -> np.ndarray:
    """Best beam's generated ids (without prompt echo), truncated just after
    the first stop sequence (matching the greedy path's `num` accounting).
    `do_sample=True` = HF beam sampling (see _beam_core)."""
    s = inputs_embeds.shape[0]
    smax = ((s + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    embeds = jnp.pad(inputs_embeds, ((0, smax - s), (0, 0)))[None]
    seqs, lens = sampling.pack_stop_sequences(stop_sequences)
    fn = _jit_beam(cfg, int(num_beams), int(max_new_tokens),
                   float(length_penalty), float(repetition_penalty),
                   bool(do_sample), float(temperature), float(top_p),
                   int(top_k))
    tokens, n = fn(params, cfg, embeds, jnp.asarray([s], jnp.int32),
                   jnp.asarray(eos_token_ids, jnp.int32),
                   jnp.asarray(seqs), jnp.asarray(lens),
                   rng if rng is not None else jax.random.key(0))
    out = np.asarray(tokens)[: int(n)]
    # host-side cut at the earliest completed stop sequence (inclusive, like
    # the greedy path, whose `num` counts the stop tokens; callers strip the
    # keyword text after detokenizing)
    for seq in stop_sequences:
        seq = list(seq)
        for end in range(len(seq) - 1, len(out)):
            if list(out[end - len(seq) + 1: end + 1]) == seq:
                out = out[: end + 1]
                break
    return out
