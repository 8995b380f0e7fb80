"""HF-parity logits processing for the jitted decode loop.

The reference routes `generate()` through HF transformers' sampling stack
(llava/model/language_model/llava_qwen.py:116-136 -> GenerationMixin), whose
active processors for the eval recipes are temperature, top-k, top-p and
repetition penalty, plus `KeywordsStoppingCriteria` (llava/mm_utils.py:372)
for "until"-style stopping.  This module re-derives those semantics as pure
jnp functions with static knobs so they trace into one `lax.while_loop`:

  - `RepetitionPenaltyLogitsProcessor`: tokens already emitted get their
    logit divided by `p` when positive, multiplied when negative.  The
    reference passes `inputs_embeds` (no prompt ids) to HF generate, so the
    penalty set starts empty and grows with generated tokens — matched here
    with a (B, V) presence mask carried through the loop.
  - `TopKLogitsWarper`: keep the k highest logits, -inf the rest.
  - `TopPLogitsWarper`: ascending sort; drop tokens whose cumulative
    probability is <= 1 - top_p (always keeping at least one).
  - keyword stopping: a (N, L) right-aligned ring-buffer comparison against
    the last L generated tokens, matching KeywordsStoppingCriteria's
    "compare the tail of output_ids with each keyword's ids".

All masking uses a large-but-finite NEG_INF so fp32 softmax stays NaN-free
(repo numerics rule).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def apply_repetition_penalty(logits: jax.Array, presence: jax.Array,
                             penalty: float) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor over a (B, V) presence mask."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalized, logits)


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k highest logits per row (-inf elsewhere)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    """HF TopPLogitsWarper: remove the low-probability tail whose cumulative
    mass is <= 1 - top_p (ascending order), keeping at least one token."""
    if top_p >= 1.0:
        return logits
    asc = jnp.sort(logits, axis=-1)
    probs = jax.nn.softmax(asc.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum > (1.0 - top_p)  # ascending: True once the tail mass is spent
    # threshold = smallest kept logit; everything strictly below is removed
    first_kept = jnp.argmax(keep, axis=-1)
    threshold = jnp.take_along_axis(asc, first_kept[..., None], axis=-1)
    return jnp.where(logits < threshold, NEG_INF, logits)


def process_logits(
    logits: jax.Array,              # (B, V) raw fp32 logits
    presence: Optional[jax.Array],  # (B, V) bool or None
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
) -> jax.Array:
    """HF processor order: repetition penalty -> temperature -> top-k -> top-p."""
    if repetition_penalty != 1.0 and presence is not None:
        logits = apply_repetition_penalty(logits, presence, repetition_penalty)
    if temperature not in (0.0, 1.0):
        logits = logits / temperature
    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, top_p)
    return logits


def pack_stop_sequences(
    sequences: Sequence[Sequence[int]],
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack keyword token-id sequences into a right-aligned (N, L) int32 array
    (padded with -1 on the left) plus per-sequence lengths.  Right alignment
    lets the decode loop compare against a single rolling tail buffer."""
    if not sequences:
        return np.zeros((0, 1), np.int32), np.zeros((0,), np.int32)
    lmax = max(len(s) for s in sequences)
    packed = np.full((len(sequences), lmax), -1, np.int32)
    lens = np.zeros((len(sequences),), np.int32)
    for i, s in enumerate(sequences):
        packed[i, lmax - len(s):] = np.asarray(s, np.int32)
        lens[i] = len(s)
    return packed, lens


def stop_sequence_hit(recent: jax.Array, stop_seqs: jax.Array,
                      stop_lens: jax.Array, n_generated: jax.Array) -> jax.Array:
    """recent: (B, L) rolling buffer of the last L tokens (-1 fill before any
    token exists).  Returns (B,) bool: some stop sequence matches the tail.

    A sequence of length l only matches once at least l tokens were generated
    (KeywordsStoppingCriteria checks `output_ids.shape[1] >= len(keyword)`)."""
    if stop_seqs.shape[0] == 0:
        b = recent.shape[0]
        return jnp.zeros((b,), bool)
    lmax = stop_seqs.shape[1]
    pos = jnp.arange(lmax)[None, :]                    # (1, L)
    active = pos >= (lmax - stop_lens[:, None])        # (N, L) valid positions
    eq = recent[:, None, :] == stop_seqs[None, :, :]   # (B, N, L)
    match = jnp.all(eq | ~active[None], axis=-1)       # (B, N)
    enough = n_generated[:, None] >= stop_lens[None, :]
    return jnp.any(match & enough, axis=-1)
