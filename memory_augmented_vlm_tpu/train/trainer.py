"""Training harness: jit/pjit train step over the (data, fsdp, tp) mesh.

Replaces the reference's HF Trainer + DeepSpeed ZeRO-2 + NCCL stack
(llava/train/train.py:1489-1838, llava_trainer.py) with:

  - one pure `train_step` (loss -> grads -> optax update) compiled end-to-end;
    ZeRO sharding comes from parameter NamedShardings (parallel/sharding.py),
    not a runtime engine;
  - batched multimodal fusion under vmap (same spine as models/vlm.py) with
    dynamic per-sample <image> positions handled by gather-based splicing —
    static shapes, no Python loops over the batch;
  - synced frame dropout as a *host-side* decision from a step-seeded key
    (replaces the reference's rank-0 NCCL broadcast, llava_arch.py:378-386:
    every host folds the same key, so no collective is needed);
  - chunked fp32 cross-entropy so (S, vocab) logits are never materialized;
  - remat on LM layers (gradient checkpointing equivalent).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, vlm
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig, build_optimizer


class TrainBatch(NamedTuple):
    """One bucketed multimodal batch (all samples share Fmax/nfine/St)."""

    pixels: jax.Array         # (B, Fmax, img, img, 3)
    frame_indices: jax.Array  # (B, Fmax) int32 — original indices for PE
    frame_valid: jax.Array    # (B, Fmax) bool
    fine_idx: jax.Array       # (B, nfine) int32
    input_ids: jax.Array      # (B, St) int32, <image> sentinel removed
    labels: jax.Array         # (B, St) int32, IGNORE_INDEX on non-targets
    image_pos: jax.Array      # (B,) int32 — insertion offset in input_ids
    text_len: jax.Array       # (B,) int32 — valid text length


def synced_frame_dropout(step: int, prob: float = 0.5, seed: int = 17) -> bool:
    """Deterministic shared dropout decision (replaces dist.broadcast)."""
    key = jax.random.fold_in(jax.random.key(seed), step)
    return bool(jax.random.uniform(key) < prob)


def _splice_batched(text_embeds, visual, image_pos, labels, ignore):
    """Insert (B, Lvis, H) visual streams at per-sample positions.

    text_embeds: (B, St, H); visual: (B, Lvis, H) -> (B, St+Lvis, H) embeds,
    (B, St+Lvis) labels with IGNORE over visual positions.
    """
    b, st, h = text_embeds.shape
    lvis = visual.shape[1]
    s = st + lvis
    j = jnp.arange(s)[None, :]                      # (1, S)
    pos = image_pos[:, None]                        # (B, 1)
    in_visual = (j >= pos) & (j < pos + lvis)
    text_idx = jnp.clip(jnp.where(j < pos, j, j - lvis), 0, st - 1)
    vis_idx = jnp.clip(j - pos, 0, lvis - 1)
    gathered_text = jnp.take_along_axis(text_embeds, text_idx[:, :, None], axis=1)
    gathered_vis = jnp.take_along_axis(visual, vis_idx[:, :, None], axis=1)
    embeds = jnp.where(in_visual[:, :, None], gathered_vis, gathered_text)
    lab = jnp.take_along_axis(labels, text_idx, axis=1)
    lab = jnp.where(in_visual, ignore, lab)
    return embeds, lab


def _constrain_logits(logits):
    """Pin (batch, -, vocab-on-tp): d_logits must be born vocab-sharded or
    GSPMD pays an involuntary full-remat reshard feeding the lm_head grad."""
    from jax.sharding import PartitionSpec as P

    from memory_augmented_vlm_tpu.parallel.sharding import constrain

    return constrain(logits, P(("data", "fsdp"), None, "tp"))


def dense_cross_entropy(params, cfg: VLMConfig, hidden, labels, valid_len):
    """Next-token CE with dense logits (used off-TPU: differentiating the
    chunked scan sends the XLA:CPU compiler into a multi-minute tailspin,
    measured 493s -> 14s on the dryrun graph; small shapes don't need the
    memory savings anyway)."""
    b, s, _ = hidden.shape
    logits = qwen2.unembed(params["language_model"], cfg.lm, hidden)
    logits = _constrain_logits(logits)
    targets = jnp.concatenate(
        [labels[:, 1:], jnp.full((b, 1), constants.IGNORE_INDEX, labels.dtype)], axis=1
    )
    mask = (targets != constants.IGNORE_INDEX) & (
        jnp.arange(s)[None, :] < (valid_len[:, None] - 1)
    )
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt_logit = jnp.take_along_axis(
        logits, jnp.clip(targets, 0)[..., None], axis=-1
    )[..., 0]
    nll = (logz - tgt_logit) * mask
    cnt = mask.sum()
    return nll.sum() / jnp.maximum(cnt, 1), cnt


def cross_entropy(params, cfg: VLMConfig, hidden, labels, valid_len,
                  chunk: int = 512):
    """Backend-dispatched next-token CE (chunked on TPU, dense elsewhere)."""
    if jax.default_backend() == "tpu":
        return chunked_cross_entropy(params, cfg, hidden, labels, valid_len, chunk)
    return dense_cross_entropy(params, cfg, hidden, labels, valid_len)


def chunked_cross_entropy(params, cfg: VLMConfig, hidden, labels, valid_len,
                          chunk: int = 512):
    """Next-token CE without materializing (S, vocab) logits.

    hidden: (B, S, H) post-final-norm; labels: (B, S). Predict labels[t+1]
    from hidden[t]; IGNORE_INDEX and positions >= valid_len-1 are masked.
    Returns (mean loss, token count).
    """
    b, s, h = hidden.shape
    targets = jnp.concatenate(
        [labels[:, 1:], jnp.full((b, 1), constants.IGNORE_INDEX, labels.dtype)], axis=1
    )
    pos_ok = jnp.arange(s)[None, :] < (valid_len[:, None] - 1)
    mask = (targets != constants.IGNORE_INDEX) & pos_ok
    pad = (-s) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    nchunk = hidden.shape[1] // chunk
    hidden = hidden.reshape(b, nchunk, chunk, h).swapaxes(0, 1)
    targets = targets.reshape(b, nchunk, chunk).swapaxes(0, 1)
    mask = mask.reshape(b, nchunk, chunk).swapaxes(0, 1)

    def body(carry, xs):
        tot, cnt = carry
        hid, tgt, msk = xs
        logits = qwen2.unembed(params["language_model"], cfg.lm, hid)  # fp32
        logits = _constrain_logits(logits)
        logz = jax.nn.logsumexp(logits, axis=-1)
        tgt_logit = jnp.take_along_axis(
            logits, jnp.clip(tgt, 0)[..., None], axis=-1
        )[..., 0]
        nll = (logz - tgt_logit) * msk
        return (tot + nll.sum(), cnt + msk.sum()), None

    (tot, cnt), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (hidden, targets, mask),
    )
    return tot / jnp.maximum(cnt, 1), cnt


def pos_skipping_positions(seq_len: int, batch: int, key, skip_range: int):
    """Length-generalization position skipping (llava_arch.py:869-875): split
    the sequence at a random point and add independent random offsets to the
    two halves."""
    k1, k2, k3 = jax.random.split(key, 3)
    split = jax.random.randint(k1, (), 0, seq_len + 1)
    left = jax.random.randint(k2, (), 0, skip_range + 1)
    right = left + jax.random.randint(k3, (), 0, jnp.maximum(skip_range + 1 - left, 1))
    pos = jnp.arange(seq_len)
    pos = pos + jnp.where(pos < split, left, right)
    return jnp.broadcast_to(pos[None], (batch, seq_len))


def multimodal_loss(params, cfg: VLMConfig, batch: TrainBatch, *,
                    nseg: int, drop_frames: bool = False,
                    pos_skip_key=None):
    """Full fusion + LM loss for one bucketed batch."""
    b, fmax = batch.pixels.shape[:2]
    pix = batch.pixels.reshape((b * fmax,) + batch.pixels.shape[2:])
    feats = vlm.encode_frames(params, cfg, pix)
    feats = feats.reshape(b, fmax, feats.shape[-2], feats.shape[-1])

    def per_sample(f, fi, fv, fidx):
        return vlm.build_video_embeds(
            params, cfg, f, fi, fv, fidx, nseg, drop_fine_frames=drop_frames
        )

    visual = jax.vmap(per_sample)(
        feats, batch.frame_indices, batch.frame_valid, batch.fine_idx
    )  # (B, Lvis, H)

    text_embeds = qwen2.embed_tokens(
        params["language_model"], jnp.clip(batch.input_ids, 0), cfg.lm
    ).astype(visual.dtype)
    embeds, labels = _splice_batched(
        text_embeds, visual, batch.image_pos, batch.labels, constants.IGNORE_INDEX
    )
    valid_len = batch.text_len + visual.shape[1]
    if cfg.pipeline.use_pos_skipping and pos_skip_key is not None:
        positions = pos_skipping_positions(
            embeds.shape[1], embeds.shape[0], pos_skip_key,
            cfg.pipeline.pos_skipping_range)
    else:
        positions = jnp.broadcast_to(
            jnp.arange(embeds.shape[1])[None], embeds.shape[:2])
    hidden, _ = qwen2.forward(
        params["language_model"], cfg.lm, embeds, positions, valid_len=valid_len,
        remat=True, differentiable_attention=True, need_cache=False,
    )
    loss, count = cross_entropy(params, cfg, hidden, labels, valid_len)
    return loss, {"loss": loss, "target_tokens": count}


class TextBatch(NamedTuple):
    """Text-only batch (the reference's language-data mixing; modality
    grouping keeps these out of video batches)."""

    input_ids: jax.Array  # (B, St)
    labels: jax.Array     # (B, St)
    text_len: jax.Array   # (B,)


def text_loss(params, cfg: VLMConfig, batch: TextBatch):
    embeds = qwen2.embed_tokens(
        params["language_model"], jnp.clip(batch.input_ids, 0), cfg.lm
    )
    if cfg.lm.dtype == "bfloat16":
        embeds = embeds.astype(jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(embeds.shape[1])[None], embeds.shape[:2])
    hidden, _ = qwen2.forward(
        params["language_model"], cfg.lm, embeds, positions,
        valid_len=batch.text_len, remat=True, differentiable_attention=True,
        need_cache=False)
    loss, count = cross_entropy(params, cfg, hidden, batch.labels, batch.text_len)
    return loss, {"loss": loss, "target_tokens": count}



def value_and_grad_params(loss_fn, params):
    """`jax.value_and_grad` over a param pytree that may contain integer
    leaves (prequantized int8/int4 frozen modules, e.g. --tower_int8).

    Integer leaves get `float0` tangents under `allow_int=True`; they are
    replaced with same-dtype zeros so optax's masked set_to_zero branch and
    the `p + u` update stay well-typed (frozen leaves update by exact 0)."""
    out, grads = jax.value_and_grad(loss_fn, has_aux=True, allow_int=True)(params)

    def fix(g, p):
        if getattr(g, "dtype", None) == jax.dtypes.float0:
            # float zeros: optax's global-norm clipping divides grads by a
            # float norm before the mask zeroes frozen updates; the final
            # `p + u.astype(p.dtype)` lands back on the integer param
            return jnp.zeros(p.shape, jnp.float32)
        return g

    return out, jax.tree.map(fix, grads, params)


def make_text_train_step(cfg: VLMConfig, opt_cfg: OptimizerConfig):
    def train_step(state: "TrainState", batch: TextBatch):
        def loss_fn(params):
            return text_loss(params, cfg, batch)

        (loss, metrics), grads = value_and_grad_params(loss_fn, state.params)
        optimizer = build_optimizer(state.params, opt_cfg)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return train_step


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_train_step(cfg: VLMConfig, opt_cfg: OptimizerConfig, *, nseg: int,
                    drop_frames: bool = False):
    """Build the jittable train step (grads -> clipped, grouped AdamW)."""

    def train_step(state: TrainState, batch: TrainBatch):
        def loss_fn(params):
            return multimodal_loss(params, cfg, batch, nseg=nseg,
                                   drop_frames=drop_frames)

        (loss, metrics), grads = value_and_grad_params(loss_fn, state.params)
        optimizer = build_optimizer(state.params, opt_cfg)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm)
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return train_step


def init_train_state(params, opt_cfg: OptimizerConfig) -> TrainState:
    optimizer = build_optimizer(params, opt_cfg)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
