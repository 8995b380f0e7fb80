"""DPO training — the capability of the reference's `train_dpo.py` +
vendored TRL `DPOTrainer` (SURVEY.md §2.7), on the TPU harness.

Loss replicates trl/trainer/dpo_trainer.py:730-793,945-957:
  logits   = (pol_chosen_lp - pol_rejected_lp) - (ref_chosen_lp - ref_rejected_lp)
  dpo      = -logsigmoid(beta * logits) * (1 - ls) - logsigmoid(-beta * logits) * ls
  total    = dpo_alpha * dpo + gamma * sft(chosen)
with rewards beta * (policy - reference) for logging.

The reference policy is a frozen copy of the initial params (standard DPO);
both policies share the vision/memory fusion spine.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.train import trainer as trainer_mod
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig, build_optimizer


@dataclasses.dataclass(frozen=True)
class DPOConfig:
    beta: float = 0.1
    dpo_alpha: float = 1.0
    gamma: float = 1.0          # SFT-loss weight on the chosen response
    label_smoothing: float = 0.0


class DPOBatch(NamedTuple):
    """Paired preference batch; chosen/rejected share the visual context."""

    pixels: jax.Array
    frame_indices: jax.Array
    frame_valid: jax.Array
    fine_idx: jax.Array
    chosen_ids: jax.Array       # (B, St)
    chosen_labels: jax.Array
    rejected_ids: jax.Array
    rejected_labels: jax.Array
    image_pos: jax.Array
    chosen_len: jax.Array
    rejected_len: jax.Array


def sequence_logprob(params, cfg: VLMConfig, hidden, labels, valid_len):
    """Sum of target-token logprobs over supervised positions (per sample)."""
    b, s, _ = hidden.shape
    logits = qwen2.unembed(params["language_model"], cfg.lm, hidden)
    targets = jnp.concatenate(
        [labels[:, 1:], jnp.full((b, 1), constants.IGNORE_INDEX, labels.dtype)], axis=1)
    mask = (targets != constants.IGNORE_INDEX) & (
        jnp.arange(s)[None, :] < (valid_len[:, None] - 1))
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, jnp.clip(targets, 0)[..., None], axis=-1)[..., 0]
    return ((tgt - logz) * mask).sum(axis=-1), mask.sum(axis=-1)


def dpo_loss(policy_chosen_lp, policy_rejected_lp, ref_chosen_lp,
             ref_rejected_lp, cfg: DPOConfig):
    """Sigmoid DPO with label smoothing (dpo_trainer.py:730-793)."""
    pi_logratios = policy_chosen_lp - policy_rejected_lp
    ref_logratios = ref_chosen_lp - ref_rejected_lp
    logits = pi_logratios - ref_logratios
    ls = cfg.label_smoothing
    losses = (
        -jax.nn.log_sigmoid(cfg.beta * logits) * (1 - ls)
        - jax.nn.log_sigmoid(-cfg.beta * logits) * ls
    )
    chosen_rewards = cfg.beta * jax.lax.stop_gradient(policy_chosen_lp - ref_chosen_lp)
    rejected_rewards = cfg.beta * jax.lax.stop_gradient(
        policy_rejected_lp - ref_rejected_lp)
    return losses, chosen_rewards, rejected_rewards


def _forward_response(params, cfg: VLMConfig, visual, ids, labels, image_pos,
                      text_len):
    text_embeds = qwen2.embed_tokens(
        params["language_model"], jnp.clip(ids, 0), cfg.lm).astype(visual.dtype)
    embeds, lab = trainer_mod._splice_batched(
        text_embeds, visual, image_pos, labels, constants.IGNORE_INDEX)
    valid_len = text_len + visual.shape[1]
    positions = jnp.broadcast_to(jnp.arange(embeds.shape[1])[None], embeds.shape[:2])
    hidden, _ = qwen2.forward(
        params["language_model"], cfg.lm, embeds, positions, valid_len=valid_len,
        remat=True, differentiable_attention=True)
    return hidden, lab, valid_len


def dpo_forward(params, ref_params, cfg: VLMConfig, dpo_cfg: DPOConfig,
                batch: DPOBatch, *, nseg: int):
    """Full DPO objective for one batch. Returns (loss, metrics)."""
    b, fmax = batch.pixels.shape[:2]
    pix = batch.pixels.reshape((b * fmax,) + batch.pixels.shape[2:])
    from memory_augmented_vlm_tpu.models import vlm as vlm_mod

    feats = vlm_mod.encode_frames(params, cfg, pix)
    feats = feats.reshape(b, fmax, feats.shape[-2], feats.shape[-1])

    def per_sample(f, fi, fv, fx):
        return vlm_mod.build_video_embeds(params, cfg, f, fi, fv, fx, nseg)

    visual = jax.vmap(per_sample)(
        feats, batch.frame_indices, batch.frame_valid, batch.fine_idx)

    lps = {}
    for name, p in (("policy", params), ("ref", ref_params)):
        maybe_stop = (lambda x: x) if name == "policy" else jax.lax.stop_gradient
        for side, ids, labels, tl in (
            ("chosen", batch.chosen_ids, batch.chosen_labels, batch.chosen_len),
            ("rejected", batch.rejected_ids, batch.rejected_labels, batch.rejected_len),
        ):
            hidden, lab, vl = _forward_response(
                p, cfg, maybe_stop(visual), ids, labels, batch.image_pos, tl)
            lp, cnt = sequence_logprob(p, cfg, hidden, lab, vl)
            lps[(name, side)] = maybe_stop(lp)
            if name == "policy" and side == "chosen":
                sft_hidden, sft_lab, sft_vl = hidden, lab, vl

    losses, cr, rr = dpo_loss(
        lps[("policy", "chosen")], lps[("policy", "rejected")],
        lps[("ref", "chosen")], lps[("ref", "rejected")], dpo_cfg)
    sft_loss, _ = trainer_mod.cross_entropy(params, cfg, sft_hidden, sft_lab, sft_vl)
    total = dpo_cfg.dpo_alpha * losses.mean() + dpo_cfg.gamma * sft_loss
    metrics = {
        "loss": total,
        "dpo_loss": losses.mean(),
        "sft_loss": sft_loss,
        "rewards_chosen": cr.mean(),
        "rewards_rejected": rr.mean(),
        "reward_margin": (cr - rr).mean(),
        "reward_accuracy": (cr > rr).mean(),
    }
    return total, metrics


def make_dpo_train_step(cfg: VLMConfig, opt_cfg: OptimizerConfig,
                        dpo_cfg: DPOConfig, *, nseg: int):
    def step(state: trainer_mod.TrainState, ref_params, batch: DPOBatch):
        def loss_fn(p):
            return dpo_forward(p, ref_params, cfg, dpo_cfg, batch, nseg=nseg)

        (loss, metrics), grads = trainer_mod.value_and_grad_params(loss_fn, state.params)
        optimizer = build_optimizer(state.params, opt_cfg)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return trainer_mod.TrainState(new_params, new_opt, state.step + 1), metrics

    return step
