"""Reward-model training — the capability of the reference's vendored TRL
`RewardTrainer` (trl/trainer/reward_trainer.py:60-257), on the TPU harness.

Loss replicates reward_trainer.py:196-225:
  loss = -logsigmoid(r_chosen - r_rejected [- margin]).mean()
with the reward read from a scalar head over the LAST valid token's hidden
state (TRL uses AutoModelForSequenceClassification on causal LMs, whose
score head pools the last non-pad position).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.train import trainer as trainer_mod
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig, build_optimizer
from memory_augmented_vlm_tpu.train.ppo import init_value_head, value_head


class RewardBatch(NamedTuple):
    """Paired preference batch of plain token sequences (right-padded)."""

    chosen_ids: jax.Array      # (B, S) int32
    chosen_len: jax.Array      # (B,)
    rejected_ids: jax.Array    # (B, S)
    rejected_len: jax.Array    # (B,)
    margin: Optional[jax.Array] = None   # (B,) optional score margin


def sequence_reward(params, cfg: VLMConfig, input_ids, valid_len):
    """Scalar reward per sequence: decoder forward -> value head at the last
    valid position (the sequence-classification pooling rule)."""
    embeds = qwen2.embed_tokens(params["language_model"], input_ids, cfg.lm)
    if cfg.lm.dtype == "bfloat16" and jax.default_backend() == "tpu":
        embeds = embeds.astype(jnp.bfloat16)
    positions = jnp.broadcast_to(
        jnp.arange(embeds.shape[1])[None], embeds.shape[:2])
    hidden, _ = qwen2.forward(
        params["language_model"], cfg.lm, embeds, positions,
        valid_len=valid_len, remat=True, differentiable_attention=True)
    scores = value_head(params["value_head"], hidden)         # (B, S)
    last = jnp.clip(valid_len - 1, 0, scores.shape[1] - 1)
    return jnp.take_along_axis(scores, last[:, None], axis=1)[:, 0]


def reward_loss(rewards_chosen, rewards_rejected, margin=None):
    """reward_trainer.py:214-218."""
    delta = rewards_chosen - rewards_rejected
    if margin is not None:
        delta = delta - margin
    return -jnp.mean(jax.nn.log_sigmoid(delta))


def init_reward_params(cfg: VLMConfig, lm_params, key: jax.Array,
                       dtype=jnp.float32):
    """Attach a fresh scalar head to existing LM params."""
    return {"language_model": lm_params,
            "value_head": init_value_head(cfg.lm.hidden_size, key, dtype)}


def make_reward_train_step(cfg: VLMConfig, opt_cfg: OptimizerConfig):
    def step(state: trainer_mod.TrainState, batch: RewardBatch):
        def loss_fn(params):
            rc = sequence_reward(params, cfg, batch.chosen_ids, batch.chosen_len)
            rr = sequence_reward(params, cfg, batch.rejected_ids,
                                 batch.rejected_len)
            loss = reward_loss(rc, rr, batch.margin)
            acc = jnp.mean((rc > rr).astype(jnp.float32))
            return loss, {"loss": loss, "rewards/chosen": rc.mean(),
                          "rewards/rejected": rr.mean(),
                          "rewards/accuracies": acc,
                          "rewards/margins": (rc - rr).mean()}

        (loss, metrics), grads = trainer_mod.value_and_grad_params(
            loss_fn, state.params)
        optimizer = build_optimizer(state.params, opt_cfg)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return trainer_mod.TrainState(new_params, new_opt, state.step + 1), metrics

    return step
