"""PPO training — the capability of the reference's vendored TRL
`PPOTrainer` (trl/trainer/ppo_trainer.py, 1,397 LoC) on the TPU harness.

Re-derives the trainer's math as pure jnp functions:
  - per-token rewards = -kl_coef * KL(policy || ref) with the reward-model
    score added at the last response token (ppo_trainer.py:1031-1067);
    KL penalty variants kl/abs/mse (ppo_trainer.py:1069-1083)
  - GAE advantages with masked whitening (ppo_trainer.py:1085-1111) as a
    reversed `lax.scan`
  - clipped-surrogate policy loss + clipped value loss + ratio-threshold
    batch skip (ppo_trainer.py:1113-1198)
  - Adaptive / Fixed KL controllers (trl/trainer/utils.py:35-60) — host-side
    Python state, updated between jitted steps
  - ValueHead: scalar head over decoder hidden states
    (trl/models/modeling_value_head.py:21-51)

Parity is pinned against the reference TRL functions in
tests/test_ppo_sft.py (fp32, rtol 1e-5).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.train import trainer as trainer_mod
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig, build_optimizer


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Knobs mirroring trl PPOConfig defaults (trl/trainer/ppo_config.py)."""

    gamma: float = 1.0
    lam: float = 0.95
    cliprange: float = 0.2
    cliprange_value: float = 0.2
    vf_coef: float = 0.1
    kl_penalty: str = "kl"        # kl | abs | mse | full ("full" uses the
                                  # exact per-token KL computed at rollout
                                  # time — PPOBatch.full_kls)
    init_kl_coef: float = 0.2
    adap_kl_ctrl: bool = True
    target: float = 6.0
    horizon: float = 10000.0
    whiten_rewards: bool = False
    ratio_threshold: float = 10.0


# ---------------------------------------------------------------------------
# Masked statistics (trl/core.py:147-193)
# ---------------------------------------------------------------------------

def masked_mean(values, mask, axis=None):
    return (values * mask).sum(axis=axis) / mask.sum(axis=axis)


def masked_var(values, mask, unbiased: bool = True):
    mean = masked_mean(values, mask)
    variance = masked_mean((values - mean) ** 2, mask)
    if unbiased:
        n = mask.sum()
        variance = variance * (n / (n - 1))
    return variance


def masked_whiten(values, mask, shift_mean: bool = True):
    mean, var = masked_mean(values, mask), masked_var(values, mask)
    whitened = (values - mean) * jax.lax.rsqrt(var + 1e-8)
    if not shift_mean:
        whitened = whitened + mean
    return whitened


def entropy_from_logits(logits):
    pd = jax.nn.softmax(logits, axis=-1)
    return jax.nn.logsumexp(logits, axis=-1) - jnp.sum(pd * logits, axis=-1)


# ---------------------------------------------------------------------------
# KL controllers (host-side; trl/trainer/utils.py:35-60)
# ---------------------------------------------------------------------------

class AdaptiveKLController:
    def __init__(self, init_kl_coef: float, target: float, horizon: float):
        self.value = init_kl_coef
        self.target = target
        self.horizon = horizon

    def update(self, current: float, n_steps: int) -> None:
        proportional_error = float(np.clip(current / self.target - 1, -0.2, 0.2))
        self.value *= 1 + proportional_error * n_steps / self.horizon


class FixedKLController:
    def __init__(self, kl_coef: float):
        self.value = kl_coef

    def update(self, current: float, n_steps: int) -> None:
        pass


def make_kl_controller(cfg: PPOConfig):
    if cfg.adap_kl_ctrl:
        return AdaptiveKLController(cfg.init_kl_coef, cfg.target, cfg.horizon)
    return FixedKLController(cfg.init_kl_coef)


# ---------------------------------------------------------------------------
# Value head (trl/models/modeling_value_head.py)
# ---------------------------------------------------------------------------

def init_value_head(hidden_size: int, key: jax.Array, dtype=jnp.float32):
    return {"summary": {
        "kernel": (jax.random.normal(key, (hidden_size, 1)) / (hidden_size + 1) ** 0.5).astype(dtype),
        "bias": jnp.zeros((1,), dtype),
    }}


def value_head(vh_params, hidden: jax.Array) -> jax.Array:
    """(B, S, H) hidden states -> (B, S) scalar values."""
    out = jnp.einsum("bsh,ho->bso", hidden, vh_params["summary"]["kernel"])
    return (out + vh_params["summary"]["bias"])[..., 0]


def forward_with_value(params, cfg: VLMConfig, embeds, positions, valid_len):
    """Policy forward returning (logits, values) — the
    AutoModelForCausalLMWithValueHead contract on the shared decoder."""
    hidden, _ = qwen2.forward(params["language_model"], cfg.lm, embeds,
                              positions, valid_len=valid_len,
                              differentiable_attention=True)
    logits = qwen2.unembed(params["language_model"], cfg.lm, hidden)
    values = value_head(params["value_head"], hidden.astype(jnp.float32))
    return logits, values


# ---------------------------------------------------------------------------
# Rewards / advantages / loss (ppo_trainer.py:1031-1198)
# ---------------------------------------------------------------------------

def kl_penalty(logprob, ref_logprob, kind: str = "kl"):
    """ppo_trainer.py:1069-1083. kl/abs/mse take realized-token logprobs
    (B, T); `full` takes full log-distributions (B, T, V) and returns the
    exact per-token KL(policy || ref) (the reference's
    F.kl_div(ref_logprob, logprob, log_target=True).sum(-1))."""
    if kind == "kl":
        return logprob - ref_logprob
    if kind == "abs":
        return jnp.abs(logprob - ref_logprob)
    if kind == "mse":
        return 0.5 * jnp.square(logprob - ref_logprob)
    if kind == "full":
        p = jnp.exp(logprob)
        return jnp.sum(p * (logprob - ref_logprob), axis=-1)
    raise NotImplementedError(kind)


def compute_rewards(scores, logprobs, ref_logprobs, masks, kl_coef: float,
                    kind: str = "kl", full_kls=None):
    """scores (B,), logprobs/ref/masks (B, T) -> (rewards, non_score, kls).

    kind="full" (ppo_trainer.py:1079-1082) uses the exact per-token
    KL(policy || ref): pass `full_kls` (B, T) precomputed at rollout time
    via `response_full_kl` (identical math to storing the (B, T, V)
    log-distributions like TRL and reducing here, without carrying
    vocab-sized rollout tensors), or pass (B, T, V) log-distributions as
    logprobs/ref_logprobs directly."""
    if kind == "full":
        if full_kls is not None:
            kls = full_kls
        elif logprobs.ndim == 3:
            kls = kl_penalty(logprobs, ref_logprobs, "full")
        else:
            raise ValueError(
                "kl_penalty='full' needs PPOBatch.full_kls (see "
                "response_full_kl) or (B, T, V) log-distributions")
    else:
        kls = kl_penalty(logprobs, ref_logprobs, kind)
    non_score = -kl_coef * kls
    t = masks.shape[1]
    # last non-masked index per row
    last = (t - 1) - jnp.argmax(jnp.flip(masks, axis=1), axis=1)
    bonus = jax.nn.one_hot(last, t, dtype=scores.dtype) * scores[:, None]
    return non_score + bonus, non_score, kls


def compute_advantages(values, rewards, mask, cfg: PPOConfig):
    """Masked GAE (ppo_trainer.py:1085-1111); returns (values, advantages,
    returns) with advantages whitened and stop-gradiented."""
    values = values * mask
    rewards = rewards * mask
    if cfg.whiten_rewards:
        rewards = masked_whiten(rewards, mask, shift_mean=False)

    t = rewards.shape[1]
    next_values = jnp.concatenate(
        [values[:, 1:], jnp.zeros_like(values[:, :1])], axis=1)
    deltas = rewards + cfg.gamma * next_values - values  # (B, T)

    def gae_body(lastgaelam, delta_t):
        lastgaelam = delta_t + cfg.gamma * cfg.lam * lastgaelam
        return lastgaelam, lastgaelam

    _, adv_rev = jax.lax.scan(gae_body, jnp.zeros(deltas.shape[0]),
                              jnp.flip(deltas, axis=1).T)
    advantages = jnp.flip(adv_rev.T, axis=1)
    returns = advantages + values
    advantages = jax.lax.stop_gradient(masked_whiten(advantages, mask))
    return values, advantages, returns


def ppo_loss(old_logprobs, values, logits, vpreds, logprobs, mask,
             advantages, returns, cfg: PPOConfig):
    """Clipped PPO objective (ppo_trainer.py:1113-1198).

    Returns (pg_loss, vf_coef * vf_loss, stats)."""
    vpredclipped = jnp.clip(vpreds, values - cfg.cliprange_value,
                            values + cfg.cliprange_value)
    vf_losses1 = jnp.square(vpreds - returns)
    vf_losses2 = jnp.square(vpredclipped - returns)
    vf_loss = 0.5 * masked_mean(jnp.maximum(vf_losses1, vf_losses2), mask)
    vf_clipfrac = masked_mean((vf_losses2 > vf_losses1).astype(jnp.float32), mask)

    ratio = jnp.exp(logprobs - old_logprobs)
    pg_losses = -advantages * ratio
    pg_losses2 = -advantages * jnp.clip(ratio, 1.0 - cfg.cliprange,
                                        1.0 + cfg.cliprange)
    pg_loss = masked_mean(jnp.maximum(pg_losses, pg_losses2), mask)
    pg_clipfrac = masked_mean((pg_losses2 > pg_losses).astype(jnp.float32), mask)

    # batch skip on runaway ratios (ppo_trainer.py:1164-1168), branch-free
    avg_ratio = masked_mean(ratio, mask)
    keep = (avg_ratio <= cfg.ratio_threshold).astype(pg_loss.dtype)
    pg_loss = pg_loss * keep
    vf_loss = vf_loss * keep

    stats = {
        "loss/policy": pg_loss,
        "loss/value": cfg.vf_coef * vf_loss,
        "loss/total": pg_loss + cfg.vf_coef * vf_loss,
        "policy/entropy": masked_mean(entropy_from_logits(logits), mask),
        "policy/approxkl": 0.5 * masked_mean(jnp.square(logprobs - old_logprobs), mask),
        "policy/policykl": masked_mean(old_logprobs - logprobs, mask),
        "policy/clipfrac": pg_clipfrac,
        "policy/advantages_mean": masked_mean(advantages, mask),
        "returns/mean": masked_mean(returns, mask),
        "val/vpred": masked_mean(vpreds, mask),
        "val/error": masked_mean(jnp.square(vpreds - returns), mask),
        "val/clipfrac": vf_clipfrac,
    }
    return pg_loss, cfg.vf_coef * vf_loss, stats


# ---------------------------------------------------------------------------
# Train step over the shared decoder (value-head policy)
# ---------------------------------------------------------------------------

class PPOBatch(NamedTuple):
    """One rollout minibatch: full sequences (query + response, right-padded)
    plus frozen rollout-time statistics."""

    input_ids: jax.Array       # (B, S) int32
    response_mask: jax.Array   # (B, T) 1 on response tokens
    query_len: jax.Array       # (B,) response starts here
    seq_len: jax.Array         # (B,) query + response length
    old_logprobs: jax.Array    # (B, T) rollout-time policy logprobs
    old_values: jax.Array      # (B, T) rollout-time value predictions
    scores: jax.Array          # (B,) reward-model scalars
    ref_logprobs: jax.Array    # (B, T) frozen reference logprobs
    # (B, T) exact per-token KL(policy || ref) computed at rollout time
    # (response_full_kl); only consumed when kl_penalty == "full"
    full_kls: Optional[jax.Array] = None


def _response_logprobs(logits, input_ids, query_len, t_max):
    """Per-token logprobs of the realized response tokens.

    Response token j lives at sequence index query_len + j; its predictive
    logits are one position earlier."""
    b, s, _ = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    pos = query_len[:, None] + jnp.arange(t_max)[None, :]          # (B, T)
    pred_rows = jnp.take_along_axis(
        logp, jnp.clip(pos - 1, 0, s - 1)[..., None], axis=1)      # (B, T, V)
    tok = jnp.take_along_axis(input_ids, jnp.clip(pos, 0, s - 1), axis=1)
    lp = jnp.take_along_axis(pred_rows, tok[..., None], axis=-1)[..., 0]
    return lp, pred_rows, pos


def response_full_kl(policy_logits, ref_logits, query_len, t_max):
    """Exact per-token KL(policy || ref) over the response positions.

    policy_logits/ref_logits: (B, S, V) rollout-time logits from the two
    models; returns (B, T). Computing the scalar KL here (at rollout) and
    carrying it in PPOBatch.full_kls reproduces TRL's kl_penalty="full"
    (ppo_trainer.py:1079-1082: F.kl_div(ref, logprob, log_target=True)
    .sum(-1) over stored full log-distributions) without materializing
    (B, T, V) rollout tensors."""
    b, s, _ = policy_logits.shape
    pos = query_len[:, None] + jnp.arange(t_max)[None, :]
    rows = jnp.clip(pos - 1, 0, s - 1)[..., None]
    lp = jnp.take_along_axis(jax.nn.log_softmax(policy_logits, axis=-1),
                             rows, axis=1)
    ref_lp = jnp.take_along_axis(jax.nn.log_softmax(ref_logits, axis=-1),
                                 rows, axis=1)
    return kl_penalty(lp, ref_lp, "full")


def make_ppo_train_step(cfg: VLMConfig, opt_cfg: OptimizerConfig,
                        ppo_cfg: PPOConfig):
    """One PPO optimization step over a rollout minibatch. The kl_coef is a
    traced scalar so the host-side KL controller can update it between steps
    without recompiling."""

    def step(state: trainer_mod.TrainState, batch: PPOBatch, kl_coef):
        t_max = batch.response_mask.shape[1]

        rewards, _, kls = compute_rewards(
            batch.scores, batch.old_logprobs, batch.ref_logprobs,
            batch.response_mask, kl_coef, ppo_cfg.kl_penalty,
            full_kls=batch.full_kls)
        values, advantages, returns = compute_advantages(
            batch.old_values, rewards, batch.response_mask, ppo_cfg)

        def loss_fn(params):
            embeds = qwen2.embed_tokens(
                params["language_model"], batch.input_ids, cfg.lm)
            positions = jnp.broadcast_to(
                jnp.arange(embeds.shape[1])[None], embeds.shape[:2])
            logits, vpreds_all = forward_with_value(
                params, cfg, embeds, positions, batch.seq_len)
            lp, pred_rows, pos = _response_logprobs(
                logits, batch.input_ids, batch.query_len, t_max)
            vpreds = jnp.take_along_axis(
                vpreds_all, jnp.clip(pos - 1, 0, vpreds_all.shape[1] - 1), axis=1)
            pg, vf, stats = ppo_loss(
                batch.old_logprobs, values, pred_rows, vpreds, lp,
                batch.response_mask, advantages, returns, ppo_cfg)
            return pg + vf, stats

        (loss, stats), grads = trainer_mod.value_and_grad_params(loss_fn, state.params)
        optimizer = build_optimizer(state.params, opt_cfg)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype),
                                  state.params, updates)
        stats = dict(stats,
                     objective_kl=masked_mean(kls, batch.response_mask),
                     grad_norm=optax.global_norm(grads))
        return trainer_mod.TrainState(new_params, new_opt, state.step + 1), stats

    return step
