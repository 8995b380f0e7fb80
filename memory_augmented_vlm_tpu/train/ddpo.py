"""DDPO — Denoising Diffusion Policy Optimization (the reference's vendored
`trl/trainer/ddpo_trainer.py:55-604` + `PerPromptStatTracker`,
trl/trainer/utils.py:560-598).

Semantics mirrored:
  - sample rollouts: each denoising step t is one "action" with a stored
    log-prob; trajectories carry (latents[t], timesteps[t], next_latents[t],
    log_probs[t]) (ddpo_trainer.py:429-489);
  - per-prompt advantage normalization via a bounded reward buffer with a
    global fallback below `min_count` (utils.py:576-595), else global
    whitening (ddpo_trainer.py:276-279);
  - PPO-style clipped importance-weighted loss over re-evaluated step
    log-probs, with advantage clamping, approx-KL = 0.5*mean((dlp)^2) and
    clipfrac diagnostics (ddpo_trainer.py:325-403);
  - inner epochs re-shuffle the sample batch AND independently permute each
    sample's timestep axis before rebatching to `train_batch_size`
    (ddpo_trainer.py:289-316).

TPU-native shape: the reference hardcodes a HF diffusers StableDiffusion
pipeline; diffusion itself is out of this framework's model zoo, so the
trainer is GENERIC over a user-supplied sampler/log-prob pair:

  sample_fn(params, rng, prompt_embeds, num_steps)
      -> dict(latents (B, T+1, ...), timesteps (B, T), log_probs (B, T)),
         plus anything the reward needs under "images"
  logprob_fn(params, latents, timesteps, next_latents, prompt_embeds)
      -> (B,) log prob of next_latents given latents at timesteps —
         DIFFERENTIABLE wrt params (the policy gradient flows through it)

The inner optimization is ONE jitted step (loss + grads + AdamW update);
rollout bookkeeping (stat tracker, shuffles, rebatching) stays on host,
like the reference's accelerator loop.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax


class PerPromptStatTracker:
    """trl/trainer/utils.py:560-598, verbatim semantics."""

    def __init__(self, buffer_size: int, min_count: int):
        self.buffer_size = buffer_size
        self.min_count = min_count
        self.stats: Dict[str, deque] = {}

    def update(self, prompts: Sequence[str], rewards) -> np.ndarray:
        prompts = np.array(prompts)
        rewards = np.array(rewards, np.float64)
        advantages = np.empty_like(rewards)
        for prompt in np.unique(prompts):
            prompt_rewards = rewards[prompts == prompt]
            buf = self.stats.setdefault(str(prompt),
                                        deque(maxlen=self.buffer_size))
            buf.extend(prompt_rewards)
            if len(buf) < self.min_count:
                mean, std = np.mean(rewards), np.std(rewards) + 1e-6
            else:
                mean, std = np.mean(buf), np.std(buf) + 1e-6
            advantages[prompts == prompt] = (prompt_rewards - mean) / std
        return advantages

    def get_stats(self):
        return {k: {"mean": np.mean(v), "std": np.std(v), "count": len(v)}
                for k, v in self.stats.items()}


def ddpo_loss(advantages: jax.Array, clip_range: float,
              ratio: jax.Array) -> jax.Array:
    """ddpo_trainer.py:391-403: max of unclipped/clipped -A*ratio."""
    unclipped = -advantages * ratio
    clipped = -advantages * jnp.clip(ratio, 1.0 - clip_range,
                                     1.0 + clip_range)
    return jnp.mean(jnp.maximum(unclipped, clipped))


def calculate_loss(log_prob: jax.Array, old_log_prob: jax.Array,
                   advantages: jax.Array, *, clip_range: float,
                   adv_clip_max: float) -> Tuple[jax.Array, jax.Array,
                                                 jax.Array]:
    """ddpo_trainer.py:325-389 tail: advantage clamp -> ratio -> clipped
    loss, approx_kl, clipfrac."""
    advantages = jnp.clip(advantages, -adv_clip_max, adv_clip_max)
    ratio = jnp.exp(log_prob - old_log_prob)
    loss = ddpo_loss(advantages, clip_range, ratio)
    approx_kl = 0.5 * jnp.mean((log_prob - old_log_prob) ** 2)
    clipfrac = jnp.mean((jnp.abs(ratio - 1.0) > clip_range)
                        .astype(jnp.float32))
    return loss, approx_kl, clipfrac


@dataclasses.dataclass
class DDPOConfig:
    """The reference DDPOConfig knobs that survive the framework swap."""
    sample_num_steps: int = 10
    sample_batch_size: int = 4
    sample_num_batches_per_epoch: int = 2
    train_batch_size: int = 4
    train_num_inner_epochs: int = 1
    train_learning_rate: float = 3e-4
    train_adam_beta1: float = 0.9
    train_adam_beta2: float = 0.999
    train_adam_weight_decay: float = 1e-4
    train_adam_epsilon: float = 1e-8
    train_clip_range: float = 1e-4
    train_adv_clip_max: float = 5.0
    per_prompt_stat_tracking: bool = False
    per_prompt_stat_tracking_buffer_size: int = 16
    per_prompt_stat_tracking_min_count: int = 16
    seed: int = 0


class DDPOTrainer:
    def __init__(
        self,
        config: DDPOConfig,
        params: Any,
        *,
        sample_fn: Callable[..., Dict[str, Any]],
        logprob_fn: Callable[..., jax.Array],
        prompt_fn: Callable[[], Tuple[str, Any]],
        reward_fn: Callable[[Any, Sequence[str], Sequence[Any]],
                            Tuple[np.ndarray, Any]],
        embed_fn: Callable[[Sequence[str]], jax.Array],
    ) -> None:
        self.config = config
        self.params = params
        self.sample_fn = sample_fn
        self.logprob_fn = logprob_fn
        self.prompt_fn = prompt_fn
        self.reward_fn = reward_fn
        self.embed_fn = embed_fn
        self.stat_tracker = (
            PerPromptStatTracker(config.per_prompt_stat_tracking_buffer_size,
                                 config.per_prompt_stat_tracking_min_count)
            if config.per_prompt_stat_tracking else None)
        self._rng = jax.random.key(config.seed)
        self._np_rng = np.random.default_rng(config.seed)
        self.optimizer = optax.adamw(
            config.train_learning_rate,
            b1=config.train_adam_beta1, b2=config.train_adam_beta2,
            eps=config.train_adam_epsilon,
            weight_decay=config.train_adam_weight_decay)
        self.opt_state = self.optimizer.init(params)
        self._jit_step = jax.jit(self._train_step)

    def _next_key(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- jitted inner update ------------------------------------------------
    def _train_step(self, params, opt_state, batch):
        def loss_fn(p):
            log_prob = self.logprob_fn(
                p, batch["latents"], batch["timesteps"],
                batch["next_latents"], batch["prompt_embeds"])
            loss, kl, clipfrac = calculate_loss(
                log_prob, batch["log_probs"], batch["advantages"],
                clip_range=self.config.train_clip_range,
                adv_clip_max=self.config.train_adv_clip_max)
            return loss, (kl, clipfrac)

        (loss, (kl, clipfrac)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "approx_kl": kl,
                                   "clipfrac": clipfrac}

    # -- rollout ------------------------------------------------------------
    def _generate_samples(self, iterations: int, batch_size: int):
        """ddpo_trainer.py:429-489: per iteration draw prompts, embed, run
        the sampler, slice latents into (before, after) step pairs."""
        samples: List[Dict[str, Any]] = []
        prompt_image_data: List[List[Any]] = []
        for _ in range(iterations):
            prompts, metadata = zip(*[self.prompt_fn()
                                      for _ in range(batch_size)])
            embeds = self.embed_fn(prompts)
            out = self.sample_fn(self.params, self._next_key(), embeds,
                                 self.config.sample_num_steps)
            latents = np.asarray(out["latents"])       # (B, T+1, ...)
            samples.append({
                "prompts": np.array(prompts),
                "prompt_embeds": np.asarray(embeds),
                "timesteps": np.asarray(out["timesteps"]),
                "latents": latents[:, :-1],
                "next_latents": latents[:, 1:],
                "log_probs": np.asarray(out["log_probs"]),
            })
            prompt_image_data.append([out.get("images"), prompts, metadata])
        return samples, prompt_image_data

    def compute_rewards(self, prompt_image_pairs):
        rewards, metas = [], []
        for images, prompts, metadata in prompt_image_pairs:
            reward, meta = self.reward_fn(images, prompts, metadata)
            rewards.append(np.asarray(reward, np.float64))
            metas.append(meta)
        return rewards, metas

    # -- one epoch-level step (reference `step`) ----------------------------
    def step(self, epoch: int, global_step: int) -> Tuple[int, Dict]:
        cfg = self.config
        samples, prompt_image_data = self._generate_samples(
            cfg.sample_num_batches_per_epoch, cfg.sample_batch_size)
        flat = {k: np.concatenate([s[k] for s in samples])
                for k in samples[0]}
        rewards_list, _ = self.compute_rewards(prompt_image_data)
        rewards = np.concatenate(rewards_list)

        if self.stat_tracker is not None:
            advantages = self.stat_tracker.update(
                [str(p) for p in flat["prompts"]], rewards)
        else:
            advantages = (rewards - rewards.mean()) / (rewards.std() + 1e-8)
        flat["advantages"] = advantages.astype(np.float32)
        prompts = flat.pop("prompts")

        total, num_t = flat["timesteps"].shape
        metrics: Dict[str, float] = {"reward_mean": float(rewards.mean()),
                                     "reward_std": float(rewards.std())}
        for _ in range(cfg.train_num_inner_epochs):
            perm = self._np_rng.permutation(total)
            flat = {k: v[perm] for k, v in flat.items()}
            # independent per-sample timestep permutation
            # (ddpo_trainer.py:296-305)
            perms = np.stack([self._np_rng.permutation(num_t)
                              for _ in range(total)])
            rows = np.arange(total)[:, None]
            for key in ("timesteps", "latents", "next_latents", "log_probs"):
                flat[key] = flat[key][rows, perms]

            # rebatch to train_batch_size; every timestep is its own
            # training example (the reference loops j over the time axis
            # inside _train_batched_samples — flattening (b, t) into the
            # batch is the jit-friendly equivalent of that inner loop)
            n_batches = total // cfg.train_batch_size
            for i in range(n_batches):
                sl = slice(i * cfg.train_batch_size,
                           (i + 1) * cfg.train_batch_size)
                for t in range(num_t):
                    batch = {
                        "latents": jnp.asarray(flat["latents"][sl, t]),
                        "next_latents": jnp.asarray(
                            flat["next_latents"][sl, t]),
                        "timesteps": jnp.asarray(flat["timesteps"][sl, t]),
                        "log_probs": jnp.asarray(
                            flat["log_probs"][sl, t], jnp.float32),
                        "advantages": jnp.asarray(flat["advantages"][sl]),
                        "prompt_embeds": jnp.asarray(
                            flat["prompt_embeds"][sl]),
                    }
                    self.params, self.opt_state, m = self._jit_step(
                        self.params, self.opt_state, batch)
                    global_step += 1
            metrics.update({k: float(v) for k, v in m.items()})
        return global_step, metrics

    def train(self, epochs: int):
        global_step = 0
        history = []
        for epoch in range(epochs):
            global_step, metrics = self.step(epoch, global_step)
            history.append(metrics)
        return history
