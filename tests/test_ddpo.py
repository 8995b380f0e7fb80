"""DDPO trainer (train/ddpo.py) — parity with the reference's vendored
trl ddpo_trainer at the semantics level: PerPromptStatTracker buffering,
the clipped importance-weighted loss triple (loss/approx_kl/clipfrac)
pinned against a torch re-computation, timestep-permutation plumbing, and
end-to-end improvement on a toy Gaussian denoising policy."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.train import ddpo


def test_per_prompt_stat_tracker_reference_semantics():
    """utils.py:576-595: below min_count the GLOBAL batch stats whiten the
    prompt's rewards; at/after min_count the prompt's own buffer does, and
    the buffer is bounded."""
    tr = ddpo.PerPromptStatTracker(buffer_size=4, min_count=3)
    prompts = ["a", "a", "b"]
    rewards = np.array([1.0, 2.0, 10.0])
    adv = tr.update(prompts, rewards)
    g_mean, g_std = rewards.mean(), rewards.std() + 1e-6
    np.testing.assert_allclose(adv, (rewards - g_mean) / g_std, rtol=1e-12)

    # second update pushes prompt 'a' to 4 >= min_count -> its own buffer
    adv2 = tr.update(["a", "a"], np.array([3.0, 4.0]))
    buf = np.array([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(
        adv2, (np.array([3.0, 4.0]) - buf.mean()) / (buf.std() + 1e-6),
        rtol=1e-12)

    # buffer_size=4 bounds the deque: two more evict 1.0 and 2.0
    tr.update(["a", "a"], np.array([5.0, 6.0]))
    assert tr.get_stats()["a"]["count"] == 4
    np.testing.assert_allclose(tr.get_stats()["a"]["mean"], 4.5)


def test_calculate_loss_matches_torch():
    """ddpo_trainer.py:371-403: advantage clamp -> ratio -> clipped loss,
    approx_kl, clipfrac — recomputed in torch with the reference formula."""
    rng = np.random.default_rng(0)
    lp_new = rng.standard_normal(16)
    lp_old = lp_new + rng.standard_normal(16) * 0.3
    adv = rng.standard_normal(16) * 8  # exercises the +/-5 clamp
    clip_range, adv_max = 0.2, 5.0

    loss, kl, clipfrac = ddpo.calculate_loss(
        jnp.asarray(lp_new), jnp.asarray(lp_old), jnp.asarray(adv),
        clip_range=clip_range, adv_clip_max=adv_max)

    t_new, t_old = torch.tensor(lp_new), torch.tensor(lp_old)
    t_adv = torch.clamp(torch.tensor(adv), -adv_max, adv_max)
    ratio = torch.exp(t_new - t_old)
    unclipped = -t_adv * ratio
    clipped = -t_adv * torch.clamp(ratio, 1 - clip_range, 1 + clip_range)
    ref_loss = torch.mean(torch.maximum(unclipped, clipped))
    ref_kl = 0.5 * torch.mean((t_new - t_old) ** 2)
    ref_clipfrac = torch.mean(
        (torch.abs(ratio - 1.0) > clip_range).float())
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(float(kl), float(ref_kl), rtol=1e-6)
    np.testing.assert_allclose(float(clipfrac), float(ref_clipfrac),
                               rtol=1e-6)


def _toy_policy():
    """1-D Gaussian 'denoising': each step moves the latent toward a
    learnable per-prompt target mu with fixed noise. logprob is the exact
    normal density, differentiable in mu — a minimal diffusion stand-in."""
    sigma = 0.3

    def sample_fn(params, rng, prompt_embeds, num_steps):
        b = prompt_embeds.shape[0]
        mu = prompt_embeds @ params["mu"]             # (B,)
        lat = [jnp.zeros((b,))]
        lps = []
        for t in range(num_steps):
            rng, sub = jax.random.split(rng)
            mean = lat[-1] + 0.5 * (mu - lat[-1])
            nxt = mean + sigma * jax.random.normal(sub, (b,))
            lps.append(-0.5 * ((nxt - mean) / sigma) ** 2
                       - jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi))
            lat.append(nxt)
        return {"latents": jnp.stack(lat, 1), "log_probs": jnp.stack(lps, 1),
                "timesteps": jnp.broadcast_to(jnp.arange(num_steps)[None],
                                              (b, num_steps)),
                "images": lat[-1]}

    def logprob_fn(params, latents, timesteps, next_latents, prompt_embeds):
        mu = prompt_embeds @ params["mu"]
        mean = latents + 0.5 * (mu - latents)
        return (-0.5 * ((next_latents - mean) / sigma) ** 2
                - jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi))

    return sample_fn, logprob_fn


def test_ddpo_training_improves_toy_reward():
    """End to end: reward = -|final latent - 2.0|; the learnable target mu
    starts at 0 and must move toward 2 under the clipped policy gradient."""
    sample_fn, logprob_fn = _toy_policy()
    cfg = ddpo.DDPOConfig(
        sample_num_steps=4, sample_batch_size=8,
        sample_num_batches_per_epoch=2, train_batch_size=8,
        train_num_inner_epochs=1, train_learning_rate=0.05,
        train_clip_range=0.2, seed=0)
    params = {"mu": jnp.zeros((2,))}
    trainer = ddpo.DDPOTrainer(
        cfg, params,
        sample_fn=sample_fn, logprob_fn=logprob_fn,
        prompt_fn=lambda: ("go", None),
        reward_fn=lambda images, prompts, meta:
            (-np.abs(np.asarray(images) - 2.0), None),
        embed_fn=lambda prompts: jnp.ones((len(prompts), 2)) * 0.5)
    history = trainer.train(12)
    mu_eff = float(jnp.sum(trainer.params["mu"]) * 0.5)
    assert mu_eff > 0.8, (mu_eff, history[-1])
    assert history[-1]["reward_mean"] > history[0]["reward_mean"] + 0.3
    assert np.isfinite(history[-1]["loss"])


def test_ddpo_per_prompt_tracking_and_plumbing():
    """per_prompt_stat_tracking path + the timestep-permutation/rebatch
    plumbing run with multiple prompts and train_batch_size != sample
    batch; metrics stay finite and steps count up."""
    sample_fn, logprob_fn = _toy_policy()
    cfg = ddpo.DDPOConfig(
        sample_num_steps=3, sample_batch_size=4,
        sample_num_batches_per_epoch=2, train_batch_size=2,
        train_num_inner_epochs=2, train_learning_rate=0.01,
        per_prompt_stat_tracking=True,
        per_prompt_stat_tracking_buffer_size=8,
        per_prompt_stat_tracking_min_count=2, seed=1)
    prompts = iter(["a", "b"] * 1000)
    trainer = ddpo.DDPOTrainer(
        cfg, {"mu": jnp.zeros((2,))},
        sample_fn=sample_fn, logprob_fn=logprob_fn,
        prompt_fn=lambda: (next(prompts), None),
        reward_fn=lambda images, prompts_, meta:
            (-np.abs(np.asarray(images) - 1.0), None),
        embed_fn=lambda ps: jnp.asarray(
            [[1.0, 0.0] if p == "a" else [0.0, 1.0] for p in ps]))
    step, metrics = trainer.step(0, 0)
    # 8 samples / batch 2 = 4 batches x 3 timesteps x 2 inner epochs
    assert step == 24
    assert np.isfinite(metrics["loss"])
    stats = trainer.stat_tracker.get_stats()
    assert set(stats) == {"a", "b"}
    assert stats["a"]["count"] == 4  # 8 rollouts split across two prompts
