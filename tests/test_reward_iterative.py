"""Reward trainer + iterative SFT parity/behavior tests
(reference trl/trainer/reward_trainer.py, iterative_sft_trainer.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.train import iterative_sft, reward
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig

TINY_LM = dict(vocab_size=50000, hidden_size=32, intermediate_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
               tie_word_embeddings=True, dtype="float32")


@pytest.fixture(scope="module")
def tiny():
    lm_cfg = LMConfig(**TINY_LM)
    cfg = VLMConfig(lm=lm_cfg)
    params = reward.init_reward_params(
        cfg, qwen2.init_params(lm_cfg, jax.random.key(0)), jax.random.key(1))
    return cfg, params


def test_reward_loss_matches_trl_formula():
    """reward_trainer.py:214-218: -logsigmoid(chosen - rejected [- margin])."""
    rng = np.random.default_rng(0)
    rc = rng.standard_normal(8).astype(np.float32)
    rr = rng.standard_normal(8).astype(np.float32)
    m = rng.standard_normal(8).astype(np.float32)
    want = (-F.logsigmoid(torch.from_numpy(rc) - torch.from_numpy(rr))).mean()
    got = reward.reward_loss(jnp.asarray(rc), jnp.asarray(rr))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    want_m = (-F.logsigmoid(torch.from_numpy(rc) - torch.from_numpy(rr)
                            - torch.from_numpy(m))).mean()
    got_m = reward.reward_loss(jnp.asarray(rc), jnp.asarray(rr), jnp.asarray(m))
    np.testing.assert_allclose(float(got_m), float(want_m), rtol=1e-6)


def test_sequence_reward_pools_last_valid_token(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, 1000, size=(2, 12)), jnp.int32)
    # same ids, different valid lengths -> different pooled rewards
    r_a = reward.sequence_reward(params, cfg, ids, jnp.asarray([12, 12]))
    r_b = reward.sequence_reward(params, cfg, ids, jnp.asarray([5, 8]))
    assert r_a.shape == (2,)
    assert not np.allclose(np.asarray(r_a), np.asarray(r_b))
    # right-padding must not change the pooled reward
    ids_pad = jnp.pad(ids, ((0, 0), (0, 4)))
    r_c = reward.sequence_reward(params, cfg, ids_pad, jnp.asarray([12, 12]))
    np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_c),
                               rtol=1e-4, atol=1e-5)


def test_reward_train_step_learns_preference(tiny):
    """A few steps on a fixed pair must push chosen above rejected."""
    cfg, params = tiny
    opt_cfg = OptimizerConfig(
        learning_rate=5e-3, warmup_ratio=0.0, schedule="constant",
        total_steps=30, mm_tunable_parts="mm_language_model,value_head")
    step_fn = jax.jit(reward.make_reward_train_step(cfg, opt_cfg))
    state = iterative_sft.trainer_mod.init_train_state(params, opt_cfg)
    rng = np.random.default_rng(2)
    batch = reward.RewardBatch(
        chosen_ids=jnp.asarray(rng.integers(5, 1000, (2, 10)), jnp.int32),
        chosen_len=jnp.asarray([10, 9], jnp.int32),
        rejected_ids=jnp.asarray(rng.integers(5, 1000, (2, 10)), jnp.int32),
        rejected_len=jnp.asarray([10, 10], jnp.int32),
    )
    first = None
    for _ in range(8):
        state, metrics = step_fn(state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert float(metrics["rewards/accuracies"]) == 1.0


def test_prepare_model_inputs_trl_semantics():
    ids = [[1, 2, 3, 4, 5, 6], [7, 8]]
    # labels default to input_ids; pad/mask positions -> IGNORE_INDEX
    out_ids, out_labs, lens = iterative_sft.prepare_model_inputs(ids)
    assert lens.tolist() == [6, 2]
    assert out_labs[1, 2] == constants.IGNORE_INDEX
    np.testing.assert_array_equal(out_labs[0, :6], ids[0])
    # attention_mask zeroes become IGNORE in labels
    _, labs_m, _ = iterative_sft.prepare_model_inputs(
        ids, attention_mask=[[1, 1, 0, 1, 1, 1], [1, 1]])
    assert labs_m[0, 2] == constants.IGNORE_INDEX
    # truncation_mode keep_end vs keep_start (prepare_model_inputs:144-151)
    ke, _, lke = iterative_sft.prepare_model_inputs(
        ids, max_length=4, truncation_mode="keep_end")
    np.testing.assert_array_equal(ke[0, :4], [3, 4, 5, 6])
    ks, _, _ = iterative_sft.prepare_model_inputs(
        ids, max_length=4, truncation_mode="keep_start")
    np.testing.assert_array_equal(ks[0, :4], [1, 2, 3, 4])
    with pytest.raises(ValueError):
        iterative_sft.prepare_model_inputs(ids, max_length=4,
                                           truncation_mode="bogus")


def test_iterative_sft_step_decreases_loss(tiny):
    cfg, _ = tiny
    params = {"language_model": qwen2.init_params(cfg.lm, jax.random.key(3))}
    opt_cfg = OptimizerConfig(
        learning_rate=5e-3, warmup_ratio=0.0, schedule="constant",
        total_steps=50, mm_tunable_parts="mm_language_model")
    tr = iterative_sft.IterativeSFT(cfg, opt_cfg, params, batch_size=2)
    rng = np.random.default_rng(4)
    samples = [list(rng.integers(5, 50, size=rng.integers(6, 12)))
               for _ in range(4)]
    first = tr.step(input_ids=samples)
    for _ in range(4):
        last = tr.step(input_ids=samples)
    assert last["loss"] < first["loss"]
    assert last["step"] == 5 * first["num_minibatches"]
