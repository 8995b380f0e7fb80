"""PPO + SFT trainer parity against the reference's vendored TRL
(trl/trainer/ppo_trainer.py, trl/trainer/utils.py, trl/core.py), loaded
directly from the reference tree, plus end-to-end train-step smoke tests on
tiny models."""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig, VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.train import ppo, sft
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig
from memory_augmented_vlm_tpu.train.trainer import TrainState


@pytest.fixture(scope="module")
def ref_trl():
    """Import the reference TRL with its missing CLI dep (tyro) stubbed."""
    if "tyro" not in sys.modules:
        tyro = types.ModuleType("tyro")
        conf = types.ModuleType("tyro.conf")

        class _Suppress:
            def __class_getitem__(cls, item):
                return item

        conf.Suppress = _Suppress
        conf.arg = lambda **k: object()
        tyro.conf = conf
        tyro.cli = lambda *a, **k: None
        sys.modules["tyro"] = tyro
        sys.modules["tyro.conf"] = conf
    sys.path.insert(0, "/root/reference")
    try:
        import trl.core as core
        import trl.trainer.utils as utils
    finally:
        sys.path.pop(0)
    return core, utils


def test_masked_stats_match_trl(ref_trl):
    core, _ = ref_trl
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 12)).astype(np.float32)
    m = (rng.random((4, 12)) > 0.3).astype(np.float32)
    for shift in (True, False):
        want = core.masked_whiten(torch.from_numpy(x), torch.from_numpy(m),
                                  shift_mean=shift).numpy()
        got = np.asarray(ppo.masked_whiten(jnp.asarray(x), jnp.asarray(m),
                                           shift_mean=shift))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    want_e = core.entropy_from_logits(torch.from_numpy(x)).numpy()
    got_e = np.asarray(ppo.entropy_from_logits(jnp.asarray(x)))
    np.testing.assert_allclose(got_e, want_e, rtol=1e-5, atol=1e-5)


def test_adaptive_kl_controller_matches_trl(ref_trl):
    _, utils = ref_trl
    ref = utils.AdaptiveKLController(0.2, target=6.0, horizon=10000)
    got = ppo.AdaptiveKLController(0.2, target=6.0, horizon=10000)
    for current, n in [(9.0, 256), (2.0, 256), (6.0, 128), (30.0, 64)]:
        ref.update(current, n)
        got.update(current, n)
        assert np.isclose(got.value, ref.value, rtol=1e-9)


def _gae_reference(values, rewards, mask, gamma, lam):
    """Literal port of ppo_trainer.py:1085-1111 in numpy for the oracle."""
    values = values * mask
    rewards = rewards * mask
    lastgaelam = 0
    adv_rev = []
    t_len = rewards.shape[-1]
    for t in reversed(range(t_len)):
        nextvalues = values[:, t + 1] if t < t_len - 1 else 0.0
        delta = rewards[:, t] + gamma * nextvalues - values[:, t]
        lastgaelam = delta + gamma * lam * lastgaelam
        adv_rev.append(lastgaelam)
    adv = np.stack(adv_rev[::-1], axis=1)
    return adv, adv + values


def test_compute_advantages_matches_gae(ref_trl):
    core, _ = ref_trl
    rng = np.random.default_rng(1)
    b, t = 3, 9
    values = rng.standard_normal((b, t)).astype(np.float32)
    rewards = rng.standard_normal((b, t)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[:, -2:] = 0
    cfg = ppo.PPOConfig(gamma=0.98, lam=0.9)
    v, adv, ret = ppo.compute_advantages(
        jnp.asarray(values), jnp.asarray(rewards), jnp.asarray(mask), cfg)
    want_adv, want_ret = _gae_reference(values, rewards, mask, 0.98, 0.9)
    np.testing.assert_allclose(np.asarray(ret), want_ret, rtol=1e-5, atol=1e-5)
    want_white = core.masked_whiten(torch.from_numpy(want_adv),
                                    torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(np.asarray(adv), want_white, rtol=1e-4, atol=1e-5)


def test_compute_rewards_score_at_last_token():
    scores = jnp.asarray([2.0, -1.0])
    lp = jnp.asarray([[0.1, 0.2, 0.3], [0.4, 0.5, 0.6]])
    ref_lp = jnp.zeros((2, 3))
    mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]])
    rewards, non_score, kls = ppo.compute_rewards(scores, lp, ref_lp, mask, 0.5)
    np.testing.assert_allclose(np.asarray(kls), np.asarray(lp))
    np.testing.assert_allclose(np.asarray(non_score), -0.5 * np.asarray(lp))
    # score lands on the last non-masked index (1 for row 0, 2 for row 1)
    want = -0.5 * np.asarray(lp)
    want[0, 1] += 2.0
    want[1, 2] += -1.0
    np.testing.assert_allclose(np.asarray(rewards), want, rtol=1e-6)


def test_ppo_loss_matches_reference_math():
    """Pin the clipped-surrogate math (ppo_trainer.py:1113-1168) on a case
    with active clipping on both the policy and value sides."""
    old_lp = jnp.asarray([[0.0, 0.0, 0.0]])
    lp = jnp.asarray([[0.5, -0.5, 0.1]])        # ratios e^.5, e^-.5, e^.1
    adv = jnp.asarray([[1.0, -2.0, 0.5]])
    values = jnp.asarray([[0.0, 0.0, 0.0]])
    vpreds = jnp.asarray([[-1.0, -0.05, 0.1]])  # first clips to -0.2
    returns = jnp.asarray([[-0.9, 0.5, 0.5]])   # clip moves vpred AWAY -> vf2>vf1
    mask = jnp.ones((1, 3))
    logits = jnp.zeros((1, 3, 7))
    cfg = ppo.PPOConfig(cliprange=0.2, cliprange_value=0.2, vf_coef=0.1)
    pg, vf, stats = ppo.ppo_loss(old_lp, values, logits, vpreds, lp, mask,
                                 adv, returns, cfg)
    ratio = np.exp(np.asarray(lp))
    pg1 = -np.asarray(adv) * ratio
    pg2 = -np.asarray(adv) * np.clip(ratio, 0.8, 1.2)
    want_pg = np.maximum(pg1, pg2).mean()
    vp_clip = np.clip(np.asarray(vpreds), -0.2, 0.2)
    want_vf = 0.5 * np.maximum((np.asarray(vpreds) - np.asarray(returns)) ** 2,
                               (vp_clip - np.asarray(returns)) ** 2).mean()
    np.testing.assert_allclose(float(pg), want_pg, rtol=1e-6)
    np.testing.assert_allclose(float(vf), cfg.vf_coef * want_vf, rtol=1e-6)
    assert float(stats["policy/clipfrac"]) > 0
    assert float(stats["val/clipfrac"]) > 0


def test_ppo_ratio_threshold_zeroes_batch():
    old_lp = jnp.zeros((1, 2))
    lp = jnp.full((1, 2), 5.0)  # ratio e^5 >> threshold
    cfg = ppo.PPOConfig(ratio_threshold=10.0)
    pg, vf, _ = ppo.ppo_loss(old_lp, jnp.zeros((1, 2)), jnp.zeros((1, 2, 4)),
                             jnp.zeros((1, 2)), lp, jnp.ones((1, 2)),
                             jnp.ones((1, 2)), jnp.zeros((1, 2)), cfg)
    assert float(pg) == 0.0 and float(vf) == 0.0


TINY_LM = dict(vocab_size=50000, hidden_size=32, intermediate_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
               tie_word_embeddings=True)


@pytest.fixture(scope="module")
def tiny_policy():
    lm_cfg = LMConfig(**TINY_LM)
    cfg = VLMConfig(lm=lm_cfg)
    params = {
        "language_model": qwen2.init_params(lm_cfg, jax.random.key(0)),
        "value_head": ppo.init_value_head(lm_cfg.hidden_size, jax.random.key(1)),
    }
    return cfg, params


def test_ppo_train_step_runs_and_updates(tiny_policy):
    cfg, params = tiny_policy
    # warmup_ratio=0: the cosine schedule starts at lr=0 otherwise and the
    # single-step update assert below would trivially see zeros
    opt_cfg = OptimizerConfig(
        learning_rate=1e-3, warmup_ratio=0.0,
        mm_tunable_parts="mm_language_model,value_head")
    step_fn = jax.jit(ppo.make_ppo_train_step(cfg, opt_cfg, ppo.PPOConfig()))
    optimizer = ppo.build_optimizer(params, opt_cfg)
    state = TrainState(params, optimizer.init(params), jnp.asarray(0))

    rng = np.random.default_rng(2)
    b, s, t = 2, 16, 6
    ids = rng.integers(0, 1000, size=(b, s)).astype(np.int32)
    batch = ppo.PPOBatch(
        input_ids=jnp.asarray(ids),
        response_mask=jnp.ones((b, t), jnp.float32),
        query_len=jnp.asarray([8, 8], jnp.int32),
        seq_len=jnp.asarray([14, 14], jnp.int32),
        old_logprobs=jnp.asarray(rng.standard_normal((b, t)) * 0.1, jnp.float32),
        old_values=jnp.asarray(rng.standard_normal((b, t)) * 0.1, jnp.float32),
        scores=jnp.asarray([1.0, -0.5], jnp.float32),
        ref_logprobs=jnp.asarray(rng.standard_normal((b, t)) * 0.1, jnp.float32),
    )
    new_state, stats = step_fn(state, batch, jnp.asarray(0.2, jnp.float32))
    assert np.isfinite(float(stats["loss/total"]))
    assert np.isfinite(float(stats["grad_norm"]))
    # value head must receive gradient
    dv = jax.tree.map(lambda a, b_: float(jnp.abs(a - b_).max()),
                      state.params["value_head"], new_state.params["value_head"])
    assert max(jax.tree.leaves(dv)) > 0

    # KL controller integrates with the traced coefficient
    ctl = ppo.make_kl_controller(ppo.PPOConfig())
    before = ctl.value
    ctl.update(float(stats["objective_kl"]), n_steps=b)
    assert ctl.value != before or abs(float(stats["objective_kl"]) - 6.0) < 1e-6


# ---------------------------------------------------------------------------
# SFT
# ---------------------------------------------------------------------------

def test_pack_constant_length_semantics():
    samples = [[1, 2, 3], [4, 5], [6, 7, 8, 9]]
    packed = sft.pack_constant_length(samples, seq_length=4, concat_token_id=0)
    # stream: 1 2 3 0 4 5 0 6 7 8 9 0 -> chunks [1,2,3,0], [4,5,0,6], [7,8,9,0]
    assert [p.tolist() for p in packed] == [[1, 2, 3, 0], [4, 5, 0, 6], [7, 8, 9, 0]]
    nopad = sft.pack_constant_length(samples, seq_length=5, concat_token_id=0,
                                     append_concat_token=False)
    assert [p.tolist() for p in nopad] == [[1, 2, 3, 4, 5]]


def test_completion_only_labels_match_trl(ref_trl):
    _, utils = ref_trl

    class _Tok:
        pad_token_id = 0
        eos_token_id = 1
        pad_token = "<pad>"

        def decode(self, ids):
            return str(list(ids))

        def __call__(self, *a, **k):
            raise AssertionError("not used with pre-tokenized templates")

    resp = [7, 8]
    instr = [5, 6]
    seqs = [
        [5, 6, 1, 2, 7, 8, 3, 4, 5, 6, 9, 7, 8, 2, 2],  # two turns
        [5, 6, 1, 1, 7, 8, 3, 3],                        # one turn
        [1, 2, 3, 4, 5, 6, 7, 9],                        # no response match
    ]
    collator = utils.DataCollatorForCompletionOnlyLM(
        response_template=resp, instruction_template=instr,
        tokenizer=_Tok(), mlm=False)
    for seq in seqs:
        want = collator.torch_call([list(seq)])["labels"][0].numpy()
        got = sft.completion_only_labels(np.asarray(seq), resp, instr)
        np.testing.assert_array_equal(got, want, err_msg=f"seq={seq}")

    single = utils.DataCollatorForCompletionOnlyLM(
        response_template=resp, tokenizer=_Tok(), mlm=False)
    for seq in seqs:
        want = single.torch_call([list(seq)])["labels"][0].numpy()
        got = sft.completion_only_labels(np.asarray(seq), resp)
        np.testing.assert_array_equal(got, want, err_msg=f"seq={seq}")


def test_sft_train_step_decreases_loss(tiny_policy):
    cfg, params = tiny_policy
    opt_cfg = OptimizerConfig(learning_rate=5e-3, warmup_ratio=0.0)
    step_fn = jax.jit(sft.make_sft_train_step(cfg, opt_cfg))
    optimizer = ppo.build_optimizer(params, opt_cfg)
    state = TrainState(params, optimizer.init(params), jnp.asarray(0))

    packed = sft.pack_constant_length([[1, 2, 3, 4] * 4, [9, 8, 7] * 5],
                                      seq_length=16, concat_token_id=0)
    ids = jnp.asarray(np.stack(packed), jnp.int32)
    labels = ids
    valid = jnp.full((ids.shape[0],), 16, jnp.int32)
    losses = []
    for _ in range(4):
        state, metrics = step_fn(state, ids, labels, valid)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_kl_penalty_full_matches_torch_kl_div():
    """The 'full' KL variant (ppo_trainer.py:1080-1082) over complete token
    distributions."""
    rng = np.random.default_rng(7)
    logits_p = rng.standard_normal((2, 5, 16)).astype(np.float32)
    logits_q = rng.standard_normal((2, 5, 16)).astype(np.float32)
    logp = torch.log_softmax(torch.from_numpy(logits_p), dim=-1)
    logq = torch.log_softmax(torch.from_numpy(logits_q), dim=-1)
    want = torch.nn.functional.kl_div(
        logq, logp, log_target=True, reduction="none").sum(-1).numpy()
    got = np.asarray(ppo.kl_penalty(
        jnp.asarray(logp.numpy()), jnp.asarray(logq.numpy()), "full"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_full_kl_matches_trl_math():
    """kl_penalty='full' == TRL ppo_trainer.py:1079-1082:
    F.kl_div(ref_logprob, logprob, log_target=True, reduction='none').sum(-1)
    over full log-distributions."""
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    logits = rng.standard_normal((2, 5, 11)).astype(np.float32)
    ref_logits = rng.standard_normal((2, 5, 11)).astype(np.float32)
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    ref_lp = torch.log_softmax(torch.from_numpy(ref_logits), dim=-1)
    want = F.kl_div(ref_lp, lp, log_target=True, reduction="none").sum(-1)
    got = ppo.kl_penalty(
        jax.nn.log_softmax(jnp.asarray(logits), axis=-1),
        jax.nn.log_softmax(jnp.asarray(ref_logits), axis=-1), "full")
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_response_full_kl_alignment():
    """response_full_kl must reduce the same rows _response_logprobs uses."""
    rng = np.random.default_rng(8)
    b, s, v, t = 2, 10, 7, 4
    logits = jnp.asarray(rng.standard_normal((b, s, v)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, s, v)), jnp.float32)
    qlen = jnp.asarray([3, 5], jnp.int32)
    got = ppo.response_full_kl(logits, ref, qlen, t)
    lp = jax.nn.log_softmax(logits, axis=-1)
    rlp = jax.nn.log_softmax(ref, axis=-1)
    want = np.zeros((b, t))
    for i in range(b):
        for j in range(t):
            row = int(qlen[i]) + j - 1
            p = np.exp(np.asarray(lp[i, row]))
            want[i, j] = (p * np.asarray(lp[i, row] - rlp[i, row])).sum()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_ppo_train_step_full_kl_pipeline(tiny_policy):
    """kl_penalty='full' end-to-end: rollout computes full_kls, the train
    step consumes them through compute_rewards."""
    cfg, params = tiny_policy
    opt_cfg = OptimizerConfig(
        learning_rate=1e-3, warmup_ratio=0.0,
        mm_tunable_parts="mm_language_model,value_head")
    ppo_cfg = ppo.PPOConfig(kl_penalty="full")
    step_fn = jax.jit(ppo.make_ppo_train_step(cfg, opt_cfg, ppo_cfg))
    optimizer = ppo.build_optimizer(params, opt_cfg)
    state = TrainState(params, optimizer.init(params), jnp.asarray(0))

    rng = np.random.default_rng(3)
    b, s, t = 2, 16, 6
    ids = jnp.asarray(rng.integers(0, 1000, size=(b, s)), jnp.int32)
    qlen = jnp.asarray([8, 8], jnp.int32)
    # rollout-time pass: policy logits (with value head) + a "ref" model
    # (same weights, detached role) -> exact per-token KL
    embeds = qwen2.embed_tokens(params["language_model"], ids, cfg.lm)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    logits, _ = ppo.forward_with_value(params, cfg, embeds, pos,
                                       jnp.asarray([14, 14], jnp.int32))
    ref_logits = logits + 0.01  # stand-in frozen reference
    full_kls = ppo.response_full_kl(logits, ref_logits, qlen, t)
    batch = ppo.PPOBatch(
        input_ids=ids,
        response_mask=jnp.ones((b, t), jnp.float32),
        query_len=qlen,
        seq_len=jnp.asarray([14, 14], jnp.int32),
        old_logprobs=jnp.asarray(rng.standard_normal((b, t)) * 0.1, jnp.float32),
        old_values=jnp.asarray(rng.standard_normal((b, t)) * 0.1, jnp.float32),
        scores=jnp.asarray([1.0, -0.5], jnp.float32),
        ref_logprobs=jnp.asarray(rng.standard_normal((b, t)) * 0.1, jnp.float32),
        full_kls=full_kls,
    )
    new_state, stats = step_fn(state, batch, jnp.asarray(0.2, jnp.float32))
    assert np.isfinite(float(stats["loss/total"]))
    # the objective KL must equal the masked mean of the rollout full KLs
    np.testing.assert_allclose(
        float(stats["objective_kl"]), float(full_kls.mean()), rtol=1e-5)
    # and omitting full_kls with kind='full' raises
    with pytest.raises(ValueError):
        ppo.compute_rewards(batch.scores, batch.old_logprobs,
                            batch.ref_logprobs, batch.response_mask, 0.2,
                            "full")
