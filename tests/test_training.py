"""Training-stack tests: selective unfreezing, LR groups, loss descent,
synced frame dropout determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.models import vlm
from memory_augmented_vlm_tpu.train import trainer
from memory_augmented_vlm_tpu.train.optimizer import (
    OptimizerConfig,
    build_optimizer,
    lr_group_labels,
    trainable_mask,
)
from tests.test_vlm import TINY


@pytest.fixture(scope="module")
def setup():
    params = vlm.init_params(TINY, jax.random.key(0))
    opt_cfg = OptimizerConfig(
        learning_rate=1e-3,
        memory_transformer_lr=5e-3,
        memory_key_value_lr=5e-3,
        mm_vision_tower_lr=None,
        total_steps=20,
        warmup_ratio=0.0,
        schedule="constant",
    )
    return params, opt_cfg


def _make_batch(rng, b=2, fmax=8, nfine=4, st=6):
    pixels = rng.standard_normal((b, fmax, 56, 56, 3)).astype(np.float32)
    ids = rng.integers(5, 100, size=(b, st))
    labels = ids.copy()
    labels[:, :2] = constants.IGNORE_INDEX
    return trainer.TrainBatch(
        pixels=jnp.asarray(pixels),
        frame_indices=jnp.broadcast_to(jnp.arange(fmax)[None], (b, fmax)),
        frame_valid=jnp.ones((b, fmax), bool),
        fine_idx=jnp.broadcast_to(jnp.asarray(vlm.fine_frame_indices(fmax, nfine))[None], (b, nfine)),
        input_ids=jnp.asarray(ids, jnp.int32),
        labels=jnp.asarray(labels, jnp.int32),
        image_pos=jnp.asarray((np.arange(b) % 3) + 1, jnp.int32),
        text_len=jnp.full((b,), st, jnp.int32),
    )


def test_trainable_mask_matches_reference_parts(setup):
    params, _ = setup
    mask = trainable_mask(params, "larimar_model,recurrent_model,mm_language_model")
    assert all(jax.tree.leaves(mask["language_model"]))
    assert all(jax.tree.leaves(mask["memory"]))
    assert not any(jax.tree.leaves(mask["vision_tower"]))
    assert not any(jax.tree.leaves(mask["mm_projector"]))
    assert not any(jax.tree.leaves(mask["positional_encoding"]))


def test_lr_group_labels(setup):
    params, opt_cfg = setup
    labels = lr_group_labels(params, opt_cfg)
    assert set(jax.tree.leaves(labels["memory"]["recurrent_memory_transformer"])) == {
        "memory_transformer"
    }
    assert set(jax.tree.leaves(labels["memory"]["memory_fuser"])) == {"memory_kv"}
    assert set(jax.tree.leaves(labels["language_model"])) == {"default"}


def test_train_step_decreases_loss_and_freezes(setup):
    params, opt_cfg = setup
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    state = trainer.init_train_state(params, opt_cfg)
    step_fn = jax.jit(trainer.make_train_step(TINY, opt_cfg, nseg=1))

    tower_before = jax.tree.leaves(params["vision_tower"])[0]
    losses = []
    for _ in range(4):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4
    # frozen modules bit-identical
    tower_after = jax.tree.leaves(state.params["vision_tower"])[0]
    np.testing.assert_array_equal(np.asarray(tower_before), np.asarray(tower_after))
    # trainable memory module actually moved
    before = jax.tree.leaves(params["memory"]["memory_fuser"])[0]
    after = jax.tree.leaves(state.params["memory"]["memory_fuser"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_synced_dropout_deterministic():
    a = [trainer.synced_frame_dropout(s) for s in range(50)]
    b = [trainer.synced_frame_dropout(s) for s in range(50)]
    assert a == b
    assert any(a) and not all(a)  # both outcomes occur


def test_chunked_ce_matches_dense():
    params = vlm.init_params(TINY, jax.random.key(1))
    rng = np.random.default_rng(2)
    b, s = 2, 10
    hidden = jnp.asarray(rng.standard_normal((b, s, TINY.lm.hidden_size)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 100, size=(b, s)), jnp.int32)
    labels = labels.at[0, :3].set(constants.IGNORE_INDEX)
    valid = jnp.asarray([s, s - 2], jnp.int32)
    loss, cnt = trainer.chunked_cross_entropy(params, TINY, hidden, labels, valid, chunk=4)

    from memory_augmented_vlm_tpu.models import qwen2

    logits = qwen2.unembed(params["language_model"], TINY.lm, hidden)
    tot, n = 0.0, 0
    logits_np = np.asarray(logits, np.float64)
    for i in range(b):
        for t in range(s - 1):
            tgt = int(labels[i, t + 1])
            if tgt == constants.IGNORE_INDEX or t >= int(valid[i]) - 1:
                continue
            lz = np.log(np.exp(logits_np[i, t] - logits_np[i, t].max()).sum()) + logits_np[i, t].max()
            tot += lz - logits_np[i, t, tgt]
            n += 1
    assert int(cnt) == n
    np.testing.assert_allclose(float(loss), tot / n, rtol=1e-4)


def test_gradient_accumulation_semantics(setup):
    """grad_accum_steps=k: params move only on every k-th micro-step."""
    import dataclasses

    params, opt_cfg = setup
    opt_cfg2 = dataclasses.replace(opt_cfg, grad_accum_steps=2)
    rng = np.random.default_rng(5)
    batch = _make_batch(rng)
    state = trainer.init_train_state(params, opt_cfg2)
    step_fn = jax.jit(trainer.make_train_step(TINY, opt_cfg2, nseg=1))
    before = np.asarray(jax.tree.leaves(params["memory"]["memory_fuser"])[0])
    state, _ = step_fn(state, batch)
    mid = np.asarray(jax.tree.leaves(state.params["memory"]["memory_fuser"])[0])
    np.testing.assert_array_equal(before, mid)  # accumulated, not applied
    state, _ = step_fn(state, batch)
    after = np.asarray(jax.tree.leaves(state.params["memory"]["memory_fuser"])[0])
    assert not np.allclose(before, after)  # applied on the 2nd micro-step


def test_train_step_with_int8_tower():
    """--tower_int8 training: the frozen tower holds int8 kernels inside the
    differentiated param pytree; grads must flow to the trainable modules
    (float0 tangents on integer leaves become exact-zero updates)."""
    import dataclasses

    from memory_augmented_vlm_tpu.models import siglip

    cfg = dataclasses.replace(
        TINY, pipeline=dataclasses.replace(TINY.pipeline, tower_int8=True))
    params = vlm.init_params(cfg, jax.random.key(0))
    params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
    opt_cfg = OptimizerConfig(learning_rate=1e-3, warmup_ratio=0.0,
                              schedule="constant", mm_vision_tower_lr=None,
                              total_steps=4)
    state = trainer.init_train_state(params, opt_cfg)
    step = jax.jit(trainer.make_train_step(cfg, opt_cfg, nseg=1))
    batch = _make_batch(np.random.default_rng(0))
    before_tower = jax.tree.leaves(state.params["vision_tower"])[0]
    losses = []
    for _ in range(2):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert float(m["grad_norm"]) > 0
    # the quantized tower stays bit-identical (frozen by dtype + mask)
    after_tower = jax.tree.leaves(state.params["vision_tower"])[0]
    np.testing.assert_array_equal(np.asarray(before_tower),
                                  np.asarray(after_tower))


def test_frozen_grads_do_not_inflate_clip_norm():
    """torch frozen params (requires_grad=False) never enter clip_grad_norm_;
    the optax chain must zero frozen grads BEFORE the global-norm clip."""
    import optax

    from memory_augmented_vlm_tpu.train.optimizer import (
        OptimizerConfig, build_optimizer)

    params = {"language_model": {"w": jnp.ones((4, 4))},
              "mm_projector": {"w": jnp.ones((4, 4))}}
    cfg = OptimizerConfig(learning_rate=1e-2, max_grad_norm=1.0,
                          warmup_ratio=0.0, schedule="constant",
                          mm_tunable_parts="mm_language_model",
                          mm_vision_tower_lr=None, memory_transformer_lr=None,
                          memory_key_value_lr=None)
    tx = build_optimizer(params, cfg)
    state = tx.init(params)
    # tiny trainable grad, huge frozen grad: with the bug the frozen grad
    # pushes the global norm to ~4000 and the trainable update collapses
    grads = {"language_model": {"w": jnp.full((4, 4), 0.1)},
             "mm_projector": {"w": jnp.full((4, 4), 1000.0)}}
    updates, _ = tx.update(grads, state, params)
    # trainable grad norm is 0.4 < 1.0 -> unclipped Adam step ~ lr
    lm_update = np.asarray(updates["language_model"]["w"])
    assert np.all(np.abs(lm_update) > 0.5 * cfg.learning_rate), lm_update
    # frozen leaf stays exactly zero
    assert np.all(np.asarray(updates["mm_projector"]["w"]) == 0.0)


def test_frozen_leaves_resist_weight_decay():
    """With weight_decay > 0, AdamW must not decay frozen leaves."""
    from memory_augmented_vlm_tpu.train.optimizer import (
        OptimizerConfig, build_optimizer)

    params = {"language_model": {"w": jnp.ones((4, 4))},
              "mm_projector": {"w": jnp.ones((4, 4))}}
    cfg = OptimizerConfig(learning_rate=1e-2, weight_decay=0.1,
                          max_grad_norm=1.0, warmup_ratio=0.0,
                          schedule="constant",
                          mm_tunable_parts="mm_language_model",
                          mm_vision_tower_lr=None, memory_transformer_lr=None,
                          memory_key_value_lr=None)
    tx = build_optimizer(params, cfg)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["mm_projector"]["w"]) == 0.0)
