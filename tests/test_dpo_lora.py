"""DPO + LoRA capability tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu.models import vlm
from memory_augmented_vlm_tpu.train import dpo as dpo_mod
from memory_augmented_vlm_tpu.train import trainer
from memory_augmented_vlm_tpu.train.lora import (
    LoraConfig,
    apply_lora,
    init_lora,
    merge_and_unload,
)
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig
from tests.test_vlm import TINY


def _dpo_batch(rng, b=2, fmax=8, nfine=4, st=6):
    ids = rng.integers(5, 100, size=(b, st))
    worse = rng.integers(5, 100, size=(b, st))
    labels = ids.copy()
    return dpo_mod.DPOBatch(
        pixels=jnp.asarray(rng.standard_normal((b, fmax, 56, 56, 3)), jnp.float32),
        frame_indices=jnp.broadcast_to(jnp.arange(fmax)[None], (b, fmax)),
        frame_valid=jnp.ones((b, fmax), bool),
        fine_idx=jnp.broadcast_to(
            jnp.asarray(vlm.fine_frame_indices(fmax, nfine))[None], (b, nfine)),
        chosen_ids=jnp.asarray(ids, jnp.int32),
        chosen_labels=jnp.asarray(labels, jnp.int32),
        rejected_ids=jnp.asarray(worse, jnp.int32),
        rejected_labels=jnp.asarray(worse, jnp.int32),
        image_pos=jnp.asarray((np.arange(b) % 3) + 1, jnp.int32),
        chosen_len=jnp.full((b,), st, jnp.int32),
        rejected_len=jnp.full((b,), st, jnp.int32),
    )


def test_dpo_loss_math():
    # when policy == reference, loss is -logsigmoid(0) = log(2), rewards 0
    lp = jnp.asarray([1.0, -2.0])
    losses, cr, rr = dpo_mod.dpo_loss(lp, lp - 1.0, lp, lp - 1.0,
                                      dpo_mod.DPOConfig(beta=0.1))
    np.testing.assert_allclose(np.asarray(losses), np.log(2.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cr), 0.0, atol=1e-7)


def test_dpo_step_improves_margin():
    params = vlm.init_params(TINY, jax.random.key(0))
    ref = jax.tree.map(lambda x: x, params)
    opt_cfg = OptimizerConfig(learning_rate=5e-3, total_steps=10, warmup_ratio=0.0,
                              schedule="constant", mm_vision_tower_lr=None)
    dpo_cfg = dpo_mod.DPOConfig(beta=0.5, gamma=0.1)
    rng = np.random.default_rng(0)
    batch = _dpo_batch(rng)
    state = trainer.init_train_state(params, opt_cfg)
    step = jax.jit(dpo_mod.make_dpo_train_step(TINY, opt_cfg, dpo_cfg, nseg=1))
    margins = []
    for _ in range(3):
        state, m = step(state, ref, batch)
        margins.append(float(m["reward_margin"]))
    assert np.isfinite(margins).all()
    assert margins[-1] > margins[0], margins  # chosen preferred over rejected
    assert 0.0 <= float(m["reward_accuracy"]) <= 1.0


def test_lora_identity_at_init_and_training_shapes():
    params = vlm.init_params(TINY, jax.random.key(0))
    cfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(params, cfg, jax.random.key(1))
    # B=0 at init -> merged == base
    merged = apply_lora(params, lora, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # factors exist only for LM projection kernels
    flat = jax.tree_util.tree_leaves_with_path(
        lora, is_leaf=lambda x: isinstance(x, dict) and "a" in x)
    names = ["/".join(str(getattr(p, "key", "")) for p in path)
             for path, leaf in flat if isinstance(leaf, dict)]
    assert names and all("language_model" in n for n in names)


def test_lora_gradients_flow_only_through_factors():
    params = vlm.init_params(TINY, jax.random.key(0))
    cfg = LoraConfig(r=2, alpha=4)
    lora = init_lora(params, cfg, jax.random.key(1))
    # perturb B so the adapter is active
    lora = jax.tree.map(
        lambda x: x + 0.01 if hasattr(x, "ndim") else x, lora)

    from memory_augmented_vlm_tpu.models import qwen2

    ids = jnp.asarray(np.random.default_rng(2).integers(0, 100, (1, 5)))

    def loss(lora):
        p = apply_lora(params, lora, cfg, freeze_base=True)
        emb = qwen2.embed_tokens(p["language_model"], ids)
        h, _ = qwen2.forward(p["language_model"], TINY.lm, emb, jnp.arange(5)[None])
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(lora)
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert gn > 0.0

    merged = merge_and_unload(params, lora, cfg)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params["language_model"]),
                        jax.tree.leaves(merged["language_model"]))
    )
    assert changed


def test_qlora_over_quantized_base():
    """QLoRA (reference bits=4/8 peft path): factors ride over int8/int4
    frozen kernels; merged forward starts at the dequantized base, gradients
    reach only the factors, and the stored base stays quantized."""
    import numpy as np

    from memory_augmented_vlm_tpu.config import LMConfig
    from memory_augmented_vlm_tpu.models import qwen2
    from memory_augmented_vlm_tpu.train import lora

    cfg = LMConfig(vocab_size=1000, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=8, rope_theta=10000.0)
    base = {"language_model": qwen2.init_params(cfg, jax.random.key(0))}
    for bits in (8, 4):
        qbase = {"language_model": qwen2.prequantize_int8(
            base["language_model"], cfg, bits=bits)}
        lcfg = lora.LoraConfig(r=4, alpha=8)
        factors = lora.init_lora(qbase, lcfg, jax.random.key(1))
        key = "kernel_int8" if bits == 8 else "kernel_int4"
        fac = factors["language_model"]["layers"]["up_proj"][key]
        assert fac is not None and fac["a"].shape[-1] == 4
        # int4 factors use the LOGICAL contraction dim (2x the packed bytes)
        assert fac["a"].shape[-2] == 32

        merged = lora.apply_lora(qbase, factors, lcfg, freeze_base=True)
        up = merged["language_model"]["layers"]["up_proj"]
        assert "kernel" in up and up["kernel"].shape == (2, 32, 64)

        # B=0 init: merged forward equals the plain quantized forward
        ids = jnp.asarray(np.arange(6)[None])
        emb = qwen2.embed_tokens(qbase["language_model"], ids)
        pos = jnp.arange(6)[None]
        ref = np.asarray(qwen2.forward(qbase["language_model"], cfg, emb, pos)[0])
        got = np.asarray(qwen2.forward(merged["language_model"], cfg, emb, pos)[0])
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)

        # gradients flow only to factors; base stays quantized in storage
        def loss_fn(f):
            m = lora.apply_lora(qbase, f, lcfg, freeze_base=True)
            h, _ = qwen2.forward(m["language_model"], cfg, emb, pos)
            return (h ** 2).mean()

        grads = jax.grad(loss_fn)(factors)
        gb = grads["language_model"]["layers"]["up_proj"][key]["b"]
        assert float(jnp.abs(gb).max()) > 0
        assert qbase["language_model"]["layers"]["up_proj"][key].dtype in (
            jnp.int8, jnp.uint8)
