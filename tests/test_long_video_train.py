"""Long-video (ring-cache overflow) at TRAINING time — round-5 item 9.

The overflow path was e2e-tested for inference (tests/test_long_video.py);
training differs: gradients must flow through the `lax.scan`-carried cache
across segments, through the sliding window that DROPS the oldest entries
(MemoryController.py:152-154 keeps no grad path to evicted memories), and
through the fuser — interacting with remat and the memory LR groups.

Oracle: the reference's own ``TransformerProjector`` (imported from
/root/reference via eval/reference_oracle.py), run segment-by-segment with
autograd through its mutable ``memory_cache`` list, at 11 segments so the
hardcoded cap-10 window actually slides. Gradients of every memory/fuser
parameter must match the ``jax.grad`` of the same loss through
``run_video`` + ``fuse_memory_bank``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from memory_augmented_vlm_tpu.checkpoint import hf_import
from memory_augmented_vlm_tpu.config import (
    LMConfig,
    MemoryConfig,
    VisionConfig,
    VLMConfig,
)
from memory_augmented_vlm_tpu.eval import reference_oracle as ro
from memory_augmented_vlm_tpu.models import memory as memory_mod
from memory_augmented_vlm_tpu.models import vlm

if not ro.reference_available():
    pytest.skip("reference checkout not present", allow_module_level=True)

# geometry the reference module's hardcoded stats path tolerates
# (patch 196 + 8 memory tokens: MemoryController.py:102,112 reshape/split),
# with 4-frame segments (segmentation lives outside the module) and 11
# segments so the cap-10 ring actually evicts
HIDDEN, SEG_FRAMES, NSEG_TOTAL = 32, 4, 11
MCFG = MemoryConfig(hidden_size=HIDDEN, num_attention_heads=8,
                    patch_size=196, num_memory_tokens=8, depth=2,
                    cache_cap=10, segment_frames=SEG_FRAMES)


def _build_reference_memory(seed=0):
    ro.import_reference_llava()
    from llava.model.memory_module.MemoryController import (
        Config,
        TransformerProjector,
    )

    cfg = Config()
    cfg.mm_hidden_size = HIDDEN
    cfg.mm_hidden_act = "relu"
    cfg.mm_num_attention_heads = 8
    cfg.patch_size = 196
    cfg.mm_layer_norm_eps = 1e-12
    cfg.mm_intermediate_size = 4 * HIDDEN
    cfg.num_memory_tokens = 8
    cfg.depth = 2
    cfg.mm_dtype = torch.float32
    torch.manual_seed(seed)
    rec = TransformerProjector(cfg)
    fuser = torch.nn.Sequential(
        torch.nn.Linear(HIDDEN, HIDDEN * 4), torch.nn.GELU(),
        torch.nn.Linear(HIDDEN * 4, HIDDEN))
    return rec, fuser


def test_overflow_memory_gradients_match_reference():
    rec, fuser = _build_reference_memory()
    sd = hf_import.torch_state_dict_to_numpy({
        **{f"recurrent_memory_transformer.{k}": v
           for k, v in rec.state_dict().items()},
        **{f"memory_fuser.{k}": v for k, v in fuser.state_dict().items()},
        "token_type_embedding.weight": torch.zeros(2, HIDDEN),
    })
    jparams = {k: jax.tree.map(jnp.asarray, v)
               for k, v in hf_import.convert_memory_modules(
                   sd, depth=2).items()}

    rng = np.random.default_rng(0)
    frames = rng.standard_normal(
        (NSEG_TOTAL * SEG_FRAMES, 196, HIDDEN)).astype(np.float32)

    # --- reference: segment loop with autograd through the mutable cache
    rec.train(False)
    rec.memory_cache, rec.frame_attn_scores = [], []
    x = torch.asarray(frames)
    for i in range(NSEG_TOTAL):
        cache, _ = rec(x[i * SEG_FRAMES:(i + 1) * SEG_FRAMES])
    assert len(cache) == 10  # the window slid
    fused_ref = fuser(torch.cat(cache, dim=0))
    loss_ref = (fused_ref ** 2).mean()
    loss_ref.backward()

    # --- repo: jax.grad of the identical loss through run_video + fuser
    def loss_fn(params):
        state = memory_mod.run_video(
            params["recurrent_memory_transformer"], MCFG,
            jnp.asarray(frames), jnp.ones((frames.shape[0],), bool))
        fused, _ = memory_mod.fuse_memory_bank(params["memory_fuser"], state)
        return jnp.mean(fused ** 2)

    loss_jax, grads = jax.value_and_grad(loss_fn)(
        {"recurrent_memory_transformer":
             jparams["recurrent_memory_transformer"],
         "memory_fuser": jparams["memory_fuser"]})
    np.testing.assert_allclose(float(loss_jax), float(loss_ref.detach()),
                               rtol=1e-5, atol=1e-7)

    # compare every reference grad through the SAME converter mapping the
    # weights use (transposes are linear, so they map grads identically)
    ref_grads_sd = hf_import.torch_state_dict_to_numpy({
        **{f"recurrent_memory_transformer.{k}": p.grad
           for k, p in rec.named_parameters()},
        **{f"memory_fuser.{k}": p.grad for k, p in fuser.named_parameters()},
        "token_type_embedding.weight": torch.zeros(2, HIDDEN),
    })
    ref_grads = hf_import.convert_memory_modules(ref_grads_sd, depth=2)

    flat_ours = jax.tree_util.tree_leaves_with_path(grads)
    flat_ref = {jax.tree_util.keystr(p): np.asarray(v)
                for p, v in jax.tree_util.tree_leaves_with_path(
                    {"recurrent_memory_transformer":
                         ref_grads["recurrent_memory_transformer"],
                     "memory_fuser": ref_grads["memory_fuser"]})}
    checked = 0
    for path, ours in flat_ours:
        want = flat_ref[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(ours, np.float32), want, rtol=5e-4, atol=1e-7,
            err_msg=jax.tree_util.keystr(path))
        checked += 1
    assert checked >= 20  # every attention/mlp/residual/initial-memory leaf

    # eviction semantics: the initial memory only feeds segment 1, whose
    # cache entry was evicted — but its influence persists through the
    # recurrence (entries 2..11 were evolved from it), so its grad is
    # small-but-nonzero; a zero grad would mean the scan detached the carry
    g_init = np.asarray(
        grads["recurrent_memory_transformer"]["initial_memory"])
    assert 0 < np.abs(g_init).max()


def test_train_step_runs_on_overflow_clip():
    """Full train step (remat + LR groups) on a >cap clip: 5 segments of
    frames with the spliced stream clamped at cap=3 segments; loss/grads
    finite and the memory-transformer group actually receives gradient."""
    from memory_augmented_vlm_tpu.train import trainer
    from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig

    cfg = VLMConfig(
        lm=LMConfig(
            vocab_size=50000, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
            dtype="float32",
        ),
        vision=VisionConfig(
            hidden_size=24, intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=4, image_size=56, patch_size=14,
        ),
        memory=MemoryConfig(
            hidden_size=32, num_attention_heads=4, patch_size=4,
            num_memory_tokens=2, depth=1, cache_cap=3, segment_frames=4,
            num_fine_frames=4, max_temporal_frames=64,
        ),
    )
    params = vlm.init_params(cfg, jax.random.key(0))
    opt_cfg = OptimizerConfig(
        learning_rate=1e-3, total_steps=4, warmup_ratio=0.0,
        schedule="constant", mm_vision_tower_lr=None)
    state = trainer.init_train_state(params, opt_cfg)

    b, fmax, nfine, st = 1, 20, 4, 6  # 20 frames = 5 segments > cap 3
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 49000, size=(b, st))
    batch = trainer.TrainBatch(
        pixels=jnp.asarray(rng.standard_normal((b, fmax, 56, 56, 3)),
                           jnp.float32),
        frame_indices=jnp.broadcast_to(jnp.arange(fmax)[None], (b, fmax)),
        frame_valid=jnp.ones((b, fmax), bool),
        fine_idx=jnp.broadcast_to(
            jnp.asarray(vlm.fine_frame_indices(fmax, nfine))[None],
            (b, nfine)),
        input_ids=jnp.asarray(ids, jnp.int32),
        labels=jnp.asarray(ids, jnp.int32),
        image_pos=jnp.asarray([1], jnp.int32),
        text_len=jnp.full((b,), st, jnp.int32),
    )
    # nseg = cache cap (the overflow clamp bench.build_pipeline also makes)
    step_fn = jax.jit(trainer.make_train_step(
        cfg, opt_cfg, nseg=cfg.memory.cache_cap))
    new_state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))

    # the recurrent-memory group (memory_transformer_lr semantics) must
    # move: its params changed after one step
    before = params["memory"]["recurrent_memory_transformer"]
    after = new_state.params["memory"]["recurrent_memory_transformer"]
    delta = jax.tree.map(
        lambda a, b2: float(jnp.abs(a - b2).max()), before, after)
    assert max(jax.tree.leaves(delta)) > 0
