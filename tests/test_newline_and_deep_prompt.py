"""mm_newline_position variants + per-layer memory-prompt injection +
DPO dataset tests."""

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.models import qwen2, vlm
from tests.test_vlm import TINY


def _visual(cfg, pos):
    cfg2 = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, mm_newline_position=pos))
    params = vlm.init_params(cfg2, jax.random.key(0))
    f1 = 8
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((f1, cfg.memory.patch_size, 32)),
        jnp.float32)
    fine = jnp.asarray(vlm.fine_frame_indices(f1, cfg.memory.num_fine_frames))
    return vlm.build_video_embeds(
        params, cfg2, feats, jnp.arange(f1), jnp.ones((f1,), bool), fine, nseg=1)


def test_newline_position_token_counts():
    nm, pp, nf = TINY.memory.num_memory_tokens, TINY.memory.patch_size, TINY.memory.num_fine_frames
    side = int(round(pp**0.5))
    base = 10 + 9  # prompts
    one = _visual(TINY, "one_token")
    assert one.shape[0] == base + nm * pp + 1 + nf * pp + 1
    none = _visual(TINY, "no_token")
    assert none.shape[0] == base + nm * pp + nf * pp
    frame = _visual(TINY, "frame")
    assert frame.shape[0] == base + nm * (pp + 1) + nf * (pp + 1)
    grid = _visual(TINY, "grid")
    assert grid.shape[0] == base + nm * side * (side + 1) + nf * side * (side + 1)


def test_memory_prompt_injection_affects_late_layers_only():
    cfg = TINY.lm
    params = qwen2.init_params(cfg, jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 100, (1, 6)))
    emb = qwen2.embed_tokens(params, ids)
    pos = jnp.arange(6)[None]
    mem = jnp.asarray(np.random.default_rng(2).standard_normal((4, 32)), jnp.float32)

    h_plain, _ = qwen2.forward(params, cfg, emb, pos)
    h_mem, _ = qwen2.forward(params, cfg, emb, pos, memory_prompt=mem,
                             memory_prompt_layers=1)
    assert not np.allclose(np.asarray(h_plain), np.asarray(h_mem))
    # zero injection layers -> identical to plain forward
    h_none, _ = qwen2.forward(params, cfg, emb, pos, memory_prompt=mem,
                              memory_prompt_layers=0)
    np.testing.assert_allclose(np.asarray(h_none), np.asarray(h_plain),
                               rtol=1e-4, atol=1e-5)


def test_dpo_dataset_pairs(tmp_path):
    from memory_augmented_vlm_tpu.data.dpo_dataset import DPODataset
    from tests.test_data_pipeline import FakeTokenizer

    rng = np.random.default_rng(0)
    np.save(tmp_path / "v.npy", rng.integers(0, 255, (4, 56, 56, 3), dtype=np.uint8))
    items = [{
        "id": 0, "video": "v.npy",
        "prompt": "what happens?",
        "chosen": "a detailed good answer",
        "rejected": "bad",
    }]
    (tmp_path / "d.json").write_text(json.dumps(items))
    ds = DPODataset(str(tmp_path / "d.json"), FakeTokenizer(),
                    video_folder=str(tmp_path))
    s = ds[0]
    assert s["modality"] == "video"
    assert (s["chosen_input_ids"] == constants.IMAGE_TOKEN_INDEX).sum() == 1
    assert (s["rejected_input_ids"] == constants.IMAGE_TOKEN_INDEX).sum() == 1
    assert len(s["chosen_input_ids"]) > len(s["rejected_input_ids"])
    # user part identical in both
    cut = min(len(s["chosen_input_ids"]), len(s["rejected_input_ids"])) - 3
    assert np.array_equal(s["chosen_input_ids"][:10], s["rejected_input_ids"][:10])
