"""Checkpoint GC + LoRA-merge CLI tools."""

import os

import numpy as np

import jax
import jax.numpy as jnp


def test_remove_mid_ckpt(tmp_path):
    from memory_augmented_vlm_tpu.tools.remove_mid_ckpt import (
        find_checkpoints,
        remove_mid_checkpoints,
    )

    for step in (100, 200, 300):
        d = tmp_path / f"checkpoint-{step}"
        d.mkdir()
        (d / "state.bin").write_bytes(b"x")
    (tmp_path / "not-a-checkpoint").mkdir()

    assert [s for s, _ in find_checkpoints(str(tmp_path))] == [100, 200, 300]
    removed = remove_mid_checkpoints(str(tmp_path), keep=1, dry_run=True)
    assert len(removed) == 2 and all(os.path.isdir(p) for p in removed)
    removed = remove_mid_checkpoints(str(tmp_path), keep=1)
    assert len(removed) == 2
    assert (tmp_path / "checkpoint-300").is_dir()
    assert not (tmp_path / "checkpoint-100").exists()
    assert (tmp_path / "not-a-checkpoint").is_dir()


from tests.test_builder_roundtrip import ckpt_dir  # fixture


def test_merge_lora_cli(ckpt_dir, tmp_path):
    from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model
    from memory_augmented_vlm_tpu.tools import merge_lora
    from memory_augmented_vlm_tpu.train import lora as lora_mod
    from memory_augmented_vlm_tpu.utils.tree import path_str

    _, model, _, _ = load_pretrained_model(ckpt_dir, None, "llava_qwen",
                                           torch_dtype="float32")
    cfg = lora_mod.LoraConfig(r=2, alpha=4)
    factors = lora_mod.init_lora(model.params, cfg, jax.random.key(0))
    # make the adapter non-trivial so the merge changes weights
    factors = jax.tree.map(
        lambda x: x + 0.01 if hasattr(x, "ndim") else x, factors)

    flat = {}

    def record(path, leaf):
        if isinstance(leaf, dict) and "a" in leaf:
            flat[path_str(path) + ".a"] = np.asarray(leaf["a"])
            flat[path_str(path) + ".b"] = np.asarray(leaf["b"])
        return leaf

    jax.tree_util.tree_map_with_path(
        record, factors,
        is_leaf=lambda x: isinstance(x, dict) and "a" in x)
    lora_npz = tmp_path / "lora.npz"
    np.savez(lora_npz, **flat)

    out = tmp_path / "merged"
    rc = merge_lora.main(["--model-path", ckpt_dir,
                          "--lora-path", str(lora_npz),
                          "--out", str(out), "--r", "2", "--alpha", "4"])
    assert rc == 0
    assert (out / "model.safetensors").exists()
