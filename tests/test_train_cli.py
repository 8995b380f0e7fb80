"""Train-CLI integration: tiny synthetic video dataset through the real loop
(bucketing, jitted steps, checkpointing, auto-resume, HF export)."""

import json
import os

import numpy as np
import jax
import pytest

from memory_augmented_vlm_tpu.models import vlm
from memory_augmented_vlm_tpu.train import cli
from tests.test_data_pipeline import FakeTokenizer
from tests.test_vlm import TINY


@pytest.fixture()
def data_dir(tmp_path):
    rng = np.random.default_rng(0)
    vids = tmp_path / "videos"
    vids.mkdir()
    items = []
    for i in range(6):
        frames = rng.integers(0, 255, size=(10, 56, 56, 3), dtype=np.uint8)
        np.save(vids / f"v{i}.npy", frames)
        items.append({
            "id": i,
            "video": f"v{i}.npy",
            "conversations": [
                {"from": "human", "value": "<image> describe"},
                {"from": "gpt", "value": "something happens"},
            ],
        })
    (tmp_path / "data.json").write_text(json.dumps(items))
    return tmp_path


def test_train_loop_end_to_end(data_dir, monkeypatch):
    monkeypatch.setattr(
        cli, "build_model",
        lambda args: (FakeTokenizer(), vlm.init_params(TINY, jax.random.key(0)), TINY),
    )
    out_dir = str(data_dir / "out")
    args = cli.parse_args([
        "--data_path", str(data_dir / "data.json"),
        "--video_folder", str(data_dir / "videos"),
        "--output_dir", out_dir,
        "--max_steps", "2",
        "--gradient_accumulation_steps", "1",
        "--per_device_train_batch_size", "2",
        "--save_steps", "1",
        "--learning_rate", "1e-3",
        "--mesh_fsdp", "1",
    ])
    last = cli.train(args)
    assert np.isfinite(last["loss"])
    assert os.path.isdir(os.path.join(out_dir, "checkpoint-2"))
    assert os.path.exists(os.path.join(out_dir, "hf_export", "model.safetensors"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))

    # auto-resume: running again starts from step 2 and stops immediately
    last2 = cli.train(args)
    assert last2 == {} or np.isfinite(last2.get("loss", 0.0))


def test_train_loop_mixed_modalities(data_dir, monkeypatch, tmp_path):
    """Text-only samples train through the text step (not skipped)."""
    import json as _json

    items = _json.loads((data_dir / "data.json").read_text())
    items.append({"id": 100, "conversations": [
        {"from": "human", "value": "just text"},
        {"from": "gpt", "value": "sure thing here"}]})
    items.append({"id": 101, "conversations": [
        {"from": "human", "value": "more text"},
        {"from": "gpt", "value": "yes indeed friend"}]})
    mixed = tmp_path / "mixed.json"
    mixed.write_text(_json.dumps(items))
    monkeypatch.setattr(
        cli, "build_model",
        lambda args: (FakeTokenizer(), vlm.init_params(TINY, jax.random.key(0)), TINY),
    )
    out_dir = str(tmp_path / "out")
    args = cli.parse_args([
        "--data_path", str(mixed),
        "--video_folder", str(data_dir / "videos"),
        "--output_dir", out_dir,
        "--max_steps", "3",
        "--gradient_accumulation_steps", "1",
        "--per_device_train_batch_size", "2",
        "--save_steps", "100",
        "--learning_rate", "1e-3",
        "--mesh_fsdp", "1",
        "--seed", "7",
    ])
    last = cli.train(args)
    assert np.isfinite(last["loss"])
