"""Eval surface tests: model_vqa CLI + lmms adapter standalone answer()."""

import json
import os

import numpy as np
import pytest

from tests.test_builder_roundtrip import ckpt_dir  # fixture


def test_model_vqa_cli(ckpt_dir, tmp_path):
    from memory_augmented_vlm_tpu.eval import model_vqa

    rng = np.random.default_rng(0)
    vids = tmp_path / "videos"
    vids.mkdir()
    np.save(vids / "a.npy", rng.integers(0, 255, (8, 56, 56, 3), dtype=np.uint8))
    questions = [
        {"question_id": 1, "video": "a.npy", "text": "what happens?"},
        {"question_id": 2, "text": "hello?"},
    ]
    qfile = tmp_path / "q.jsonl"
    qfile.write_text("\n".join(json.dumps(q) for q in questions))
    ans = tmp_path / "answers.jsonl"
    model_vqa.main([
        "--model-path", ckpt_dir,
        "--question-file", str(qfile),
        "--video-folder", str(vids),
        "--answers-file", str(ans),
        "--max_new_tokens", "4",
    ])
    lines = [json.loads(l) for l in ans.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["question_id"] == 1
    assert all("text" in l for l in lines)


def test_chunk_sharding():
    from memory_augmented_vlm_tpu.eval.model_vqa import get_chunk

    xs = list(range(10))
    chunks = [get_chunk(xs, 3, k) for k in range(3)]
    assert sum(chunks, []) == xs


def test_lmms_adapter_standalone(ckpt_dir):
    from memory_augmented_vlm_tpu.eval.lmms_adapter import MavlmTpu

    m = MavlmTpu(pretrained=ckpt_dir, max_frames_num=8)
    rng = np.random.default_rng(1)
    ans = m.answer("what is this?", visuals=rng.integers(0, 255, (6, 56, 56, 3),
                   dtype=np.uint8), modality="video", max_new_tokens=4)
    assert isinstance(ans, str)
