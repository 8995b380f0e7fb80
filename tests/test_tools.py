"""Tooling tests: deltas, KV injection, frame selection, dataset checker,
frame extraction."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu.checkpoint.delta import apply_delta, consolidate, make_delta
from memory_augmented_vlm_tpu.config import LMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.models.kv_injection import (
    init_kv_proj_params,
    inject_memory_as_kv,
    prepend_to_cache,
)
from memory_augmented_vlm_tpu.tools.frame_select import meanstd, select_frames

TINY_LM = LMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
                   dtype="float32")


def test_delta_roundtrip():
    base = qwen2.init_params(TINY_LM, jax.random.key(0))
    target = jax.tree.map(lambda x: x + 0.5, base)
    delta = make_delta(base, target)
    restored = apply_delta(base, delta)
    for a, b in zip(jax.tree.leaves(target), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_delta_handles_resized_embeddings():
    base = {"embed": np.ones((4, 2), np.float32)}
    target = {"embed": np.full((6, 2), 3.0, np.float32)}  # grown vocab
    delta = make_delta(base, target)
    assert delta["embed"].shape == (6, 2)
    restored = apply_delta(base, delta)
    np.testing.assert_allclose(restored["embed"], target["embed"])


def test_consolidate_dtype():
    base = qwen2.init_params(TINY_LM, jax.random.key(0))
    out = consolidate(base, np.float16)
    assert all(np.asarray(x).dtype == np.float16 for x in jax.tree.leaves(out))


def test_kv_injection_decode_attends_memory():
    params = qwen2.init_params(TINY_LM, jax.random.key(0))
    proj = init_kv_proj_params(TINY_LM, jax.random.key(1))
    mem = jnp.asarray(np.random.default_rng(0).standard_normal((6, 32)), jnp.float32)
    cache = inject_memory_as_kv(proj, TINY_LM, mem, max_len=16)
    assert cache.k.shape == (2, 1, 16, 2, 8)
    assert int(cache.length[0]) == 6
    # decode against the injected cache works and depends on the memory
    emb = jnp.ones((1, 1, 32), jnp.float32)
    h1, _ = qwen2.decode_step(params, TINY_LM, emb, cache)
    cache2 = inject_memory_as_kv(proj, TINY_LM, mem * 2.0, max_len=16)
    h2, _ = qwen2.decode_step(params, TINY_LM, emb, cache2)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_kv_prepend():
    proj = init_kv_proj_params(TINY_LM, jax.random.key(1))
    mem = jnp.asarray(np.random.default_rng(0).standard_normal((4, 32)), jnp.float32)
    mem_cache = inject_memory_as_kv(proj, TINY_LM, mem, max_len=4)
    old = qwen2.KVCache(
        k=jnp.ones((2, 1, 8, 2, 8)), v=jnp.full((2, 1, 8, 2, 8), 2.0),
        length=jnp.asarray([3], jnp.int32))
    merged = prepend_to_cache(mem_cache, old)
    assert merged.k.shape == (2, 1, 12, 2, 8)
    assert int(merged.length[0]) == 7
    np.testing.assert_allclose(np.asarray(merged.k[:, :, :4]),
                               np.asarray(mem_cache.k[:, :, :4]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(merged.k[:, :, 4:7]), 1.0)


def test_frame_selection_budget_and_peaks():
    rng = np.random.default_rng(0)
    scores = rng.random(128) * 0.1
    scores[40:44] += 5.0  # a strongly relevant burst
    frames = list(range(0, 1280, 10))
    out = select_frames(scores, frames, max_num_frames=8, t1=0.3, t2=0.01)
    assert len(out) <= 8 and out == sorted(out)
    assert any(400 <= f < 440 for f in out)  # the burst is selected
    # short video: passthrough
    assert select_frames(scores[:4], frames[:4], max_num_frames=8) == frames[:4]


def test_dataset_checker(tmp_path):
    from memory_augmented_vlm_tpu.tools.check_dataset import check_samples, check_yaml_paths
    import yaml

    np.save(tmp_path / "ok.npy", np.zeros((2, 4, 4, 3), np.float32))
    items = [
        {"id": 0, "video": "ok.npy", "conversations": [{"from": "human", "value": "x"}]},
        {"id": 1, "video": "missing.npy", "conversations": [{"from": "human", "value": "x"}]},
        {"id": 2, "conversations": []},
    ]
    (tmp_path / "d.json").write_text(json.dumps(items))
    bad = check_samples(str(tmp_path / "d.json"), video_folder=str(tmp_path),
                        num_workers=2)
    assert {b["id"] for b in bad} == {1, 2}
    spec = {"datasets": [{"json_path": str(tmp_path / "d.json")},
                         {"json_path": "/nope.json"}]}
    (tmp_path / "m.yaml").write_text(yaml.dump(spec))
    checks = dict(check_yaml_paths(str(tmp_path / "m.yaml")))
    assert checks[str(tmp_path / "d.json")] is True
    assert checks["/nope.json"] is False


def test_extract_frames_tool(tmp_path):
    from memory_augmented_vlm_tpu.tools.extract_frames import main as extract_main

    rng = np.random.default_rng(0)
    vids = tmp_path / "videos"
    vids.mkdir()
    np.save(vids / "a.npy", rng.integers(0, 255, (5, 8, 8, 3), dtype=np.uint8))
    (tmp_path / "list.json").write_text(json.dumps([{"video": "a.npy"}]))
    out = tmp_path / "tensors"
    extract_main([
        "--video-list", str(tmp_path / "list.json"),
        "--video-folder", str(vids),
        "--output-folder", str(out),
        "--image-size", "16",
        "--num-workers", "1",
    ])
    arr = np.load(out / "a.npy")
    assert arr.shape == (5, 16, 16, 3)
