"""Data pipeline tests: manifest loading/sampling strategies, ChatML
preprocessing with label masking, video loading, collation, and the
HF-export/import round trip."""

import json
import os

import numpy as np
import jax
import pytest

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.config import MemoryConfig
from memory_augmented_vlm_tpu.data import collator, dataset, video
from memory_augmented_vlm_tpu.models import vlm
from tests.test_vlm import TINY


class FakeTokenizer:
    """Whitespace tokenizer with stable ids for preprocessing tests."""

    SPECIALS = {"<|im_start|>": 1, "<|im_end|>": 2, "\n": 3}

    def __init__(self):
        self.vocab = dict(self.SPECIALS)

    def _id(self, tok):
        if tok not in self.vocab:
            self.vocab[tok] = 10 + len(self.vocab)
        return self.vocab[tok]

    def __call__(self, text, add_special_tokens=False):
        class R:
            pass

        r = R()
        if text == "\n":
            r.input_ids = [3]
        else:
            r.input_ids = [self._id(t) for t in text.split()] if text.strip() else []
        return r

    def convert_tokens_to_ids(self, tok):
        return self.SPECIALS.get(tok, self._id(tok))


def test_sampling_strategies():
    items = list(range(100))
    assert dataset._apply_sampling_strategy(items, "first:10") == list(range(10))
    assert dataset._apply_sampling_strategy(items, "end:5") == list(range(95, 100))
    assert len(dataset._apply_sampling_strategy(items, "random:7")) == 7
    assert len(dataset._apply_sampling_strategy(items, "first:50%")) == 50
    assert dataset._apply_sampling_strategy(items, "all") == items


def test_yaml_manifest(tmp_path):
    import yaml

    a = [{"id": i, "conversations": []} for i in range(10)]
    b = [{"id": 100 + i, "conversations": []} for i in range(10)]
    (tmp_path / "a.json").write_text(json.dumps(a))
    (tmp_path / "b.json").write_text(json.dumps(b))
    spec = {"datasets": [
        {"json_path": str(tmp_path / "a.json"), "sampling_strategy": "first:3"},
        {"json_path": str(tmp_path / "b.json"), "sampling_strategy": "end:2"},
    ]}
    (tmp_path / "mix.yaml").write_text(yaml.dump(spec))
    items = dataset.load_data_manifest(str(tmp_path / "mix.yaml"))
    assert [x["id"] for x in items] == [0, 1, 2, 108, 109]


def test_preprocess_qwen_masks_user_turns():
    tok = FakeTokenizer()
    convs = [
        {"from": "human", "value": "what is in <image> here"},
        {"from": "gpt", "value": "a cat"},
        {"from": "human", "value": "sure ?"},
        {"from": "gpt", "value": "yes"},
    ]
    enc = dataset.preprocess_qwen(convs, tok)
    ids, labels = enc["input_ids"], enc["labels"]
    assert len(ids) == len(labels)
    assert (ids == constants.IMAGE_TOKEN_INDEX).sum() == 1
    # image sentinel inside a user turn must be masked
    assert labels[np.where(ids == constants.IMAGE_TOKEN_INDEX)[0][0]] == constants.IGNORE_INDEX
    # assistant answer tokens supervised
    cat_id = tok._id("cat")
    assert cat_id in ids
    assert labels[np.where(ids == cat_id)[0][0]] == cat_id
    # user content masked
    what_id = tok._id("what")
    assert labels[np.where(ids == what_id)[0][0]] == constants.IGNORE_INDEX
    # ChatML structure tokens unmasked everywhere
    for sid in (1, 2):
        for pos in np.where(ids == sid)[0]:
            assert labels[pos] == sid


def test_video_loading_from_tensor_and_dir(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(40, 8, 8, 3), dtype=np.uint8)
    np.save(tmp_path / "vid.npy", frames)
    out, t, times, num = video.load_video(str(tmp_path / "vid.npy"))
    # 40 frames @1fps -> 40s >= 32 -> n=(40-1)//32=1 -> 32 frames
    assert out.shape[0] == 32 and num == 32
    # frame dir
    from PIL import Image

    d = tmp_path / "framedir"
    d.mkdir()
    for i in range(5):
        Image.fromarray(frames[i]).save(d / f"{i:04d}.jpg")
    out2, t2, _, num2 = video.load_video(str(d))
    assert out2.shape[0] == 5 and num2 == 5  # <32s -> 1fps keeps all


def test_sample_indices_reference_rule():
    idx, times, num = video.sample_frame_indices(3000, avg_fps=30.0)
    # 100 s -> n=(100-1)//32=3 -> 96 frames
    assert num == 96 and len(idx) == 96
    idx, _, num = video.sample_frame_indices(150, avg_fps=30.0)
    # 5 s -> 1 fps -> every 30th frame
    assert idx == [0, 30, 60, 90, 120] and num == 5


def test_dynamic_sample_indices_ladder():
    # <10 frames: pad to 10 by repeating the last (utils.py:61-63)
    idx, times, num = video.dynamic_sample_frame_indices(4, avg_fps=2.0)
    assert idx == [0, 1, 2, 3] + [3] * 6 and num == 10
    # <100 frames: keep all
    idx, _, num = video.dynamic_sample_frame_indices(50, avg_fps=5.0)
    assert idx == list(range(50)) and num == 50
    # long video (>=100 s): ~1/video_fps via the rounded-ratio step
    idx, times, num = video.dynamic_sample_frame_indices(3000, avg_fps=30.0)
    assert idx == list(range(0, 3000, 30)) and num == 100
    # bug-compatible times: ladder divides by the ROUNDED ratio
    assert times[:3] == [0.0, 1.0, 2.0]
    # short-but-dense (<100 s, >=100 frames): oversample to >= 100 frames
    # t=10s, fps=30 -> eff=ceil(100/10)=10 -> interval=max(1, 30//10)=3
    idx, _, num = video.dynamic_sample_frame_indices(300, avg_fps=30.0)
    assert idx == list(range(0, 300, 3)) and num == 100
    # upbound resample uses the TRUE fps for times (utils.py:79-82)
    idx, times, num = video.dynamic_sample_frame_indices(
        3000, avg_fps=30.0, frames_upbound=64, force_sample=True)
    assert num == 64 and len(idx) == 64
    np.testing.assert_allclose(times, [i / 30.0 for i in idx])


def test_load_video_dynamic_contract(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(40, 8, 8, 3), dtype=np.uint8)
    np.save(tmp_path / "vid.npy", frames)
    out, t, times, num = video.load_video_dynamic(str(tmp_path / "vid.npy"))
    # 40 frames <100 -> keep all (the n*32 rule would have cut to 32)
    assert out.shape[0] == 40 and num == 40 and t == 40.0
    np.testing.assert_array_equal(out, frames)


def test_dataset_retry_ladder(tmp_path):
    items = [
        {"id": 0, "video": "missing.npy", "conversations": [
            {"from": "human", "value": "<image> ?"}, {"from": "gpt", "value": "x"}]},
        {"id": 1, "conversations": [
            {"from": "human", "value": "hi"}, {"from": "gpt", "value": "yo"}]},
    ]
    (tmp_path / "d.json").write_text(json.dumps(items))
    ds = dataset.LazySupervisedDataset(
        str(tmp_path / "d.json"), FakeTokenizer(), video_folder=str(tmp_path)
    )
    out = ds[0]  # falls through to sample 1
    assert out["id"] == 1 and out["modality"] == "text"
    assert ds.modality_lengths[0] > 0 and ds.modality_lengths[1] < 0


def test_collate_video_batch():
    tok = FakeTokenizer()
    rng = np.random.default_rng(0)
    mcfg = MemoryConfig(hidden_size=32, patch_size=4, num_memory_tokens=2,
                        segment_frames=8, num_fine_frames=4)
    samples = []
    for f0 in (10, 20):
        enc = dataset.preprocess_qwen(
            [{"from": "human", "value": "look <image> now"},
             {"from": "gpt", "value": "ok"}], tok)
        samples.append({
            "pixels": rng.standard_normal((f0, 56, 56, 3)).astype(np.float32),
            **enc,
        })
    batch = collator.collate_video_batch(samples, mcfg)
    b, fmax = batch["pixels"].shape[:2]
    assert b == 2
    assert fmax % mcfg.segment_frames == 0
    assert batch["frame_valid"][0].sum() == 10 and batch["frame_valid"][1].sum() == 20
    assert (batch["input_ids"] != constants.IMAGE_TOKEN_INDEX).all()
    assert batch["text_len"][0] == batch["text_len"][1]  # same conversation


def test_hf_export_import_roundtrip(tmp_path):
    from memory_augmented_vlm_tpu.checkpoint.orbax_io import export_hf_safetensors
    from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model

    params = vlm.init_params(TINY, jax.random.key(0))
    export_hf_safetensors(params, TINY, str(tmp_path))
    _, model, _, _ = load_pretrained_model(str(tmp_path), None, "llava_qwen",
                                           torch_dtype="float32")
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(
        {k: model.params[k] for k in ("language_model", "vision_tower",
                                      "mm_projector", "memory")}
    )
    ref = {k: params[k] for k in ("language_model", "vision_tower",
                                  "mm_projector", "memory")}
    for a, b in zip(jax.tree.leaves(ref), flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_orbax_save_restore(tmp_path):
    from memory_augmented_vlm_tpu.checkpoint import orbax_io

    params = vlm.init_params(TINY, jax.random.key(1))
    p = orbax_io.save_checkpoint(str(tmp_path), params, step=10)
    assert orbax_io.latest_checkpoint(str(tmp_path)) == p
    orbax_io.save_checkpoint(str(tmp_path), params, step=20)
    assert orbax_io.latest_checkpoint(str(tmp_path)).endswith("checkpoint-20")
    restored = orbax_io.restore_checkpoint(
        orbax_io.latest_checkpoint(str(tmp_path)), params
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # async save: returns before the write must land; wait_for_checkpoints
    # makes it durable and restore round-trips
    orbax_io.save_checkpoint(str(tmp_path), params, step=30, block=False)
    orbax_io.wait_for_checkpoints()
    assert orbax_io.latest_checkpoint(str(tmp_path)).endswith("checkpoint-30")
    restored = orbax_io.restore_checkpoint(
        orbax_io.latest_checkpoint(str(tmp_path)), params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preprocess_plain():
    tok = FakeTokenizer()
    enc = dataset.preprocess_plain(
        [{"from": "human", "value": "<image>"}, {"from": "gpt", "value": "a cat photo"}],
        tok)
    ids, labels = enc["input_ids"], enc["labels"]
    assert ids[0] == constants.IMAGE_TOKEN_INDEX
    assert labels[0] == constants.IGNORE_INDEX
    cat_id = tok._id("cat")
    assert labels[np.where(ids == cat_id)[0][0]] == cat_id


def test_preprocess_v1_masks_user():
    tok = FakeTokenizer()
    tok.eos_token_id = 9
    enc = dataset.preprocess_v1(
        [{"from": "human", "value": "see <image> now"},
         {"from": "gpt", "value": "I see a dog"}], tok)
    ids, labels = enc["input_ids"], enc["labels"]
    assert (ids == constants.IMAGE_TOKEN_INDEX).sum() == 1
    dog_id = tok._id("dog")
    assert labels[np.where(ids == dog_id)[0][0]] == dog_id
    see_user = tok._id("see")
    assert labels[np.where(ids == see_user)[0][0]] == constants.IGNORE_INDEX
    assert ids[-1] == 9 and labels[-1] == 9  # eos supervised


def test_preprocess_llama3_structure():
    class L3Tok(FakeTokenizer):
        SPECIALS = dict(FakeTokenizer.SPECIALS)
        SPECIALS.update({"<|start_header_id|>": 4, "<|end_header_id|>": 5,
                         "<|eot_id|>": 6, "<|begin_of_text|>": 7})

    tok = L3Tok()
    enc = dataset.preprocess_llama3(
        [{"from": "human", "value": "what is <image> ?"},
         {"from": "gpt", "value": "an answer"}], tok)
    ids, labels = enc["input_ids"], enc["labels"]
    assert ids[0] == 7  # bos
    assert (ids == constants.IMAGE_TOKEN_INDEX).sum() == 1
    ans_id = tok._id("answer")
    assert labels[np.where(ids == ans_id)[0][0]] == ans_id
    what_id = tok._id("what")
    assert labels[np.where(ids == what_id)[0][0]] == constants.IGNORE_INDEX
    # structure tokens unmasked
    for sid in (4, 5, 6):
        for posn in np.where(ids == sid)[0]:
            assert labels[posn] == sid


def test_preprocess_gemma_masks_user():
    class GTok(FakeTokenizer):
        SPECIALS = dict(FakeTokenizer.SPECIALS)
        SPECIALS.update({"<start_of_turn>": 4, "<end_of_turn>": 5})
        bos_token_id = 8

    tok = GTok()
    enc = dataset.preprocess_gemma(
        [{"from": "human", "value": "look <image> here"},
         {"from": "gpt", "value": "a bird"}], tok)
    ids, labels = enc["input_ids"], enc["labels"]
    assert ids[0] == 8 and labels[0] == constants.IGNORE_INDEX
    assert (ids == constants.IMAGE_TOKEN_INDEX).sum() == 1
    bird = tok._id("bird")
    assert labels[np.where(ids == bird)[0][0]] == bird
    look = tok._id("look")
    assert labels[np.where(ids == look)[0][0]] == constants.IGNORE_INDEX
    # model turn's end_of_turn supervised, user turn's masked
    eot_pos = np.where(ids == 5)[0]
    assert labels[eot_pos[0]] == constants.IGNORE_INDEX  # user turn
    assert labels[eot_pos[1]] == 5  # model turn


def test_preprocess_llama_2_rounds():
    tok = FakeTokenizer()
    tok.bos_token_id = 8
    tok.eos_token_id = 9
    enc = dataset.preprocess_llama_2(
        [{"from": "human", "value": "describe <image>"},
         {"from": "gpt", "value": "a tree"},
         {"from": "human", "value": "more detail"},
         {"from": "gpt", "value": "tall oak"}], tok)
    ids, labels = enc["input_ids"], enc["labels"]
    assert (ids == 8).sum() == 2 and (ids == 9).sum() == 2  # bos/eos per round
    assert (ids == constants.IMAGE_TOKEN_INDEX).sum() == 1
    for word in ("tree", "oak"):
        wid = tok._id(word)
        assert labels[np.where(ids == wid)[0][0]] == wid
    inst = tok._id("[INST]")
    assert all(labels[p] == constants.IGNORE_INDEX for p in np.where(ids == inst)[0])
    # every eos supervised
    assert all(labels[p] == 9 for p in np.where(ids == 9)[0])
