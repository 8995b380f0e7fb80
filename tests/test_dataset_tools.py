"""Dataset analysis one-offs: dataset_stats (playground/2d_hist.py port)
and mixture_dedup (scripts/summarize_data.py port, generalized)."""

import json

import numpy as np
import pytest

from memory_augmented_vlm_tpu.tools import dataset_stats, mixture_dedup


@pytest.fixture()
def corpus(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    sizes = [(64, 48), (128, 96), (64, 48)]
    for i, (w, h) in enumerate(sizes):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                        ).save(img_dir / f"im{i}.jpg")
    data = [
        {"id": "a", "image": "im0.jpg",
         "conversations": [{"from": "human", "value": "what is this"},
                           {"from": "gpt", "value": "a thing"}]},
        {"id": "b", "image": ["im1.jpg", "im2.jpg"],
         "conversations": [{"from": "human", "value": "two images here"}]},
        {"id": "c",  # text-only: filtered out of the image histogram
         "conversations": [{"from": "human", "value": "just text"}]},
    ]
    json_path = tmp_path / "data.json"
    json_path.write_text(json.dumps(data))
    return tmp_path, json_path, img_dir, data


def test_dataset_stats_end_to_end(corpus):
    tmp_path, json_path, img_dir, data = corpus
    out = tmp_path / "dist.png"
    rc = dataset_stats.main(["--json-path", str(json_path),
                             "--images-folder", str(img_dir),
                             "--out", str(out), "--num-processes", "1"])
    assert rc == 0
    assert out.stat().st_size > 0

    widths, heights = dataset_stats.image_dimensions(
        dataset_stats.filter_data(data), str(img_dir), num_processes=1)
    assert sorted(widths) == [64, 64, 128]
    assert sorted(heights) == [48, 48, 96]
    # whitespace tokenization over the two image-carrying items
    assert sorted(dataset_stats.tokenized_lengths(
        dataset_stats.filter_data(data))) == [2, 3, 3]


def test_dataset_stats_tolerates_missing_images(corpus, capsys):
    _, _, img_dir, _ = corpus
    w, h = dataset_stats.image_dimension("nope.jpg", str(img_dir))
    assert w is None and h is None
    assert "Error opening" in capsys.readouterr().out


def test_mixture_dedup_subtract_add(tmp_path):
    def item(i, text, image=None):
        d = {"id": i, "conversations": [{"from": "human", "value": text}]}
        if image:
            d["image"] = image
        return d

    base = [item("a", "x", "a.jpg"), item("b", "y", "b.jpg"),
            item("c", "z"),                 # text-only slice
            item("a", "EDITED", "a.jpg")]   # same id, different conv: kept
    sub = [item("a", "x", "other.jpg")]     # key = id+conv, image ignored
    extra = [item("d", "new", "d.jpg")]
    for name, payload in (("base", base), ("sub", sub), ("extra", extra)):
        (tmp_path / f"{name}.json").write_text(json.dumps(payload))
    out = tmp_path / "out.json"

    rc = mixture_dedup.main([
        "--base", str(tmp_path / "base.json"),
        "--subtract", str(tmp_path / "sub.json"),
        "--text-only-subtract",
        "--add", str(tmp_path / "extra.json"),
        "--out", str(out)])
    assert rc == 0
    result = json.loads(out.read_text())
    keys = [(it["id"], it["conversations"][0]["value"]) for it in result]
    # "a"/x subtracted, "c" text-only subtracted, edited "a" and "b" kept,
    # "d" appended
    assert keys == [("b", "y"), ("a", "EDITED"), ("d", "new")]
