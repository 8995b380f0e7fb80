"""tools/data_checker.py — parity with the reference's
playground/data_checker.py operations over a synthetic corrupt corpus:
structure violations, missing media, sampled counts, modality stats, the
<image>-token mismatch filter, and token-threshold truncation."""

import json
import os

import pytest

from memory_augmented_vlm_tpu.tools import data_checker as dc


def _conv(*turns):
    out = []
    for i, text in enumerate(turns):
        out.append({"from": "human" if i % 2 == 0 else "gpt", "value": text})
    return out


@pytest.fixture
def corpus(tmp_path):
    """Two datasets under a YAML mixture + media roots with one missing
    image and one missing video."""
    img_root = tmp_path / "images"
    vid_root = tmp_path / "videos"
    img_root.mkdir()
    vid_root.mkdir()
    (img_root / "ok.jpg").write_bytes(b"\xff\xd8fake")
    (vid_root / "ok.mp4").write_bytes(b"\x00fake")

    ds_a = [
        # good single image
        {"id": "a0", "image": "ok.jpg",
         "conversations": _conv("<image>\nWhat?", "A cat.")},
        # missing image file
        {"id": "a1", "image": "gone.jpg",
         "conversations": _conv("<image>\nWhat?", "Unknown.")},
        # structure: odd number of turns
        {"id": "a2", "conversations": _conv("hi", "yo", "again")},
        # structure: wrong order (starts with gpt)
        {"id": "a3", "conversations": [
            {"from": "gpt", "value": "hello"},
            {"from": "human", "value": "hi"}]},
        # structure: missing conversations
        {"id": "a4", "image": "ok.jpg"},
    ]
    ds_b = [
        {"id": "b0", "video": "ok.mp4",
         "conversations": _conv("<image>\nDescribe.", "A video.")},
        {"id": "b1", "video": "gone.mp4",
         "conversations": _conv("<image>\nDescribe.", "Missing.")},
        # text-only, long (12 + 8 = 20 whitespace tokens over two pairs)
        {"id": "b2", "conversations": _conv(
            "one two three four five six", "seven eight nine ten",
            "eleven twelve thirteen fourteen", "fifteen sixteen")},
        # multi-image
        {"id": "b3", "image": ["ok.jpg", "ok.jpg"],
         "conversations": _conv("<image><image>\nCompare.", "Same.")},
        # more <image> tokens than visuals -> filter() must drop it
        {"id": "b4", "image": "ok.jpg",
         "conversations": _conv("<image><image>\nBoth?", "No.")},
    ]
    a_path = tmp_path / "a.json"
    b_path = tmp_path / "b.jsonl"
    a_path.write_text(json.dumps(ds_a))
    b_path.write_text("\n".join(json.dumps(x) for x in ds_b))
    yaml_path = tmp_path / "mix.yaml"
    yaml_path.write_text(
        "datasets:\n"
        f"  - json_path: {a_path}\n"
        "    sampling_strategy: all\n"
        f"  - json_path: {b_path}\n"
        "    sampling_strategy: first:80%\n")
    return dict(yaml=str(yaml_path), a=str(a_path), b=str(b_path),
                img=str(img_root), vid=str(vid_root))


def test_check_finds_structure_and_media_problems(corpus):
    bad = dc.check(corpus["yaml"], corpus["img"], corpus["vid"],
                   workers=1, verbose=False)
    by_id = {rec["id"]: rec for rec in bad}
    # a1: media missing only
    assert "missing_media" in by_id["a1"] and "structure" not in by_id["a1"]
    assert by_id["a1"]["missing_media"][0].endswith("gone.jpg")
    # a2/a3/a4: structure problems (reference check_item_structure semantics)
    assert by_id["a2"]["structure"] == "invalid conversations structure"
    assert by_id["a3"]["structure"] == "incorrect conversation order"
    assert by_id["a4"]["structure"] == "missing required field 'conversations'"
    # b1: missing video
    assert by_id["b1"]["missing_media"][0].endswith("gone.mp4")
    # good samples don't appear; b4's mismatch is filter()'s job, not check's
    for good in ("a0", "b0", "b2", "b3", "b4"):
        assert good not in by_id
    # every record is attributed to its source file
    assert by_id["a1"]["json_path"] == corpus["a"]


def test_check_multiprocess_matches_serial(corpus):
    serial = dc.check(corpus["yaml"], corpus["img"], corpus["vid"],
                      workers=1, verbose=False)
    parallel = dc.check(corpus["yaml"], corpus["img"], corpus["vid"],
                        workers=4, verbose=False)
    key = lambda r: r["id"]
    assert sorted(serial, key=key) == sorted(parallel, key=key)


def test_count_applies_sampling(corpus):
    # a: 5 items at 'all'; b: 5 items at first:80% -> 4
    assert dc.count_items(corpus["yaml"], verbose=False) == 9


def test_stat_modality_distribution(corpus):
    stats = dc.stat_data(corpus["yaml"], verbose=False)
    assert stats.total == 9
    # a: a0 single, a1 single, a2/a3 text, a4 single (structure isn't
    # stat's concern); b(first 4): b0 video, b1 video, b2 text, b3 multi
    assert stats.single_image == 3
    assert stats.multiple_image == 1
    assert stats.video == 2
    assert stats.text == 3
    assert stats.max_tokens == 16
    assert stats.max_tokens_item["id"] == "b2"


def test_filter_drops_image_token_mismatch(corpus):
    written = dc.filter_data(corpus["yaml"], verbose=False)
    # b shrinks (b4 has 2 <image> tokens but 1 visual); a shrinks too (a4
    # has a visual but EMPTY conversation text — the reference's
    # `len(conv_text) > 0` clause drops it, data_checker.py:222)
    assert sorted(written) == sorted([corpus["a"], corpus["b"]])
    out_a = json.loads(open(written[corpus["a"]]).read())
    assert [x["id"] for x in out_a] == ["a0", "a1", "a2", "a3"]
    out = json.loads(open(written[corpus["b"]]).read())
    assert [x["id"] for x in out] == ["b0", "b1", "b2", "b3"]
    assert written[corpus["b"]].endswith("fltd_4.json")


def test_stat_and_filter_truncates_pairs(corpus):
    stats, written = dc.stat_and_filter_data(corpus["yaml"], 15,
                                             verbose=False)
    # b2 (20 tokens over two pairs) must be cut to its first pair (10 tokens)
    assert corpus["b"] in written
    lines = open(written[corpus["b"]]).read().strip().splitlines()
    out = [json.loads(l) for l in lines]
    b2 = next(x for x in out if x["id"] == "b2")
    assert len(b2["conversations"]) == 2
    assert b2["conversations"][0]["value"].startswith("one two")
    assert written[corpus["b"]].endswith(f"_filtered_15tokens_{len(out)}.jsonl")
    # every kept item's token count respects the threshold
    assert all(dc._item_token_len(x) <= 15 for x in out)


def test_cli_check_exit_codes(corpus, tmp_path, capsys):
    report = tmp_path / "report.json"
    rc = dc.main(["--file_path", corpus["yaml"],
                  "--image_root", corpus["img"],
                  "--video_root", corpus["vid"],
                  "--workers", "1", "--report", str(report)])
    assert rc == 1  # problems found -> non-zero (gates a training launch)
    assert len(json.loads(report.read_text())) == 5
    # a clean corpus exits 0
    clean = tmp_path / "clean.json"
    clean.write_text(json.dumps([
        {"id": "c0", "conversations": _conv("hi", "hello")}]))
    assert dc.main(["--file_path", str(clean), "--workers", "1"]) == 0


def test_upload_iter_records(corpus, tmp_path):
    """upload_data.iter_records — reference gen() semantics: unreadable
    images skip the record, ids default to a running index, list-valued
    images upload without an image payload."""
    from memory_augmented_vlm_tpu.tools import upload_data as up

    def fake_load(path):
        return b"IMG" if os.path.exists(path) else None

    recs = list(up.iter_records(corpus["a"], "subset_a", corpus["img"],
                                load_image=fake_load, verbose=False))
    ids = [r["id"] for r in recs]
    # a1 (missing image) is skipped; a4 crashes on missing conversations
    # and is skipped (reference's try/except-continue)
    assert ids == ["a0", "a2", "a3"]
    assert all(r["data_source"] == "subset_a" for r in recs)
    assert recs[0]["image"] == b"IMG"
    assert recs[1]["image"] is None  # text-only record

    # id defaults to a running index when absent
    anon = tmp_path / "anon.json"
    anon.write_text(json.dumps([
        {"conversations": _conv("hi", "yo")},
        {"conversations": _conv("a", "b")}]))
    recs = list(up.iter_records(str(anon), "s", verbose=False))
    assert [r["id"] for r in recs] == ["000000", "000001"]

    # dry-run upload counts without the datasets package
    assert up.upload_subset(str(anon), "s", "org/repo", dry_run=True) == 2
