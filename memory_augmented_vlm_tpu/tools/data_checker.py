"""Sample-level dataset checker / statistics / filters.

Capability parity with the reference's `playground/data_checker.py:1-364`
(DataProcessor): five operations over a JSON / JSONL / YAML-of-datasets
manifest —

  check            multiprocess per-sample validation: conversation
                   structure (alternating human/gpt pairs, required keys)
                   plus image/video file existence
                   (data_checker.py:42-101).
  count            item counts per dataset with `sampling_strategy`
                   percentages applied (data_checker.py:103-126).
  stat             modality distribution (text / single-image /
                   multi-image / video), whitespace-token length stats,
                   and the longest item (data_checker.py:128-189).
  filter           drop items whose `<image>` token count EXCEEDS the
                   number of attached visuals; write the filtered json
                   next to the source (data_checker.py:191-246).
  stat_and_filter  truncate each item's conversation pairs at a
                   whitespace-token threshold and write the filtered
                   datasets (data_checker.py:248-332).

Differences from the reference (intentional):
  - findings are RETURNED as structured records (and exit non-zero from
    the CLI when `check` finds problems) instead of only printed
    warnings, so the checker can gate a training launch;
  - sampling-strategy parsing is shared with the training dataset
    (`data/dataset.py`) rather than re-implemented;
  - filtered outputs keep the reference's naming scheme
    (`*_filtered_{threshold}tokens_{n}.json[l]`, `*fltd_{n}.json`).

Usage:
  python -m memory_augmented_vlm_tpu.tools.data_checker \
      --file_path mix.yaml --operation check \
      [--image_root ...] [--video_root ...] [--threshold N] [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

from memory_augmented_vlm_tpu.data.dataset import (
    _apply_sampling_strategy,
    _load_single,
)


# ---------------------------------------------------------------------------
# manifest handling


def _load_manifest(file_path: str):
    """Returns (datasets, is_yaml): a list of (json_path, sampling_strategy,
    items) triples. A plain json/jsonl manifest is one unnamed dataset with
    strategy 'all'."""
    if file_path.endswith((".yaml", ".yml")):
        import yaml

        with open(file_path) as f:
            spec = yaml.safe_load(f)
        out = []
        for ds in spec["datasets"]:
            items = _load_single(ds["json_path"])
            out.append((ds["json_path"], ds.get("sampling_strategy", "all"),
                        items))
        return out, True
    return [(file_path, "all", _load_single(file_path))], False


def _sampled_count(items: Sequence, strategy: str) -> int:
    return len(_apply_sampling_strategy(list(items), strategy))


# ---------------------------------------------------------------------------
# check: structure + media existence (reference data_checker.py:42-101)


def check_item_structure(item: Dict[str, Any]) -> Optional[str]:
    """Reference `check_item_structure` (data_checker.py:62-82): requires a
    `conversations` list of >=2, even length, strictly alternating
    human/gpt with `from`/`value` keys. Returns a problem string or None."""
    if "conversations" not in item:
        return "missing required field 'conversations'"
    conversations = item["conversations"]
    if (not isinstance(conversations, list) or len(conversations) < 2
            or len(conversations) % 2 != 0):
        return "invalid conversations structure"
    for i, conv in enumerate(conversations):
        if not isinstance(conv, dict) or not all(
                k in conv for k in ("from", "value")):
            return "invalid conversation format"
        expected = "human" if i % 2 == 0 else "gpt"
        if conv["from"] != expected:
            return "incorrect conversation order"
    return None


def check_media_existence(item: Dict[str, Any], image_root: str,
                          video_root: str) -> List[str]:
    """Reference `check_image_existence` (data_checker.py:42-57): every
    `image` (str or list) resolved under image_root and `video` under
    video_root must exist."""
    missing = []
    if "image" in item:
        images = item["image"] if isinstance(item["image"], list) \
            else [item["image"]]
        for image in images:
            full = os.path.join(image_root, image)
            if not os.path.exists(full):
                missing.append(full)
    if "video" in item:
        videos = item["video"] if isinstance(item["video"], list) \
            else [item["video"]]
        for video in videos:
            full = os.path.join(video_root, video)
            if not os.path.exists(full):
                missing.append(full)
    return missing


def _check_one(args) -> Optional[Dict[str, Any]]:
    item, image_root, video_root, check_media = args
    problems: Dict[str, Any] = {}
    structure = check_item_structure(item)
    if structure is not None:
        problems["structure"] = structure
    if check_media:
        missing = check_media_existence(item, image_root, video_root)
        if missing:
            problems["missing_media"] = missing
    if problems:
        problems["id"] = item.get("id", "unknown")
        return problems
    return None


def check(file_path: str, image_root: str = "", video_root: str = "",
          *, workers: Optional[int] = None, check_media: bool = True,
          verbose: bool = True) -> List[Dict[str, Any]]:
    """Multiprocess per-sample validation (reference `process_images`,
    data_checker.py:90-101 — Pool.imap over every item of every dataset).
    Returns one problem record per bad sample."""
    datasets, _ = _load_manifest(file_path)
    bad: List[Dict[str, Any]] = []
    workers = workers or max(1, min(mp.cpu_count(), 8))
    for json_path, _, items in datasets:
        tasks = [(it, image_root, video_root, check_media) for it in items]
        if workers > 1 and len(tasks) > 1:
            with mp.Pool(processes=workers) as pool:
                results = pool.imap(_check_one, tasks, chunksize=64)
                found = [r for r in results if r is not None]
        else:
            found = [r for r in map(_check_one, tasks) if r is not None]
        for rec in found:
            rec["json_path"] = json_path
        bad.extend(found)
        if verbose:
            print(f"{json_path}: {len(items)} items, "
                  f"{len(found)} problems")
    return bad


# ---------------------------------------------------------------------------
# count (reference count_items, data_checker.py:103-126)


def count_items(file_path: str, *, verbose: bool = True) -> int:
    """Total items with sampling strategies applied; per-dataset breakdown
    printed like the reference."""
    datasets, _ = _load_manifest(file_path)
    total = 0
    for json_path, strategy, items in datasets:
        n = _sampled_count(items, strategy)
        total += n
        if verbose:
            print(f"{json_path}: {n}")
    return total


# ---------------------------------------------------------------------------
# stat (reference stat_data, data_checker.py:128-189)


@dataclass
class DataStats:
    total: int = 0
    text: int = 0
    single_image: int = 0
    multiple_image: int = 0
    video: int = 0
    lengths: List[int] = field(default_factory=list)
    max_tokens: int = 0
    max_tokens_item: Optional[Dict[str, Any]] = None

    def summary(self) -> Dict[str, Any]:
        lengths = self.lengths or [0]
        return {
            "total": self.total,
            "text": self.text,
            "single_image": self.single_image,
            "multiple_image": self.multiple_image,
            "video": self.video,
            "max_length": max(lengths),
            "min_length": min(lengths),
            "avg_length": sum(lengths) / len(lengths),
            "max_tokens": self.max_tokens,
        }


def _item_token_len(item: Dict[str, Any]) -> int:
    """Whitespace-token length over all turns (the reference's
    `len(value.split())` proxy, data_checker.py:158)."""
    return sum(len(conv["value"].split())
               for conv in item.get("conversations", []))


def _classify_modality(item: Dict[str, Any]) -> str:
    if "image" in item:
        if isinstance(item["image"], list) and len(item["image"]) > 1:
            return "multiple_image"
        return "single_image"
    if "video" in item:
        return "video"
    return "text"


def stat_data(file_path: str, *, verbose: bool = True) -> DataStats:
    """Modality distribution + length stats over the sampled mixture."""
    datasets, _ = _load_manifest(file_path)
    stats = DataStats()
    for json_path, strategy, items in datasets:
        n = _sampled_count(items, strategy)
        if verbose:
            print(f"{json_path}: {n} (sampled from {len(items)})")
        for item in items[:n]:
            cur_len = _item_token_len(item)
            stats.lengths.append(cur_len)
            if cur_len > stats.max_tokens:
                stats.max_tokens = cur_len
                stats.max_tokens_item = item
            stats.total += 1
            setattr(stats, _classify_modality(item),
                    getattr(stats, _classify_modality(item)) + 1)
    if verbose and stats.total:
        s = stats.summary()
        print(f"Max length: {s['max_length']}, Min length: "
              f"{s['min_length']}, Average length: {s['avg_length']}")
        print(f"Total items: {stats.total}")
        for k in ("text", "single_image", "multiple_image", "video"):
            print(f"{k}: {s[k]} ({s[k] / stats.total * 100:.2f}%)")
    return stats


# ---------------------------------------------------------------------------
# filter (reference filter_data, data_checker.py:191-246)


def _num_visuals(item: Dict[str, Any]) -> int:
    n = 0
    for key in ("image", "video"):
        if key in item:
            n += len(item[key]) if isinstance(item[key], list) else 1
    return n


def filter_data(file_path: str, *, verbose: bool = True) -> Dict[str, str]:
    """Drop items whose `<image>` token appearances EXCEED their attached
    visual count (an over-reference crashes the splice; an under-reference
    is tolerated when text exists — data_checker.py:222). Writes
    `*fltd_{n}.json` next to each shrunken source; returns
    {json_path: output_path}."""
    datasets, _ = _load_manifest(file_path)
    written: Dict[str, str] = {}
    for json_path, _, items in datasets:
        filtered = []
        mismatches = 0
        for item in items:
            conv_text = "".join(conv["value"]
                                for conv in item.get("conversations", []))
            n_tok = conv_text.count("<image>")
            n_vis = _num_visuals(item)
            if n_tok == n_vis or (n_tok < n_vis and len(conv_text) > 0):
                filtered.append(item)
            elif n_tok > n_vis:
                mismatches += 1
        if verbose and mismatches:
            print(f"{json_path}: {mismatches} items with more <image> "
                  f"tokens than visuals")
        if len(filtered) < len(items):
            base = json_path[:-len(".jsonl")] if json_path.endswith(".jsonl")\
                else json_path[:-len(".json")]
            out_path = f"{base}fltd_{len(filtered)}.json"
            with open(out_path, "w") as f:
                json.dump(filtered, f, indent=2)
            written[json_path] = out_path
            if verbose:
                print(f"Filtered data count: {len(filtered)} -> {out_path}")
    return written


# ---------------------------------------------------------------------------
# stat_and_filter (reference stat_and_filter_data, data_checker.py:248-332)


def stat_and_filter_data(file_path: str, threshold: int, *,
                         verbose: bool = True) -> Tuple[DataStats,
                                                        Dict[str, str]]:
    """Truncate each item's conversations at whole human/gpt pairs so the
    running whitespace-token count stays <= threshold; datasets where any
    item was cut are rewritten as
    `*_filtered_{threshold}tokens_{n}.json[l]`."""
    datasets, _ = _load_manifest(file_path)
    stats = DataStats()
    written: Dict[str, str] = {}
    for json_path, strategy, items in datasets:
        if verbose:
            print(f"{json_path}: {_sampled_count(items, strategy)} "
                  f"(sampled from {len(items)})")
        filtered = []
        save_flag = False
        for item in items:
            stats.total += 1
            conversations = item.get("conversations", [])
            kept = []
            running = 0
            for i in range(0, len(conversations) - 1, 2):
                pair = conversations[i:i + 2]
                pair_tokens = sum(len(c["value"].split()) for c in pair)
                if running + pair_tokens <= threshold:
                    kept.extend(pair)
                    running += pair_tokens
                else:
                    save_flag = True
                    break
            if kept:
                item = dict(item)
                item["conversations"] = kept
                stats.lengths.append(running)
                filtered.append(item)
                setattr(stats, _classify_modality(item),
                        getattr(stats, _classify_modality(item)) + 1)
        if filtered and save_flag:
            if json_path.endswith(".jsonl"):
                out_path = json_path.replace(
                    ".jsonl", f"_filtered_{threshold}tokens_"
                              f"{len(filtered)}.jsonl")
                with open(out_path, "w") as f:
                    for item in filtered:
                        f.write(json.dumps(item) + "\n")
            else:
                out_path = json_path.replace(
                    ".json", f"_filtered_{threshold}tokens_"
                             f"{len(filtered)}.json")
                with open(out_path, "w") as f:
                    json.dump(filtered, f, indent=2)
            written[json_path] = out_path
            if verbose:
                print(f"Filtered data for {json_path} saved to: {out_path}")
    if verbose and stats.lengths:
        s = stats.summary()
        print(f"Max length: {s['max_length']}, Min length: "
              f"{s['min_length']}, Average length: {s['avg_length']}")
    return stats, written


# ---------------------------------------------------------------------------
# CLI (reference main, data_checker.py:335-364)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--file_path", required=True)
    p.add_argument("--image_root", default="")
    p.add_argument("--video_root", default="")
    p.add_argument("--operation", default="check",
                   choices=["check", "count", "filter", "stat",
                            "stat_and_filter"])
    p.add_argument("--threshold", type=int, default=None,
                   help="token threshold for stat_and_filter")
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--no-media", action="store_true",
                   help="structure-only check (skip file existence)")
    p.add_argument("--report", default=None,
                   help="write `check` problem records to this JSON file")
    args = p.parse_args(argv)

    if args.operation == "check":
        bad = check(args.file_path, args.image_root, args.video_root,
                    workers=args.workers, check_media=not args.no_media)
        for rec in bad[:20]:
            print(" ", rec)
        if args.report:
            with open(args.report, "w") as f:
                json.dump(bad, f, indent=2)
        print(f"{len(bad)} problem samples")
        return 1 if bad else 0
    if args.operation == "count":
        print(f"Total items: {count_items(args.file_path)}")
        return 0
    if args.operation == "filter":
        filter_data(args.file_path)
        return 0
    if args.operation == "stat":
        stats = stat_data(args.file_path)
        if stats.max_tokens_item is not None:
            print("\nItem with the largest number of tokens:")
            print(f"Token count: {stats.max_tokens}")
            print(json.dumps(stats.max_tokens_item, indent=2))
        return 0
    # stat_and_filter
    if args.threshold is None:
        raise ValueError(
            "Threshold must be provided for stat_and_filter operation")
    stat_and_filter_data(args.file_path, args.threshold)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
