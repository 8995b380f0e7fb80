"""Dataset uploader — capability parity with the reference's
`playground/upload_data.py:175-217`: stream (json_path, short_name) pairs
into HF-hub dataset configs (`Dataset.from_generator` + `push_to_hub`),
loading each item's image from disk and skipping unreadable records.

Differences from the reference (intentional):
  - the dataset list is a CLI/manifest input, not an edit-in-place python
    list of hardcoded cluster paths;
  - the `datasets` / PIL imports are gated so the module imports (and the
    record generator is testable) without the hub stack installed;
  - `--dry_run` exercises the full record pipeline without pushing.

Usage:
  python -m memory_augmented_vlm_tpu.tools.upload_data \
      --json_path data.json --short_name my_subset \
      --image_root /data/images --repo_id org/dataset [--dry_run]
  # or a manifest of many subsets:
  python -m memory_augmented_vlm_tpu.tools.upload_data \
      --manifest subsets.json --image_root /data/images --repo_id org/ds
  # subsets.json: [{"json_path": ..., "short_name": ...}, ...]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Iterator, Optional


def load_items(json_path: str):
    """json / jsonl loader (reference upload_data.py:177-182)."""
    if json_path.endswith(".jsonl"):
        with open(json_path) as f:
            return [json.loads(line) for line in f if line.strip()]
    with open(json_path) as f:
        return json.load(f)


def iter_records(json_path: str, short_name: str, image_root: str = "",
                 *, load_image=None, skip_first: int = 0,
                 verbose: bool = True) -> Iterator[Dict[str, Any]]:
    """Yield upload records {id, image, conversations, data_source} —
    the reference's `gen()` (upload_data.py:176-210): items with unreadable
    images are skipped (not failed), ids default to a running index, and
    `skip_first` mirrors the preview_index skip-n behavior.

    `load_image(path) -> object|None` is injectable so tests run without
    PIL; the default opens the file with PIL when available, else returns
    the raw bytes."""
    if load_image is None:
        load_image = _default_load_image
    items = load_items(json_path)
    idx = 0
    for n, item in enumerate(items):
        if n < skip_first:
            continue
        try:
            if "image" in item and not isinstance(item["image"], list):
                image_path = os.path.join(image_root, item["image"])
                image = load_image(image_path)
                if image is None:
                    if verbose:
                        print(f"Failed to load image {item['image']}")
                    continue
            else:
                image = None
            item_id = item["id"] if "id" in item else f"{idx:06d}"
            yield {"id": item_id, "image": image,
                   "conversations": item["conversations"],
                   "data_source": short_name}
            idx += 1
        except Exception as e:  # noqa: BLE001 — reference skips bad records
            if verbose:
                print(e)
            continue


def _default_load_image(path: str):
    try:
        from io import BytesIO

        import PIL.Image as pil_image

        with open(path, "rb") as f:
            return pil_image.open(BytesIO(f.read()))
    except ImportError:
        try:
            with open(path, "rb") as f:
                return f.read()
        except OSError:
            return None
    except OSError:
        return None


def upload_subset(json_path: str, short_name: str, repo_id: str,
                  image_root: str = "", *, split: str = "train",
                  num_proc: Optional[int] = None,
                  dry_run: bool = False) -> int:
    """Push one subset as a named config (reference upload_data.py:213-214).
    Returns the record count. With dry_run the records are materialized but
    nothing leaves the machine."""
    if dry_run:
        return sum(1 for _ in iter_records(json_path, short_name,
                                           image_root))
    try:
        from datasets import Dataset
    except ImportError as e:  # pragma: no cover — hub stack not in image
        raise RuntimeError(
            "the `datasets` package is required to push to the hub; "
            "use --dry_run to validate the record pipeline without it"
        ) from e
    ds = Dataset.from_generator(
        generator=lambda: iter_records(json_path, short_name, image_root),
        num_proc=num_proc)
    ds.push_to_hub(repo_id, config_name=short_name, split=split)
    return len(ds)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--json_path", default=None)
    p.add_argument("--short_name", default=None)
    p.add_argument("--manifest", default=None,
                   help="JSON list of {json_path, short_name} pairs")
    p.add_argument("--image_root", default="")
    p.add_argument("--repo_id", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--num_proc", type=int, default=None)
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args(argv)

    if args.manifest:
        with open(args.manifest) as f:
            subsets = json.load(f)
    elif args.json_path and args.short_name:
        subsets = [{"json_path": args.json_path,
                    "short_name": args.short_name}]
    else:
        p.error("provide --manifest or both --json_path and --short_name")

    for sub in subsets:
        n = upload_subset(sub["json_path"], sub["short_name"],
                          args.repo_id, args.image_root,
                          split=args.split, num_proc=args.num_proc,
                          dry_run=args.dry_run)
        print(f"{sub['short_name']}: {n} records"
              f"{' (dry run)' if args.dry_run else ' pushed'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
