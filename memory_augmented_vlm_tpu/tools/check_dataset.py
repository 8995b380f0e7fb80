"""Dataset integrity tools.

Capability parity with scripts/train/check_dataset.py (YAML json_path
existence) and playground/data_checker.py (sample-level media existence,
multiprocess).

Usage:
  python -m memory_augmented_vlm_tpu.tools.check_dataset --data_path mix.yaml \
      [--image_folder ...] [--video_folder ...] [--num-workers 8]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
from typing import Dict, List, Optional, Tuple


def check_yaml_paths(data_path: str) -> List[Tuple[str, bool]]:
    """Verify every json_path in a dataset YAML exists."""
    import yaml

    with open(data_path) as f:
        spec = yaml.safe_load(f)
    return [(ds["json_path"], os.path.exists(ds["json_path"]))
            for ds in spec.get("datasets", [])]


def _check_sample(args) -> Optional[Dict]:
    item, image_folder, video_folder = args
    missing = []
    if "image" in item:
        p = item["image"]
        full = p if os.path.isabs(p) else os.path.join(image_folder or "", p)
        if not os.path.exists(full):
            missing.append(("image", full))
    if "video" in item:
        p = item["video"]
        full = p if os.path.isabs(p) else os.path.join(video_folder or "", p)
        if not os.path.exists(full):
            missing.append(("video", full))
    if not item.get("conversations"):
        missing.append(("conversations", "empty"))
    if missing:
        return {"id": item.get("id"), "missing": missing}
    return None


def check_samples(
    data_path: str,
    image_folder: Optional[str] = None,
    video_folder: Optional[str] = None,
    num_workers: int = 8,
) -> List[Dict]:
    from memory_augmented_vlm_tpu.data.dataset import load_data_manifest

    items = load_data_manifest(data_path)
    tasks = [(it, image_folder, video_folder) for it in items]
    bad: List[Dict] = []
    with mp.Pool(num_workers) as pool:
        for res in pool.imap_unordered(_check_sample, tasks, chunksize=64):
            if res is not None:
                bad.append(res)
    return bad


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--image_folder", default=None)
    p.add_argument("--video_folder", default=None)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--report", default=None, help="write failures to JSON")
    args = p.parse_args(argv)

    if args.data_path.endswith((".yaml", ".yml")):
        for path, ok in check_yaml_paths(args.data_path):
            print(f"{'OK ' if ok else 'MISSING'} {path}")
    bad = check_samples(args.data_path, args.image_folder, args.video_folder,
                        args.num_workers)
    print(f"{len(bad)} samples with missing media")
    for b in bad[:20]:
        print(" ", b)
    if args.report:
        with open(args.report, "w") as f:
            json.dump(bad, f, indent=2)


if __name__ == "__main__":
    main()
