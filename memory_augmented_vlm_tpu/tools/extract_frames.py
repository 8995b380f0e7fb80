"""Offline frame pre-extraction — the `extract_video_frames/
video_reader_tmp.py` equivalent: multiprocess decode of dataset videos into
per-video tensor files that the training pipeline loads directly
(train.py:1183-1231 `.pt`/tensor branch; we emit `.npy`, which both the
python and native loaders read).

Usage:
  python -m memory_augmented_vlm_tpu.tools.extract_frames \
      --video-list videos.json --video-folder /data/videos \
      --output-folder /data/videos_tensors [--image-size 384] \
      [--num-workers 8] [--shard-idx 0 --num-shards 1]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
from typing import Tuple

import numpy as np


def _process_one(args: Tuple[str, str, str, int]) -> Tuple[str, bool, str]:
    video_rel, video_folder, output_folder, image_size = args
    try:
        from memory_augmented_vlm_tpu.data.preprocessing import SigLipImageProcessor
        from memory_augmented_vlm_tpu.data.video import load_video

        src = os.path.join(video_folder, video_rel)
        frames, *_ = load_video(src)
        proc = SigLipImageProcessor(size=(image_size, image_size))
        pixels = proc.preprocess(frames).astype(np.float32)
        out_path = os.path.join(
            output_folder, os.path.splitext(video_rel)[0] + ".npy")
        os.makedirs(os.path.dirname(out_path) or output_folder, exist_ok=True)
        np.save(out_path, pixels)
        return video_rel, True, ""
    except Exception as e:  # noqa: BLE001 — report, keep the shard going
        return video_rel, False, str(e)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video-list", required=True,
                   help="JSON list of relative video paths, or a dataset JSON "
                        "whose items have a 'video' field")
    p.add_argument("--video-folder", required=True)
    p.add_argument("--output-folder", required=True)
    p.add_argument("--image-size", type=int, default=384)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--shard-idx", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    args = p.parse_args(argv)

    with open(args.video_list) as f:
        items = json.load(f)
    videos = sorted({
        it["video"] if isinstance(it, dict) else it
        for it in items
        if not isinstance(it, dict) or "video" in it
    })
    videos = videos[args.shard_idx :: args.num_shards]
    os.makedirs(args.output_folder, exist_ok=True)

    tasks = [(v, args.video_folder, args.output_folder, args.image_size)
             for v in videos]
    ok = bad = 0
    with mp.Pool(args.num_workers) as pool:
        for rel, success, err in pool.imap_unordered(_process_one, tasks):
            if success:
                ok += 1
            else:
                bad += 1
                print(f"FAILED {rel}: {err}")
    print(f"extracted {ok} videos, {bad} failures -> {args.output_folder}")


if __name__ == "__main__":
    main()
