"""Dataset video downloader — the `video_marathon.py` equivalent.

Downloads dataset videos by id/url list via yt-dlp (gated: this image is
zero-egress and yt-dlp is not bundled; the tool checks and reports).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video-list", required=True,
                   help="JSON list of {id|url} entries")
    p.add_argument("--output-folder", required=True)
    p.add_argument("--num-workers", type=int, default=4)
    args = p.parse_args(argv)

    if shutil.which("yt-dlp") is None:
        raise SystemExit("yt-dlp is not installed (and this environment has "
                         "no egress); install it to download videos")
    with open(args.video_list) as f:
        items = json.load(f)
    os.makedirs(args.output_folder, exist_ok=True)
    failures = []
    for it in items:
        url = it.get("url") or f"https://www.youtube.com/watch?v={it['id']}"
        out = os.path.join(args.output_folder, f"{it.get('id', 'video')}.%(ext)s")
        r = subprocess.run(["yt-dlp", "-f", "mp4", "-o", out, url],
                           capture_output=True)
        if r.returncode != 0:
            failures.append(url)
    print(f"downloaded {len(items) - len(failures)}/{len(items)}; "
          f"{len(failures)} failures")


if __name__ == "__main__":
    main()
