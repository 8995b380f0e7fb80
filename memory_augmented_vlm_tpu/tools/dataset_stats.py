"""Dataset distribution plots: image width/height 2D histogram + whitespace
token-length histogram (reference playground/2d_hist.py:1-132, with the
hardcoded cluster defaults replaced by required args).

  python -m memory_augmented_vlm_tpu.tools.dataset_stats \
      --json-path data.json --images-folder /data/images --out dist.png

Same analysis surface: filter to items with an "image" field, measure every
image's (width, height) with a process pool, whitespace-tokenize every
conversation turn, render the two panels (2D w/h density + log-scale
length bars) and print the max dimensions.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
from multiprocessing import Pool
from typing import List, Optional, Tuple

import numpy as np


def load_data(json_path: str) -> list:
    with open(json_path) as f:
        return json.load(f)


def filter_data(data: list) -> list:
    return [item for item in data if "image" in item]


def image_dimension(image_path: str, images_folder: str
                    ) -> Tuple[Optional[int], Optional[int]]:
    from PIL import Image

    full_path = os.path.join(images_folder, image_path)
    try:
        with Image.open(full_path) as img:
            return img.size
    except Exception as e:  # noqa: BLE001 - mirror the tolerant reference
        print(f"Error opening {full_path}: {e}")
        return None, None


def image_dimensions(filtered_data: list, images_folder: str,
                     num_processes: int = 8
                     ) -> Tuple[List[int], List[int]]:
    image_paths: List[str] = []
    for item in filtered_data:
        if isinstance(item["image"], list):
            image_paths.extend(item["image"])
        else:
            image_paths.append(item["image"])
    if num_processes > 1:
        with Pool(num_processes) as p:
            dims = p.map(functools.partial(
                image_dimension, images_folder=images_folder), image_paths)
    else:
        dims = [image_dimension(p, images_folder) for p in image_paths]
    pairs = [d for d in dims if d[0] is not None]
    if not pairs:
        return [], []
    widths, heights = zip(*pairs)
    return list(widths), list(heights)


def tokenized_lengths(data: list) -> List[int]:
    return [len(conv["value"].split())
            for item in data for conv in item["conversations"]]


def render(widths: List[int], heights: List[int], lengths: List[int],
           name: str, out_path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(24, 12))

    wb = ([min(widths), max(widths) + 1] if min(widths) == max(widths)
          else np.arange(min(widths), max(widths) + 100, 100))
    hb = ([min(heights), max(heights) + 1] if min(heights) == max(heights)
          else np.arange(min(heights), max(heights) + 100, 100))
    _, _, _, im = ax1.hist2d(widths, heights, bins=[wb, hb],
                             cmap=plt.cm.jet, density=True)
    fig.colorbar(im, ax=ax1)
    ax1.set_xlabel("Width")
    ax1.set_ylabel("Height")
    ax1.set_title(f"dist_{name}_2d_w_h\nMax width: {max(widths)}, "
                  f"Max height: {max(heights)}", fontsize=10)

    bins = np.arange(0, max(lengths) + 10, 10)
    hist, bin_edges = np.histogram(lengths, bins=bins)
    ax2.bar(bin_edges[:-1], hist, width=7, edgecolor="black", log=True)
    ticks = bins[::8]
    ax2.set_xticks(ticks)
    ax2.set_xticklabels([int(t) for t in ticks], rotation=90, fontsize=8)
    ax2.set_xlim(min(bin_edges), max(bin_edges))
    ax2.set_xlabel("Tokenized Length")
    ax2.set_ylabel("Count (log scale)")
    ax2.set_title(f"dist_{name}_tokenized_length", fontsize=8)

    plt.tight_layout()
    plt.savefig(out_path)
    plt.close(fig)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--json-path", required=True)
    p.add_argument("--images-folder", required=True)
    p.add_argument("--out", help="output PNG (default ./dist_<name>_combined.png)")
    p.add_argument("--num-processes", type=int, default=8)
    args = p.parse_args(argv)

    name = os.path.basename(args.json_path).replace(".json", "")
    data = load_data(args.json_path)
    filtered = filter_data(data)
    print(f"Total data items: {len(data)}, Filtered data items: {len(filtered)}")

    widths, heights = image_dimensions(filtered, args.images_folder,
                                       args.num_processes)
    if not widths:
        print("no readable images")
        return 1
    print(f"Max width: {max(widths)}, Max height: {max(heights)}")

    lengths = tokenized_lengths(filtered)
    out = args.out or f"./dist_{name}_combined.png"
    render(widths, heights, lengths, name, out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
