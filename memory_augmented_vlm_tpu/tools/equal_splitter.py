"""Dataset splitter — the playground/equal_splitter.py equivalent: shard a
dataset JSON into N equal parts (for multi-host offline processing)."""

from __future__ import annotations

import argparse
import json
import os


def split(items, num_shards):
    return [items[i::num_shards] for i in range(num_shards)]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--num-shards", type=int, required=True)
    p.add_argument("--output-prefix", default=None)
    args = p.parse_args(argv)
    with open(args.data_path) as f:
        items = json.load(f)
    prefix = args.output_prefix or os.path.splitext(args.data_path)[0]
    for i, shard in enumerate(split(items, args.num_shards)):
        with open(f"{prefix}.shard{i:03d}.json", "w") as f:
            json.dump(shard, f)
    print(f"wrote {args.num_shards} shards ({len(items)} items)")


if __name__ == "__main__":
    main()
