"""Dataset-mixture set algebra (reference scripts/summarize_data.py:1-81,
generalized: the reference hardcodes cluster paths and one specific
subtraction — mix665k minus instruct_150k minus its ShareGPT slice plus a
Mixtral set; this exposes the same operation as a CLI).

Items are keyed by ``id`` + the concatenation of every conversation turn's
``value`` (the reference's duplicate key, :13-18), so two items with the
same id but edited conversations count as distinct.

  python -m memory_augmented_vlm_tpu.tools.mixture_dedup \
      --base mix.json --subtract a.json b.json --add extra.json \
      --out filtered.json [--text-only-subtract]
"""

from __future__ import annotations

import argparse
import json
from typing import Iterable, Set


def item_key(item: dict) -> str:
    all_conv = "".join(c["value"] for c in item["conversations"])
    return f'{item["id"]}_{all_conv}'


def key_set(data: Iterable[dict], text_only: bool = False) -> Set[str]:
    """Keys of a dataset; ``text_only`` keeps only items without an
    "image" field (the reference's ShareGPT-slice selection, :27-33)."""
    return {item_key(it) for it in data
            if not text_only or "image" not in it}


def subtract(base: list, remove_keys: Set[str]) -> list:
    return [it for it in base if item_key(it) not in remove_keys]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--base", required=True, help="mixture JSON to filter")
    p.add_argument("--subtract", nargs="*", default=[],
                   help="datasets whose items are removed from base")
    p.add_argument("--text-only-subtract", action="store_true",
                   help="also subtract base's own text-only (no-image) "
                   "items (the reference's ShareGPT slice)")
    p.add_argument("--add", nargs="*", default=[],
                   help="datasets appended after filtering")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    with open(args.base) as f:
        base = json.load(f)
    print(f"base: {len(base)} items")

    remove: Set[str] = set()
    for path in args.subtract:
        with open(path) as f:
            other = json.load(f)
        ks = key_set(other)
        print(f"subtract {path}: {len(ks)} keys")
        remove |= ks
    if args.text_only_subtract:
        ks = key_set(base, text_only=True)
        print(f"subtract text-only slice of base: {len(ks)} keys")
        remove |= ks

    new_data = subtract(base, remove)
    for path in args.add:
        with open(path) as f:
            extra = json.load(f)
        print(f"add {path}: {len(extra)} items")
        new_data.extend(extra)

    print(f"result: {len(new_data)} items")
    with open(args.out, "w") as f:
        json.dump(new_data, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
