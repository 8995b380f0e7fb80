"""Checkpoint garbage collection — the reference's
playground/remove_mid_ckpt.py: delete intermediate `checkpoint-*` directories
under a run dir, keeping the N most recent (by step number).

  python -m memory_augmented_vlm_tpu.tools.remove_mid_ckpt RUN_DIR \
      [--keep 1] [--dry-run]
"""

from __future__ import annotations

import argparse
import re
import shutil
import sys


def find_checkpoints(run_dir: str):
    import os

    out = []
    for name in os.listdir(run_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and os.path.isdir(os.path.join(run_dir, name)):
            out.append((int(m.group(1)), os.path.join(run_dir, name)))
    return sorted(out)


def remove_mid_checkpoints(run_dir: str, keep: int = 1,
                           dry_run: bool = False) -> list:
    """Remove all but the `keep` highest-step checkpoints; returns the
    removed paths."""
    if keep < 0:
        raise ValueError(f"keep must be >= 0, got {keep}")
    ckpts = find_checkpoints(run_dir)
    doomed = ckpts[:-keep] if keep > 0 else ckpts
    removed = []
    for _, path in doomed:
        if not dry_run:
            shutil.rmtree(path)
        removed.append(path)
    return removed


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    def _nonneg(v):
        iv = int(v)
        if iv < 0:
            raise argparse.ArgumentTypeError("--keep must be >= 0")
        return iv

    p.add_argument("--keep", type=_nonneg, default=1)
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)
    removed = remove_mid_checkpoints(args.run_dir, args.keep, args.dry_run)
    verb = "would remove" if args.dry_run else "removed"
    for path in removed:
        print(f"{verb} {path}")
    print(f"{verb} {len(removed)} checkpoint dir(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
