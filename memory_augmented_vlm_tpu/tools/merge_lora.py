"""Merge LoRA factors into base weights and export — the reference's
scripts/archived/merge_lora_weights.py (peft merge_and_unload + save).

  python -m memory_augmented_vlm_tpu.tools.merge_lora \
      --model-path BASE_CKPT --lora-path LORA.npz --out MERGED_DIR \
      [--r 8 --alpha 16]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--lora-path", required=True,
                   help="npz of flattened LoRA factors (tree paths as keys)")
    p.add_argument("--out", required=True)
    p.add_argument("--r", type=int, default=None,
                   help="LoRA rank (default: inferred from the factors)")
    p.add_argument("--alpha", type=int, default=16)
    args = p.parse_args(argv)

    import jax

    from memory_augmented_vlm_tpu.checkpoint.orbax_io import export_hf_safetensors
    from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model
    from memory_augmented_vlm_tpu.train import lora as lora_mod
    from memory_augmented_vlm_tpu.utils.tree import path_str

    _, model, _, _ = load_pretrained_model(args.model_path, None, "llava_qwen",
                                           torch_dtype="float32")
    flat = dict(np.load(args.lora_path))
    # the rank is recoverable from the A-factor shapes; a mismatching --r
    # would silently mis-scale every merged delta (scale = alpha / r)
    ranks = {int(v.shape[-1]) for key, v in flat.items() if key.endswith(".a")}
    if len(ranks) != 1:
        raise ValueError(f"inconsistent LoRA ranks in {args.lora_path}: {ranks}")
    inferred_r = ranks.pop()
    if args.r is not None and args.r != inferred_r:
        raise ValueError(f"--r {args.r} conflicts with the factors' rank "
                         f"{inferred_r}")
    cfg = lora_mod.LoraConfig(r=inferred_r, alpha=args.alpha)

    def rebuild(path, leaf):
        key = path_str(path)
        a, b = flat.get(key + ".a"), flat.get(key + ".b")
        if a is None or b is None:
            return None
        return {"a": a, "b": b}

    factors = jax.tree_util.tree_map_with_path(rebuild, model.params)
    merged = lora_mod.merge_and_unload(model.params, factors, cfg)
    export_hf_safetensors(merged, model.cfg, args.out)
    print(f"merged checkpoint -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
