"""Vision tower registry — `build_vision_tower` selection rules
(reference: llava/model/multimodal_encoder/builder.py:13-41):

  "siglip" in name                  -> SigLIP tower (ACTIVE,
                                       google/siglip-so400m-patch14-384)
  path exists / openai / laion      -> CLIP (or CLIP-S2 when s2=True)
  "mlcd-vit-bigG-patch14"           -> MLCD RoPE-2D ViT      (roadmap)
  "hf:" prefix                      -> generic HF vision     (roadmap)
  "open_clip_hub"                   -> OpenCLIP              (roadmap)
  "imagebind_huge"                  -> ImageBind             (roadmap)
  EVA-CLIP trees                    -> disabled in the reference too
                                       (builder.py:36-39)
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax

from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import clip as clip_mod
from memory_augmented_vlm_tpu.models import siglip as siglip_mod


class VisionTower(NamedTuple):
    family: str
    config: Any
    forward: Callable          # (params, pixels) -> (B, N, hidden)
    hidden_size: int
    num_patches_per_side: int
    image_size: int


def build_vision_tower(vision_tower_name: str, *, s2: bool = False,
                       vision_config: Any = None) -> VisionTower:
    name = vision_tower_name.lower()
    if "siglip" in name:
        cfg = vision_config or VisionConfig()
        return VisionTower(
            family="siglip",
            config=cfg,
            forward=lambda params, pixels: siglip_mod.forward(params, cfg, pixels),
            hidden_size=cfg.hidden_size,
            num_patches_per_side=cfg.num_patches_per_side,
            image_size=cfg.image_size,
        )
    if "mlcd" in name:
        from memory_augmented_vlm_tpu.models import mlcd as mlcd_mod

        cfg = vision_config or mlcd_mod.MLCDVisionConfig()
        return VisionTower(
            family="mlcd",
            config=cfg,
            forward=lambda params, pixels: mlcd_mod.forward(params, cfg, pixels),
            hidden_size=cfg.hidden_size,
            num_patches_per_side=cfg.num_patches_per_side,
            image_size=cfg.image_size,
        )
    if ("open_clip" in name or "imagebind" in name or name.startswith("hf:")):
        raise ValueError(f"Unknown vision tower: {vision_tower_name} "
                         "(hf:/open_clip/imagebind are roadmap items)")
    if "clip" in name or "openai" in name or "laion" in name or name.startswith("/"):
        cfg = vision_config or clip_mod.CLIPVisionConfig()
        fwd = (
            (lambda params, pixels: clip_mod.s2_forward(params, cfg, pixels))
            if s2 else
            (lambda params, pixels: clip_mod.forward(params, cfg, pixels))
        )
        return VisionTower(
            family="clip_s2" if s2 else "clip",
            config=cfg,
            forward=fwd,
            hidden_size=cfg.hidden_size * (3 if s2 else 1),
            num_patches_per_side=cfg.num_patches_per_side,
            image_size=cfg.image_size,
        )
    raise ValueError(f"Unknown vision tower: {vision_tower_name} "
                     "(mlcd/hf:/open_clip/imagebind are roadmap items)")
