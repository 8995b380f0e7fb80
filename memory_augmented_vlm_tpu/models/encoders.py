"""Vision tower registry — `build_vision_tower` selection rules
(reference: llava/model/multimodal_encoder/builder.py:13-41):

  "siglip" in name                  -> SigLIP tower (ACTIVE,
                                       google/siglip-so400m-patch14-384)
  "mlcd-vit-bigG-patch14"           -> MLCD RoPE-2D ViT
  "hf:" prefix                      -> generic HF vision (hf_vision.py:1-111)
                                       — dispatched by architecture onto the
                                       native towers below
  "open_clip_hub:" prefix           -> OpenCLIP (open_clip_encoder.py:1-163)
                                       — CLIP-architecture ViTs via the
                                       open_clip naming converter
  "imagebind_huge"                  -> ImageBind (imagebind.py:1-73)
  path exists / openai / laion      -> CLIP (or CLIP-S2 when s2=True)
  "eva" in name                     -> EVA-CLIP ViT (eva_clip.py) — the
                                       reference ships the tree but comments
                                       the dispatch out (builder.py:36-39)

Each tower is a `VisionTower` record carrying the forward fn plus init /
HF-import callables, so the VLM spine (models/vlm.py `encode_frames`,
`init_params`) and the loader (eval/builder.py) route every family through
one interface.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple


from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import clip as clip_mod
from memory_augmented_vlm_tpu.models import siglip as siglip_mod


class VisionTower(NamedTuple):
    family: str
    config: Any
    forward: Callable            # (params, pixels) -> (B, N, hidden)
    hidden_size: int
    num_patches_per_side: int
    image_size: int
    init_params: Callable        # (key, dtype) -> params
    convert_hf: Callable         # (state_dict) -> params


def build_vision_tower(vision_tower_name: str, *, s2: bool = False,
                       vision_config: Any = None,
                       int8: bool = False) -> VisionTower:
    name = vision_tower_name.lower()
    if name.startswith("hf:"):
        return _hf_generic_tower(vision_tower_name[3:], vision_config, int8=int8)
    if "siglip" in name:
        cfg = vision_config or VisionConfig()
        return VisionTower(
            family="siglip",
            config=cfg,
            forward=lambda params, pixels: siglip_mod.forward(
                params, cfg, pixels, int8=int8),
            hidden_size=cfg.hidden_size,
            num_patches_per_side=cfg.num_patches_per_side,
            image_size=cfg.image_size,
            init_params=lambda key, dtype: siglip_mod.init_params(cfg, key, dtype),
            convert_hf=lambda sd: _import_siglip(sd, cfg),
        )
    if "mlcd" in name:
        from memory_augmented_vlm_tpu.models import mlcd as mlcd_mod

        # foreign-family configs (e.g. the default SigLIP-shaped
        # VisionConfig) fall back to the family default
        cfg = (vision_config
               if isinstance(vision_config, mlcd_mod.MLCDVisionConfig)
               else mlcd_mod.MLCDVisionConfig())
        return VisionTower(
            family="mlcd",
            config=cfg,
            forward=lambda params, pixels: mlcd_mod.forward(params, cfg, pixels),
            hidden_size=cfg.hidden_size,
            num_patches_per_side=cfg.num_patches_per_side,
            image_size=cfg.image_size,
            init_params=lambda key, dtype: mlcd_mod.init_params(cfg, key, dtype),
            convert_hf=lambda sd: mlcd_mod.convert_hf(sd, cfg),
        )
    if "eva" in name:
        # reference builder.py:36-39 ("internal-eva"/"eva02" ->
        # EvaClipVisionTower, "EVA-CLIP-8B[-plus]" -> EvaViTWrapper) — the
        # branches are commented out there but the tree ships in full
        from memory_augmented_vlm_tpu.models import eva_clip as eva_mod

        if isinstance(vision_config, eva_mod.EvaVisionConfig):
            cfg = vision_config
        else:
            key = next((k for k in eva_mod.MODEL_CONFIGS
                        if k.lower() in name), "EVA02-CLIP-L-14-336")
            cfg = eva_mod.EvaVisionConfig.from_vision_cfg(
                eva_mod.MODEL_CONFIGS[key])
        return VisionTower(
            family="eva_clip",
            config=cfg,
            forward=lambda params, pixels: eva_mod.forward(params, cfg, pixels),
            hidden_size=cfg.width,
            num_patches_per_side=cfg.hw,
            image_size=cfg.image_size,
            init_params=lambda key, dtype: eva_mod.init_params(cfg, key, dtype),
            convert_hf=lambda sd: eva_mod.convert_eva_state_dict(sd, cfg),
        )
    if "open_clip" in name:
        from memory_augmented_vlm_tpu.models import open_clip as oc_mod

        return oc_mod.build_tower(vision_tower_name, vision_config)
    if "imagebind" in name:
        from memory_augmented_vlm_tpu.models import imagebind as ib_mod

        return ib_mod.build_tower(vision_config)
    if "clip" in name or "openai" in name or "laion" in name or name.startswith("/"):
        cfg = (vision_config
               if isinstance(vision_config, clip_mod.CLIPVisionConfig)
               else clip_mod.CLIPVisionConfig())
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
            init_params=lambda key, dtype: clip_mod.init_params(cfg, key, dtype),
            convert_hf=lambda sd: clip_mod.convert_hf(sd, cfg),
        )
    raise ValueError(f"Unknown vision tower: {vision_tower_name}")


def _import_siglip(sd, cfg):
    from memory_augmented_vlm_tpu.checkpoint.hf_import import convert_siglip

    return convert_siglip(sd, cfg)


# Architectures the `hf:` generic path (hf_vision.py) can serve with a
# native TPU implementation. Anything else falls back to the host torch
# bridge (models/hf_bridge.py) — any-architecture compatibility, slow path.
_HF_ARCH_DISPATCH = {
    "SiglipVisionModel": "siglip",
    "SiglipModel": "siglip",
    "CLIPVisionModel": "clip",
    "CLIPModel": "clip",
    "MLCDVisionModel": "mlcd",
}


def _hf_generic_tower(hub_name: str, vision_config: Any, *,
                      int8: bool = False) -> VisionTower:
    """`hf:` prefix (hf_vision.py:1-111): resolve the checkpoint's vision
    architecture and dispatch onto the matching native tower; architectures
    with no native tower load through the host torch bridge
    (models/hf_bridge.py), mirroring the reference's wrap-anything
    AutoModel semantics.

    Resolution order: the checkpoint's own config.json `architectures`
    (ground truth when the path is local — the spine always passes the
    generic VisionConfig, which must not force SigLIP over what the
    checkpoint says), then the explicit `vision_config` type, else the
    name heuristics.
    """
    from memory_augmented_vlm_tpu.models import mlcd as mlcd_mod

    arch = None
    import json
    import os

    cfg_path = os.path.join(hub_name, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        archs = raw.get("architectures") or []
        for a in archs:
            if a in _HF_ARCH_DISPATCH:
                arch = _HF_ARCH_DISPATCH[a]
                break
        if arch is None and archs:
            # no native tower for this architecture: host torch bridge
            from memory_augmented_vlm_tpu.models import hf_bridge

            return hf_bridge.build_tower(hub_name)
    if arch is None and vision_config is not None:
        arch = {
            VisionConfig: "siglip",
            clip_mod.CLIPVisionConfig: "clip",
            mlcd_mod.MLCDVisionConfig: "mlcd",
        }.get(type(vision_config))
    if arch is None:
        lname = hub_name.lower()
        if "siglip" in lname:
            arch = "siglip"
        elif "mlcd" in lname:
            arch = "mlcd"
        elif "clip" in lname:
            arch = "clip"
        else:
            from memory_augmented_vlm_tpu.models import hf_bridge

            try:
                return hf_bridge.build_tower(hub_name)
            except Exception as e:
                raise ValueError(
                    f"hf:{hub_name}: no native TPU tower matches the name "
                    f"(native: {sorted(set(_HF_ARCH_DISPATCH))}) and the "
                    f"torch bridge could not load it: {e}") from e
    return build_vision_tower(arch, vision_config=vision_config, int8=int8)


def tower_for(cfg) -> VisionTower:
    """Resolve the tower for a VLMConfig (the spine's single entry point)."""
    return build_vision_tower(
        cfg.pipeline.mm_vision_tower,
        s2=cfg.pipeline.s2,
        vision_config=cfg.vision,
        int8=cfg.pipeline.tower_int8,
    )
