"""OpenCLIP vision tower (reference
llava/model/multimodal_encoder/open_clip_encoder.py:1-163).

OpenCLIP ViTs are CLIP-architecture: class token + learned positional
embedding + ln_pre, pre-LN residual blocks (packed qkv `in_proj`, mlp
c_fc/act/c_proj). The reference taps `features[select_layer]` — the output
of resblock `L + select_layer` — and drops the CLS token, which is exactly
`clip.forward` with `used = L + select_layer + 1` layers. So this module is
a name-keyed config table plus an open_clip->clip weight converter; the
compute path is models/clip.py.

Model names ending in `-quickgelu` use the quick-gelu MLP (the reference's
HIDDEN_SIZE_DICT entry ViT-H-14-378-quickgelu); others use exact gelu.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from memory_augmented_vlm_tpu.models import clip as clip_mod

# (width, layers, heads, image, patch) per open_clip model name — the
# reference resolves these from the open_clip package; offline we pin the
# geometries for the families the reference names (HIDDEN_SIZE_DICT plus the
# common laion hub models).
_GEOMETRY = {
    "ViT-H-14-378-quickgelu": (1280, 32, 16, 378, 14),
    "ViT-H-14": (1280, 32, 16, 224, 14),
    "ViT-bigG-14": (1664, 48, 16, 224, 14),
    "ViT-L-14": (1024, 24, 16, 224, 14),
    "ViT-B-16": (768, 12, 12, 224, 16),
}


def config_for(model_name: str) -> clip_mod.CLIPVisionConfig:
    name = model_name.replace("open_clip_hub:", "")
    if name not in _GEOMETRY:
        raise ValueError(
            f"unknown open_clip model {name!r}; known: {sorted(_GEOMETRY)}")
    width, layers, heads, image, patch = _GEOMETRY[name]
    return clip_mod.CLIPVisionConfig(
        hidden_size=width,
        intermediate_size=width * 4,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        image_size=image,
        patch_size=patch,
        hidden_act="quick_gelu" if name.endswith("quickgelu") else "gelu",
    )


def convert_open_clip(sd, cfg: clip_mod.CLIPVisionConfig):
    """open_clip `visual.*` state dict -> models/clip.py pytree.

    Packed `attn.in_proj_{weight,bias}` split into q/k/v; `c_fc`/`c_proj`
    map to fc1/fc2; `ln_pre` is CLIP's pre_layrnorm.
    """
    sd = {k[len("visual."):] if k.startswith("visual.") else k: np.asarray(v)
          for k, v in sd.items()}
    used = cfg.num_hidden_layers + cfg.select_layer + 1
    h = cfg.hidden_size

    def stack(fmt, transpose=False):
        arrs = [sd[fmt.format(i)] for i in range(used)]
        out = np.stack(arrs).astype(np.float32)
        return out.transpose(0, 2, 1) if transpose else out

    p = "transformer.resblocks.{}."
    in_w = np.stack([sd[(p + "attn.in_proj_weight").format(i)]
                     for i in range(used)]).astype(np.float32)  # (L, 3h, h)
    in_b = np.stack([sd[(p + "attn.in_proj_bias").format(i)]
                     for i in range(used)]).astype(np.float32)  # (L, 3h)
    layers = {
        "layer_norm1": {"weight": stack(p + "ln_1.weight"),
                        "bias": stack(p + "ln_1.bias")},
        "layer_norm2": {"weight": stack(p + "ln_2.weight"),
                        "bias": stack(p + "ln_2.bias")},
        "q_proj": {"kernel": in_w[:, :h].transpose(0, 2, 1), "bias": in_b[:, :h]},
        "k_proj": {"kernel": in_w[:, h:2 * h].transpose(0, 2, 1),
                   "bias": in_b[:, h:2 * h]},
        "v_proj": {"kernel": in_w[:, 2 * h:].transpose(0, 2, 1),
                   "bias": in_b[:, 2 * h:]},
        "out_proj": {"kernel": stack(p + "attn.out_proj.weight", transpose=True),
                     "bias": stack(p + "attn.out_proj.bias")},
        "fc1": {"kernel": stack(p + "mlp.c_fc.weight", transpose=True),
                "bias": stack(p + "mlp.c_fc.bias")},
        "fc2": {"kernel": stack(p + "mlp.c_proj.weight", transpose=True),
                "bias": stack(p + "mlp.c_proj.bias")},
    }
    return {
        "class_embedding": sd["class_embedding"].astype(np.float32),
        "patch_embedding": {
            "kernel": sd["conv1.weight"].transpose(2, 3, 1, 0).astype(np.float32),
        },
        "position_embedding": sd["positional_embedding"].astype(np.float32),
        "pre_layrnorm": {"weight": sd["ln_pre.weight"].astype(np.float32),
                         "bias": sd["ln_pre.bias"].astype(np.float32)},
        "layers": layers,
    }


def build_tower(vision_tower_name: str, vision_config: Optional[Any] = None):
    from memory_augmented_vlm_tpu.models.encoders import VisionTower

    cfg = (vision_config if isinstance(vision_config, clip_mod.CLIPVisionConfig)
           else config_for(vision_tower_name))
    return VisionTower(
        family="open_clip",
        config=cfg,
        forward=lambda params, pixels: clip_mod.forward(params, cfg, pixels),
        hidden_size=cfg.hidden_size,
        num_patches_per_side=cfg.num_patches_per_side,
        image_size=cfg.image_size,
        init_params=lambda key, dtype: clip_mod.init_params(cfg, key, dtype),
        convert_hf=lambda sd: convert_open_clip(sd, cfg),
    )
