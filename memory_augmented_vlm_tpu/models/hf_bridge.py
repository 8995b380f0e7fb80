"""Host-side torch bridge for arbitrary `hf:` vision architectures.

The reference's generic tower (llava/model/multimodal_encoder/
hf_vision.py:1-111) wraps ANY HF vision model: `AutoModel.from_pretrained`,
`hidden_states[select_layer]`, drop the CLS row for "patch" feature select.
The native towers in this repo cover the families the reference actually
ships configs for (SigLIP/CLIP/MLCD/OpenCLIP/EVA/ImageBind); this module
closes the remaining surface: an architecture with no native TPU tower runs
as a HOST-side torch encoder behind `jax.pure_callback`, the same way other
host-side dependencies (video decode, audio fbank) feed the device.

Positioning: this is a compatibility slow path, not a serving path — each
forward round-trips frames to the host and runs torch-CPU. It exists so a
reference user's `hf:<any-arch>` checkpoint works day one; performance
work means adding a native tower (models/siglip.py is the template) and a
row in `encoders._HF_ARCH_DISPATCH`.

Contract notes (mirroring hf_vision.py):
  - `vision_model` submodule unwrapped when present (:40-41);
  - feature select "patch" drops row 0 (CLS), "cls_patch" keeps all (:47-60)
    — like the reference, "patch" assumes the architecture emits a CLS row;
  - frozen (`requires_grad_(False)`, :42) — matches `encode_images`'s
    detach semantics;
  - the tower exposes no JAX params (empty pytree): weights live in the
    cached torch module keyed by checkpoint path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=4)
def _load(hub_name: str):
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(hub_name)
    if hasattr(model, "vision_model"):
        model = model.vision_model
    model = model.float().eval()
    model.requires_grad_(False)
    return model


def build_tower(hub_name: str, *, select_layer: int = -2,
                select_feature: str = "patch"):
    from memory_augmented_vlm_tpu.models.encoders import VisionTower

    model = _load(hub_name)
    hcfg = model.config
    image_size = hcfg.image_size
    nps = image_size // hcfg.patch_size
    hidden = hcfg.hidden_size
    if select_feature not in ("patch", "cls_patch"):
        raise ValueError(f"Unexpected select feature: {select_feature}")
    n_tokens = nps * nps + (1 if select_feature == "cls_patch" else 0)

    def _host_encode(pixels_np: np.ndarray) -> np.ndarray:
        import torch

        # copy: pure_callback hands a read-only buffer torch can't wrap
        x = torch.asarray(np.array(pixels_np, np.float32, copy=True))
        with torch.no_grad():
            out = model(x.permute(0, 3, 1, 2), output_hidden_states=True)
        feats = out.hidden_states[select_layer]
        if select_feature == "patch":
            feats = feats[:, 1:]
        return np.asarray(feats.float().numpy(), np.float32)

    def forward(params, pixels):
        del params  # weights live host-side in the torch module
        out_shape = jax.ShapeDtypeStruct(
            (pixels.shape[0], n_tokens, hidden), jnp.float32)
        feats = jax.pure_callback(_host_encode, out_shape,
                                  pixels.astype(jnp.float32))
        return feats.astype(pixels.dtype)

    return VisionTower(
        family="hf_bridge",
        config=hcfg,
        forward=forward,
        hidden_size=hidden,
        num_patches_per_side=nps,
        image_size=image_size,
        init_params=lambda key, dtype: {},
        convert_hf=lambda sd: {},
    )
