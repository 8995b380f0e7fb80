"""CLIP tower parity vs HF transformers + registry selection rules."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from memory_augmented_vlm_tpu.checkpoint.hf_import import torch_state_dict_to_numpy
from memory_augmented_vlm_tpu.models import clip as clip_mod
from memory_augmented_vlm_tpu.models.encoders import build_vision_tower


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, image_size=56, patch_size=14,
        attn_implementation="eager",
    )
    hf = CLIPVisionModel(hf_cfg).eval().float()
    cfg = clip_mod.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    params = jax.tree.map(
        jnp.asarray,
        clip_mod.convert_hf(torch_state_dict_to_numpy(hf.state_dict()), cfg))
    return hf, cfg, params


def test_clip_matches_hf_select_layer_minus2_patch(tiny_clip):
    hf, cfg, params = tiny_clip
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(px).permute(0, 3, 1, 2), output_hidden_states=True)
    ref = out.hidden_states[-2][:, 1:].numpy()  # select layer -2, drop CLS
    got = np.asarray(clip_mod.forward(params, cfg, jnp.asarray(px)))
    assert got.shape == (2, 16, 32)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_clip_s2_shapes(tiny_clip):
    _, cfg, params = tiny_clip
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    out = clip_mod.s2_forward(params, cfg, px, scales=(56, 112))
    assert out.shape == (1, 16, 64)  # channels concat over 2 scales


def test_registry_selection():
    t = build_vision_tower("google/siglip-so400m-patch14-384")
    assert t.family == "siglip" and t.num_patches_per_side == 27
    t2 = build_vision_tower("openai/clip-vit-large-patch14-336")
    assert t2.family == "clip" and t2.hidden_size == 1024
    t3 = build_vision_tower("openai/clip-vit-large-patch14-336", s2=True)
    assert t3.family == "clip_s2" and t3.hidden_size == 3072
    t4 = build_vision_tower("mlcd-vit-bigG-patch14")
    assert t4.family == "mlcd" and t4.hidden_size == 1664
    t5 = build_vision_tower("imagebind_huge")
    assert t5.family == "imagebind" and t5.hidden_size == 1024
    assert t5.num_patches_per_side == 1  # one global token per image
    t6 = build_vision_tower("open_clip_hub:ViT-H-14-378-quickgelu")
    assert t6.family == "open_clip" and t6.hidden_size == 1280
    assert t6.config.hidden_act == "quick_gelu"
    t7 = build_vision_tower("hf:google/siglip-base-patch16-224")
    assert t7.family == "siglip"
    # unknown geometries / non-CLIP-family architectures still refuse
    for name in ("open_clip_hub:ViT-Unknown", "hf:facebook/dinov2"):
        with pytest.raises(ValueError):
            build_vision_tower(name)
