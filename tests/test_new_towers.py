"""OpenCLIP and ImageBind tower tests.

OpenCLIP (open_clip_encoder.py) is CLIP-architecture under different key
names: the converter is validated by packing an HF CLIPVisionModel's weights
into open_clip naming and asserting the resulting pytree matches
clip.convert_hf of the original (forward parity then follows from
test_clip_parity).

ImageBind (imagebind.py:1-73): wrapper contract is ONE L2-normalized 1024-d
token per image/audio clip; the Conv3d->Conv2d temporal fold is checked
against torch.nn.functional.conv3d on 2x-repeated frames.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.models import clip as clip_mod
from memory_augmented_vlm_tpu.models import imagebind as ib
from memory_augmented_vlm_tpu.models import open_clip as oc


def _tiny_clip_cfg():
    return clip_mod.CLIPVisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14, hidden_act="gelu")


def test_open_clip_converter_matches_hf_clip():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    torch.manual_seed(0)
    cfg = _tiny_clip_cfg()
    hf = CLIPVisionModel(HFCfg(
        hidden_size=24, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14)).float()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    # repack into open_clip `visual.*` naming
    oc_sd = {
        "visual.class_embedding": sd["vision_model.embeddings.class_embedding"],
        "visual.conv1.weight": sd["vision_model.embeddings.patch_embedding.weight"],
        "visual.positional_embedding": sd["vision_model.embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": sd["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd["vision_model.pre_layrnorm.bias"],
    }
    for i in range(3):
        hp = f"vision_model.encoder.layers.{i}."
        op = f"visual.transformer.resblocks.{i}."
        oc_sd[op + "ln_1.weight"] = sd[hp + "layer_norm1.weight"]
        oc_sd[op + "ln_1.bias"] = sd[hp + "layer_norm1.bias"]
        oc_sd[op + "ln_2.weight"] = sd[hp + "layer_norm2.weight"]
        oc_sd[op + "ln_2.bias"] = sd[hp + "layer_norm2.bias"]
        oc_sd[op + "attn.in_proj_weight"] = np.concatenate(
            [sd[hp + f"self_attn.{n}.weight"] for n in ("q_proj", "k_proj", "v_proj")])
        oc_sd[op + "attn.in_proj_bias"] = np.concatenate(
            [sd[hp + f"self_attn.{n}.bias"] for n in ("q_proj", "k_proj", "v_proj")])
        oc_sd[op + "attn.out_proj.weight"] = sd[hp + "self_attn.out_proj.weight"]
        oc_sd[op + "attn.out_proj.bias"] = sd[hp + "self_attn.out_proj.bias"]
        oc_sd[op + "mlp.c_fc.weight"] = sd[hp + "mlp.fc1.weight"]
        oc_sd[op + "mlp.c_fc.bias"] = sd[hp + "mlp.fc1.bias"]
        oc_sd[op + "mlp.c_proj.weight"] = sd[hp + "mlp.fc2.weight"]
        oc_sd[op + "mlp.c_proj.bias"] = sd[hp + "mlp.fc2.bias"]

    got = oc.convert_open_clip(oc_sd, cfg)
    want = clip_mod.convert_hf(sd, cfg)
    flat_g, tree_g = jax.tree.flatten(got)
    flat_w, tree_w = jax.tree.flatten(want)
    assert tree_g == tree_w
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_allclose(g, w, rtol=0, atol=0)


def test_open_clip_geometry_table():
    cfg = oc.config_for("open_clip_hub:ViT-H-14-378-quickgelu")
    assert cfg.hidden_size == 1280  # the reference's HIDDEN_SIZE_DICT entry
    assert cfg.image_size == 378 and cfg.patch_size == 14
    assert cfg.hidden_act == "quick_gelu"
    with pytest.raises(ValueError):
        oc.config_for("open_clip_hub:ViT-Unknown")


@pytest.fixture(scope="module")
def ib_cfg():
    return ib.ImageBindConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        image_size=28, patch_size=14,
        audio_hidden_size=8, audio_num_layers=1, audio_num_heads=2,
        audio_mel_bins=36, audio_target_len=26, audio_kernel=16,
        audio_stride=10, embed_dim=12)


def test_imagebind_vision_contract(ib_cfg):
    params = ib.init_params(ib_cfg, jax.random.key(0))
    px = jnp.asarray(np.random.default_rng(0).standard_normal((3, 28, 28, 3)),
                     jnp.float32)
    out = ib.forward(params, ib_cfg, px)
    assert out.shape == (3, 1, 12)  # (B, 1, embed_dim) — imagebind.py:50-57
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5)


def test_imagebind_audio_contract(ib_cfg):
    params = ib.init_params(ib_cfg, jax.random.key(1))
    rows, cols = ib_cfg.audio_patches
    assert (rows, cols) == (3, 2)
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((2, 36, 26, 1)),
                      jnp.float32)
    out = ib.forward_audio(params, ib_cfg, mel)
    assert out.shape == (2, 1, 12)
    # audio postprocessing scales the normalized embedding by 20.0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 20.0, rtol=1e-4)


def test_imagebind_conv3d_fold(ib_cfg):
    """Folding the 2-frame Conv3d stem to Conv2d (kernel summed over T) is
    exact for repeated frames."""
    torch.manual_seed(0)
    w3d = torch.randn(16, 3, 2, 14, 14)
    x = torch.randn(2, 3, 28, 28)
    x_rep = x.unsqueeze(2).repeat(1, 1, 2, 1, 1)  # PadIm2Video repeat 2
    ref = torch.nn.functional.conv3d(x_rep, w3d, stride=(2, 14, 14))
    ref = ref.squeeze(2).flatten(2).transpose(1, 2)  # (B, P, C)

    sd = {"modality_preprocessors.vision.rgbt_stem.proj.1.weight": w3d.numpy()}
    k2d = sd["modality_preprocessors.vision.rgbt_stem.proj.1.weight"].sum(axis=2)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(k2d.transpose(2, 3, 1, 0)),
        window_strides=(14, 14), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(2, -1, 16)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_imagebind_converter_roundtrip(ib_cfg):
    """Synthetic imagebind-style state dict -> pytree -> forward runs and
    matches the tree structure init_params builds."""
    torch.manual_seed(0)
    h, ah, e = ib_cfg.hidden_size, ib_cfg.audio_hidden_size, ib_cfg.embed_dim
    side = ib_cfg.num_patches_per_side
    rows, cols = ib_cfg.audio_patches

    sd = {
        "modality_preprocessors.vision.cls_token": torch.randn(1, 1, h),
        "modality_preprocessors.vision.pos_embedding_helper.pos_embed":
            torch.randn(1, side * side + 1, h),
        "modality_preprocessors.vision.rgbt_stem.proj.1.weight":
            torch.randn(h, 3, 2, 14, 14),
        "modality_heads.vision.0.weight": torch.ones(h),
        "modality_heads.vision.0.bias": torch.zeros(h),
        "modality_heads.vision.2.weight": torch.randn(e, h),
        "modality_preprocessors.audio.cls_token": torch.randn(1, 1, ah),
        "modality_preprocessors.audio.pos_embedding_helper.pos_embed":
            torch.randn(1, rows * cols + 1, ah),
        "modality_preprocessors.audio.rgbt_stem.proj.weight":
            torch.randn(ah, 1, 16, 16),
        "modality_preprocessors.audio.rgbt_stem.norm_layer.weight": torch.ones(ah),
        "modality_preprocessors.audio.rgbt_stem.norm_layer.bias": torch.zeros(ah),
        "modality_heads.audio.0.weight": torch.ones(ah),
        "modality_heads.audio.0.bias": torch.zeros(ah),
        "modality_heads.audio.2.weight": torch.randn(e, ah),
    }

    def trunk(prefix, layers, hh):
        sd[prefix + "pre_transformer_layer.0.weight"] = torch.ones(hh)
        sd[prefix + "pre_transformer_layer.0.bias"] = torch.zeros(hh)
        for i in range(layers):
            sd[prefix + f"blocks.{i}.norm_1.weight"] = torch.ones(hh)
            sd[prefix + f"blocks.{i}.norm_1.bias"] = torch.zeros(hh)
            sd[prefix + f"blocks.{i}.norm_2.weight"] = torch.ones(hh)
            sd[prefix + f"blocks.{i}.norm_2.bias"] = torch.zeros(hh)
            sd[prefix + f"blocks.{i}.attn.in_proj_weight"] = torch.randn(3 * hh, hh) * 0.02
            sd[prefix + f"blocks.{i}.attn.in_proj_bias"] = torch.zeros(3 * hh)
            sd[prefix + f"blocks.{i}.attn.out_proj.weight"] = torch.randn(hh, hh) * 0.02
            sd[prefix + f"blocks.{i}.attn.out_proj.bias"] = torch.zeros(hh)
            sd[prefix + f"blocks.{i}.mlp.fc1.weight"] = torch.randn(4 * hh, hh) * 0.02
            sd[prefix + f"blocks.{i}.mlp.fc1.bias"] = torch.zeros(4 * hh)
            sd[prefix + f"blocks.{i}.mlp.fc2.weight"] = torch.randn(hh, 4 * hh) * 0.02
            sd[prefix + f"blocks.{i}.mlp.fc2.bias"] = torch.zeros(hh)

    trunk("modality_trunks.vision.", ib_cfg.num_hidden_layers, h)
    trunk("modality_trunks.audio.", ib_cfg.audio_num_layers, ah)

    params = jax.tree.map(jnp.asarray,
                          ib.convert_imagebind({k: v.numpy() for k, v in sd.items()},
                                               ib_cfg))
    ref_tree = jax.tree.structure(ib.init_params(ib_cfg, jax.random.key(0)))
    assert jax.tree.structure(params) == ref_tree

    px = jnp.asarray(np.random.default_rng(2).standard_normal((1, 28, 28, 3)),
                     jnp.float32)
    out = ib.forward(params, ib_cfg, px)
    assert out.shape == (1, 1, 12)
    mel = jnp.asarray(np.random.default_rng(3).standard_normal((1, 36, 26, 1)),
                      jnp.float32)
    out_a = ib.forward_audio(params, ib_cfg, mel)
    assert out_a.shape == (1, 1, 12)
