"""EVA-CLIP tower parity vs the reference's vendored eva_vit
(llava/model/multimodal_encoder/eva_clip/eva_vit.py), imported directly from
the reference tree with its timm dependency stubbed. Covers the EVA02 family
(subln + naiveswiglu + 2D rope) and the EVA01/8B family (packed qkv, plain
gelu MLP, optional postnorm)."""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.models import eva_clip


@pytest.fixture(scope="module")
def ref_eva():
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        layers = types.ModuleType("timm.models.layers")

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def drop_path(x, drop_prob=0.0, training=False):
            return x

        def trunc_normal_(tensor, std=1.0, **kw):
            with torch.no_grad():
                tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
            return tensor

        layers.to_2tuple = to_2tuple
        layers.drop_path = drop_path
        layers.trunc_normal_ = trunc_normal_
        models = types.ModuleType("timm.models")
        models.layers = layers
        timm.models = models
        import importlib.machinery

        for name, mod in (("timm", timm), ("timm.models", models),
                          ("timm.models.layers", layers)):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    # import eva_vit by file path to avoid the llava package __init__
    # (which pulls the full torch model zoo)
    import importlib.util

    if "llava.utils" not in sys.modules:
        # eva_vit imports rank0_print from llava.utils; provide a light stub
        lu = types.ModuleType("llava.utils")
        lu.rank0_print = print
        llava_pkg = types.ModuleType("llava")
        llava_pkg.utils = lu
        sys.modules.setdefault("llava", llava_pkg)
        sys.modules["llava.utils"] = lu
    path = ("/root/reference/llava/model/multimodal_encoder/eva_clip/"
            "eva_vit.py")
    spec = importlib.util.spec_from_file_location("ref_eva_vit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_pair(ref_eva, *, rope, subln, naiveswiglu, postnorm=False,
                ls_init_value=None, seed=0):
    cfg = eva_clip.EvaVisionConfig(
        width=64, layers=3, head_width=16, mlp_ratio=2.0, patch_size=8,
        image_size=32, rope=rope, pt_hw_seq_len=4, intp_freq=rope,
        naiveswiglu=naiveswiglu, subln=subln, postnorm=postnorm,
        ls_init_value=ls_init_value)
    torch.manual_seed(seed)
    rope_mod = None
    if rope:
        rope_mod = True
    model = ref_eva.EVAVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=3, num_heads=4,
        mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.0,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        init_values=ls_init_value, rope=bool(rope_mod), use_mean_pooling=False,
        xattn=False, postnorm=postnorm, pt_hw_seq_len=4, intp_freq=rope,
        naiveswiglu=naiveswiglu, subln=subln, num_classes=0,
    ).float().eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = eva_clip.convert_eva_state_dict(sd, cfg)
    return model, cfg, params


@pytest.mark.parametrize("variant", ["eva02", "eva01", "postnorm_ls"])
def test_eva_tower_matches_reference(ref_eva, variant):
    kw = dict(
        eva02=dict(rope=True, subln=True, naiveswiglu=True),
        eva01=dict(rope=False, subln=False, naiveswiglu=False),
        postnorm_ls=dict(rope=False, subln=False, naiveswiglu=False,
                         postnorm=True, ls_init_value=0.1),
    )[variant]
    model, cfg, params = _build_pair(ref_eva, **kw)
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        # EVAEncoderWrapper.forward: return_all_features + strip cls
        ref = model(torch.from_numpy(pix), return_all_features=True).numpy()
    ref = ref[:, 1:]
    got = np.asarray(eva_clip.forward(
        params, cfg, jnp.asarray(pix.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4,
                               err_msg=f"variant={variant}")


def test_rope_tables_match_reference(ref_eva):
    rope = ref_eva.VisionRotaryEmbeddingFast(dim=8, pt_seq_len=4, ft_seq_len=6)
    cfg = eva_clip.EvaVisionConfig(width=64, head_width=16, patch_size=8,
                                   image_size=48, rope=True, pt_hw_seq_len=4,
                                   intp_freq=True)
    cos, sin = eva_clip.rope_2d_tables(cfg)
    np.testing.assert_allclose(np.asarray(cos), rope.freqs_cos.numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), rope.freqs_sin.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_model_config_registry():
    cfg = eva_clip.EvaVisionConfig.from_vision_cfg(
        eva_clip.MODEL_CONFIGS["EVA02-CLIP-L-14-336"])
    assert cfg.width == 1024 and cfg.num_heads == 16
    assert cfg.num_patches == 576 and cfg.mlp_hidden == 2730
    assert cfg.rope and cfg.subln and cfg.naiveswiglu
    cfg8b = eva_clip.EvaVisionConfig.from_vision_cfg(
        eva_clip.MODEL_CONFIGS["EVA-CLIP-8B"])
    assert cfg8b.postnorm and not cfg8b.rope


def test_eva_spine_reachable():
    """EVA routes through the shared tower registry and the VLM spine."""
    from memory_augmented_vlm_tpu.models.encoders import build_vision_tower

    cfg = eva_clip.EvaVisionConfig(width=64, layers=2, head_width=16,
                                   mlp_ratio=2.0, patch_size=8, image_size=32,
                                   rope=True, pt_hw_seq_len=4, intp_freq=True,
                                   naiveswiglu=True, subln=True)
    tower = build_vision_tower("internal-eva02-clip", vision_config=cfg)
    assert tower.family == "eva_clip" and tower.hidden_size == 64
    params = tower.init_params(jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(2)
    pix = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    feats = tower.forward(params, pix)
    assert feats.shape == (2, 16, 64)
    # name -> config registry pick
    t8b = build_vision_tower("EVA-CLIP-8B")
    assert t8b.config.postnorm
