"""ImageBind-huge tower (reference
llava/model/multimodal_encoder/imagebind.py:1-73).

The reference wraps `imagebind_model.imagebind_huge` and uses two paths:
  - vision: images -> trunk -> head -> ONE L2-normalized 1024-d embedding
    per image, returned as (B, 1, 1024) (imagebind.py:50-57);
  - audio: mel clips -> audio trunk -> (B, 1, 1024) (imagebind.py:44-48;
    the host-side mel transform `load_and_transform_audio_data` is
    implemented in `data/audio.py` — clip sampling + Kaldi fbank +
    ImageBind normalization).

TPU-native rebuild: both trunks are pre-LN ViTs (packed-qkv attention, gelu
MLP) sharing one `_trunk_forward`; the vision Conv3d patch stem over
2x-repeated frames folds to a Conv2d whose kernel is the temporal sum, so
images stay (B, H, W, 3). Heads: LayerNorm -> CLS select -> Linear(->1024,
no bias) -> L2 normalize (audio additionally scales by 20.0, ImageBind's
fixed logit scaling).

Geometry is pinned for imagebind_huge: vision 1280x32 (heads 16, 224/14,
257 tokens), audio 768x12 (heads 12, mel 128x204 -> 12x19=228 patches + CLS).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.attention import mha_attention
from memory_augmented_vlm_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ImageBindConfig:
    # vision trunk
    hidden_size: int = 1280
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    # audio trunk
    audio_hidden_size: int = 768
    audio_num_layers: int = 12
    audio_num_heads: int = 12
    audio_mel_bins: int = 128
    audio_target_len: int = 204
    audio_kernel: int = 16
    audio_stride: int = 10
    # shared
    embed_dim: int = 1024
    layer_norm_eps: float = 1e-6
    num_channels: int = 3

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size  # 16

    @property
    def audio_patches(self) -> tuple:
        rows = (self.audio_mel_bins - self.audio_kernel) // self.audio_stride + 1
        cols = (self.audio_target_len - self.audio_kernel) // self.audio_stride + 1
        return rows, cols


def _linear(p, x):
    out = jnp.einsum("...i,io->...o", x, p["kernel"])
    if "bias" in p:
        out = out + p["bias"]
    return out


def _trunk_forward(trunk, tokens, *, heads: int, eps: float) -> jax.Array:
    """Shared pre-LN ViT trunk: (B, S, H) tokens -> (B, S, H)."""
    b, s, h = tokens.shape
    hd = h // heads
    hidden = layer_norm(tokens, trunk["pre_transformer_norm"]["weight"],
                        trunk["pre_transformer_norm"]["bias"], eps)

    def layer_body(hidden, lp):
        residual = hidden
        x = layer_norm(hidden, lp["norm_1"]["weight"], lp["norm_1"]["bias"], eps)
        q = _linear(lp["q_proj"], x).reshape(b, s, heads, hd)
        k = _linear(lp["k_proj"], x).reshape(b, s, heads, hd)
        v = _linear(lp["v_proj"], x).reshape(b, s, heads, hd)
        attn = mha_attention(q, k, v).reshape(b, s, h)
        hidden = residual + _linear(lp["out_proj"], attn)
        residual = hidden
        x = layer_norm(hidden, lp["norm_2"]["weight"], lp["norm_2"]["bias"], eps)
        hidden = residual + _linear(lp["fc2"], jax.nn.gelu(_linear(lp["fc1"], x),
                                                           approximate=False))
        return hidden, None

    hidden, _ = jax.lax.scan(layer_body, hidden, trunk["layers"])
    return hidden


def _head(params, hidden, *, eps: float, scale: float = 1.0) -> jax.Array:
    """LayerNorm -> CLS -> Linear(no bias) -> L2 normalize [-> scale]."""
    x = layer_norm(hidden, params["norm"]["weight"], params["norm"]["bias"], eps)
    cls = x[:, 0]
    emb = jnp.einsum("bi,io->bo", cls, params["proj"]["kernel"])
    emb = emb / jnp.linalg.norm(emb.astype(jnp.float32), axis=-1,
                                keepdims=True).astype(emb.dtype)
    return (emb * scale)[:, None, :]  # (B, 1, embed_dim)


def forward(params, cfg: ImageBindConfig, pixel_values: jax.Array) -> jax.Array:
    """(B, H, W, 3) images -> (B, 1, 1024) normalized vision embeddings."""
    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixel_values,
        params["vision"]["patch_embedding"]["kernel"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["vision"]["cls_token"][None, None, :],
                           (b, 1, cfg.hidden_size)).astype(patches.dtype)
    tokens = jnp.concatenate([cls, patches], axis=1)
    tokens = tokens + params["vision"]["pos_embed"].astype(tokens.dtype)
    hidden = _trunk_forward(params["vision"]["trunk"], tokens,
                            heads=cfg.num_attention_heads, eps=cfg.layer_norm_eps)
    return _head(params["vision"]["head"], hidden, eps=cfg.layer_norm_eps)


def forward_audio(params, cfg: ImageBindConfig, mel: jax.Array) -> jax.Array:
    """(B, mel_bins, T, 1) precomputed log-mel clips -> (B, 1, 1024).

    Includes ImageBind's fixed 20.0 audio logit scaling after L2 norm.
    """
    b = mel.shape[0]
    patches = jax.lax.conv_general_dilated(
        mel,
        params["audio"]["patch_embedding"]["kernel"].astype(mel.dtype),
        window_strides=(cfg.audio_stride, cfg.audio_stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, -1, cfg.audio_hidden_size)
    patches = layer_norm(patches, params["audio"]["stem_norm"]["weight"],
                         params["audio"]["stem_norm"]["bias"], cfg.layer_norm_eps)
    cls = jnp.broadcast_to(params["audio"]["cls_token"][None, None, :],
                           (b, 1, cfg.audio_hidden_size)).astype(patches.dtype)
    tokens = jnp.concatenate([cls, patches], axis=1)
    tokens = tokens + params["audio"]["pos_embed"].astype(tokens.dtype)
    hidden = _trunk_forward(params["audio"]["trunk"], tokens,
                            heads=cfg.audio_num_heads, eps=cfg.layer_norm_eps)
    return _head(params["audio"]["head"], hidden, eps=cfg.layer_norm_eps,
                 scale=20.0)


def _init_trunk(key, layers: int, h: int, dtype):
    ks = iter(jax.random.split(key, 8))

    def dense(kk, din, dout):
        return {"kernel": (jax.random.normal(kk, (layers, din, dout)) * 0.02).astype(dtype),
                "bias": jnp.zeros((layers, dout), dtype)}

    ln = lambda: {"weight": jnp.ones((layers, h), dtype),
                  "bias": jnp.zeros((layers, h), dtype)}
    return {
        "pre_transformer_norm": {"weight": jnp.ones((h,), dtype),
                                 "bias": jnp.zeros((h,), dtype)},
        "layers": {
            "norm_1": ln(), "norm_2": ln(),
            "q_proj": dense(next(ks), h, h), "k_proj": dense(next(ks), h, h),
            "v_proj": dense(next(ks), h, h), "out_proj": dense(next(ks), h, h),
            "fc1": dense(next(ks), h, 4 * h), "fc2": dense(next(ks), 4 * h, h),
        },
    }


def init_params(cfg: ImageBindConfig, key: jax.Array, dtype=jnp.float32):
    kv, ka, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 8)
    side = cfg.num_patches_per_side
    rows, cols = cfg.audio_patches
    h, ah, e = cfg.hidden_size, cfg.audio_hidden_size, cfg.embed_dim
    return {
        "vision": {
            "cls_token": (jax.random.normal(k1, (h,)) * 0.02).astype(dtype),
            "pos_embed": (jax.random.normal(k2, (side * side + 1, h)) * 0.02).astype(dtype),
            "patch_embedding": {
                "kernel": (jax.random.normal(
                    k3, (cfg.patch_size, cfg.patch_size, cfg.num_channels, h)
                ) * 0.02).astype(dtype)},
            "trunk": _init_trunk(kv, cfg.num_hidden_layers, h, dtype),
            "head": {"norm": {"weight": jnp.ones((h,), dtype),
                              "bias": jnp.zeros((h,), dtype)},
                     "proj": {"kernel": (jax.random.normal(k4, (h, e)) * 0.02).astype(dtype)}},
        },
        "audio": {
            "cls_token": (jax.random.normal(k5, (ah,)) * 0.02).astype(dtype),
            "pos_embed": (jax.random.normal(k6, (rows * cols + 1, ah)) * 0.02).astype(dtype),
            "patch_embedding": {
                "kernel": (jax.random.normal(
                    jax.random.fold_in(ka, 1), (cfg.audio_kernel, cfg.audio_kernel, 1, ah)
                ) * 0.02).astype(dtype)},
            "stem_norm": {"weight": jnp.ones((ah,), dtype),
                          "bias": jnp.zeros((ah,), dtype)},
            "trunk": _init_trunk(ka, cfg.audio_num_layers, ah, dtype),
            "head": {"norm": {"weight": jnp.ones((ah,), dtype),
                              "bias": jnp.zeros((ah,), dtype)},
                     "proj": {"kernel": (jax.random.normal(
                         jax.random.fold_in(ka, 2), (ah, e)) * 0.02).astype(dtype)}},
        },
    }


def _convert_trunk(sd, prefix: str, layers: int, h: int):
    def g(k):
        return np.asarray(sd[prefix + k]).astype(np.float32)

    in_w = np.stack([g(f"blocks.{i}.attn.in_proj_weight") for i in range(layers)])
    in_b = np.stack([g(f"blocks.{i}.attn.in_proj_bias") for i in range(layers)])

    def stack(fmt, transpose=False):
        out = np.stack([g(fmt.format(i)) for i in range(layers)])
        return out.transpose(0, 2, 1) if transpose else out

    return {
        "pre_transformer_norm": {"weight": g("pre_transformer_layer.0.weight"),
                                 "bias": g("pre_transformer_layer.0.bias")},
        "layers": {
            "norm_1": {"weight": stack("blocks.{}.norm_1.weight"),
                       "bias": stack("blocks.{}.norm_1.bias")},
            "norm_2": {"weight": stack("blocks.{}.norm_2.weight"),
                       "bias": stack("blocks.{}.norm_2.bias")},
            "q_proj": {"kernel": in_w[:, :h].transpose(0, 2, 1), "bias": in_b[:, :h]},
            "k_proj": {"kernel": in_w[:, h:2 * h].transpose(0, 2, 1),
                       "bias": in_b[:, h:2 * h]},
            "v_proj": {"kernel": in_w[:, 2 * h:].transpose(0, 2, 1),
                       "bias": in_b[:, 2 * h:]},
            "out_proj": {"kernel": stack("blocks.{}.attn.out_proj.weight", True),
                         "bias": stack("blocks.{}.attn.out_proj.bias")},
            "fc1": {"kernel": stack("blocks.{}.mlp.fc1.weight", True),
                    "bias": stack("blocks.{}.mlp.fc1.bias")},
            "fc2": {"kernel": stack("blocks.{}.mlp.fc2.weight", True),
                    "bias": stack("blocks.{}.mlp.fc2.bias")},
        },
    }


def convert_imagebind(sd, cfg: ImageBindConfig):
    """imagebind_huge state dict -> param pytree.

    The vision Conv3d stem `(out, in, 2, 14, 14)` over 2x-repeated frames is
    folded to Conv2d by summing the temporal kernel slices (the repeated
    frames are identical, so the sums commute).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    conv3d = sd["modality_preprocessors.vision.rgbt_stem.proj.1.weight"]
    conv2d = conv3d.sum(axis=2)  # (out, in, kh, kw)
    vision = {
        "cls_token": sd["modality_preprocessors.vision.cls_token"].reshape(-1).astype(np.float32),
        "pos_embed": sd["modality_preprocessors.vision.pos_embedding_helper.pos_embed"][0].astype(np.float32),
        "patch_embedding": {"kernel": conv2d.transpose(2, 3, 1, 0).astype(np.float32)},
        "trunk": _convert_trunk(sd, "modality_trunks.vision.",
                                cfg.num_hidden_layers, cfg.hidden_size),
        "head": {
            "norm": {"weight": sd["modality_heads.vision.0.weight"].astype(np.float32),
                     "bias": sd["modality_heads.vision.0.bias"].astype(np.float32)},
            "proj": {"kernel": sd["modality_heads.vision.2.weight"].T.astype(np.float32)},
        },
    }
    out = {"vision": vision}
    if "modality_trunks.audio.pre_transformer_layer.0.weight" in sd:
        aconv = sd["modality_preprocessors.audio.rgbt_stem.proj.weight"]
        out["audio"] = {
            "cls_token": sd["modality_preprocessors.audio.cls_token"].reshape(-1).astype(np.float32),
            "pos_embed": sd["modality_preprocessors.audio.pos_embedding_helper.pos_embed"][0].astype(np.float32),
            "patch_embedding": {"kernel": aconv.transpose(2, 3, 1, 0).astype(np.float32)},
            "stem_norm": {
                "weight": sd["modality_preprocessors.audio.rgbt_stem.norm_layer.weight"].astype(np.float32),
                "bias": sd["modality_preprocessors.audio.rgbt_stem.norm_layer.bias"].astype(np.float32)},
            "trunk": _convert_trunk(sd, "modality_trunks.audio.",
                                    cfg.audio_num_layers, cfg.audio_hidden_size),
            "head": {
                "norm": {"weight": sd["modality_heads.audio.0.weight"].astype(np.float32),
                         "bias": sd["modality_heads.audio.0.bias"].astype(np.float32)},
                "proj": {"kernel": sd["modality_heads.audio.2.weight"].T.astype(np.float32)},
            },
        }
    return out


def build_tower(vision_config: Optional[Any] = None):
    from memory_augmented_vlm_tpu.models.encoders import VisionTower

    # callers may hand the generic VisionConfig (VLMConfig's default field);
    # imagebind needs its own geometry, so fall back to the family default
    cfg = (vision_config if isinstance(vision_config, ImageBindConfig)
           else ImageBindConfig())
    return VisionTower(
        family="imagebind",
        config=cfg,
        forward=lambda params, pixels: forward(params, cfg, pixels),
        hidden_size=cfg.embed_dim,
        num_patches_per_side=1,  # ONE global token per image (imagebind.py:50-57)
        image_size=cfg.image_size,
        init_params=lambda key, dtype: init_params(cfg, key, dtype),
        convert_hf=lambda sd: convert_imagebind(sd, cfg),
    )
