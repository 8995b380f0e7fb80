"""CLIP vision tower (alternative encoder, reference
llava/model/multimodal_encoder/clip_encoder.py).

HF `CLIPVisionModel` semantics: class embedding + conv patch embed + learned
position embeddings, pre-LN transformer with quick_gelu MLPs, feature tap at
`mm_vision_select_layer` (-2 default: hidden_states[-2], i.e. the output of
the second-to-last layer, pre-final-norm), `mm_vision_select_feature="patch"`
drops the CLS token (clip_encoder.py feature_select).

S2 multi-scale wrapping (clip_encoder.py CLIPVisionTowerS2: run the tower at
{336, 672, 1008}, split large scales into tower-size crops, average-merge and
concat channel-wise) is provided by `s2_forward`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.attention import mha_attention
from memory_augmented_vlm_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    num_channels: int = 3
    select_layer: int = -2
    select_feature: str = "patch"
    hidden_act: str = "quick_gelu"    # OpenCLIP non-quickgelu models use gelu

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side**2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1  # CLS


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _linear(p, x):
    return jnp.einsum("...i,io->...o", x, p["kernel"]) + p["bias"]


def forward(params, cfg: CLIPVisionConfig, pixel_values: jax.Array) -> jax.Array:
    """(B, H, W, C) -> selected features.

    Runs layers 0..L+select_layer (inclusive) — hidden_states[-2] equals the
    output after num_hidden_layers + select_layer + 1 layers.
    """
    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixel_values,
        params["patch_embedding"]["kernel"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, cfg.num_patches, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (b, 1, cfg.hidden_size)
    ).astype(patches.dtype)
    hidden = jnp.concatenate([cls, patches], axis=1)
    hidden = hidden + params["position_embedding"].astype(hidden.dtype)
    hidden = layer_norm(hidden, params["pre_layrnorm"]["weight"],
                        params["pre_layrnorm"]["bias"], cfg.layer_norm_eps)

    s, h = hidden.shape[1], cfg.hidden_size
    nh = cfg.num_attention_heads
    hd = h // nh

    def layer_body(hidden, lp):
        residual = hidden
        x = layer_norm(hidden, lp["layer_norm1"]["weight"], lp["layer_norm1"]["bias"],
                       cfg.layer_norm_eps)
        q = _linear(lp["q_proj"], x).reshape(b, s, nh, hd)
        k = _linear(lp["k_proj"], x).reshape(b, s, nh, hd)
        v = _linear(lp["v_proj"], x).reshape(b, s, nh, hd)
        attn = mha_attention(q, k, v).reshape(b, s, h)
        hidden = residual + _linear(lp["out_proj"], attn)
        residual = hidden
        x = layer_norm(hidden, lp["layer_norm2"]["weight"], lp["layer_norm2"]["bias"],
                       cfg.layer_norm_eps)
        x = _linear(lp["fc1"], x)
        x = _quick_gelu(x) if cfg.hidden_act == "quick_gelu" else jax.nn.gelu(
            x, approximate=False)
        hidden = residual + _linear(lp["fc2"], x)
        return hidden, None

    hidden, _ = jax.lax.scan(layer_body, hidden, params["layers"])
    if cfg.select_feature == "patch":
        return hidden[:, 1:]
    if cfg.select_feature == "cls_patch":
        return hidden
    raise ValueError(f"Unexpected select feature: {cfg.select_feature}")


def s2_forward(params, cfg: CLIPVisionConfig, pixel_values: jax.Array,
               scales=(336, 672, 1008)) -> jax.Array:
    """S2 multi-scale (clip_encoder.py CLIPVisionTowerS2 / s2wrapper
    semantics): resize to each scale, tile into tower-size crops, run the
    tower, reassemble and pool back to the base grid, concat channels."""
    from memory_augmented_vlm_tpu.ops.pooling import bilinear_resize

    base = cfg.image_size
    side = cfg.num_patches_per_side
    outs = []
    for scale in scales:
        imgs = bilinear_resize(pixel_values, scale, scale)
        n = scale // base
        b = imgs.shape[0]
        # tile into n*n crops
        crops = imgs.reshape(b, n, base, n, base, cfg.num_channels)
        crops = crops.transpose(0, 1, 3, 2, 4, 5).reshape(b * n * n, base, base,
                                                          cfg.num_channels)
        feats = forward(params, cfg, crops)  # (b*n*n, side*side, H)
        fmap = feats.reshape(b, n, n, side, side, cfg.hidden_size)
        fmap = fmap.transpose(0, 1, 3, 2, 4, 5).reshape(b, n * side, n * side,
                                                        cfg.hidden_size)
        if n > 1:
            fmap = bilinear_resize(fmap, side, side)
        outs.append(fmap.reshape(b, side * side, cfg.hidden_size))
    return jnp.concatenate(outs, axis=-1)


def init_params(cfg: CLIPVisionConfig, key: jax.Array, dtype=jnp.float32):
    """Random params matching the `convert_hf` pytree (layers trimmed to the
    select tap, stacked on a leading layer axis for lax.scan)."""
    used = cfg.num_hidden_layers + cfg.select_layer + 1
    h, i = cfg.hidden_size, cfg.intermediate_size
    ks = iter(jax.random.split(key, 16))

    def dense(kk, din, dout):
        return {
            "kernel": (jax.random.normal(kk, (used, din, dout)) * 0.02).astype(dtype),
            "bias": jnp.zeros((used, dout), dtype),
        }

    layers = {
        "layer_norm1": {"weight": jnp.ones((used, h), dtype),
                        "bias": jnp.zeros((used, h), dtype)},
        "layer_norm2": {"weight": jnp.ones((used, h), dtype),
                        "bias": jnp.zeros((used, h), dtype)},
        "q_proj": dense(next(ks), h, h),
        "k_proj": dense(next(ks), h, h),
        "v_proj": dense(next(ks), h, h),
        "out_proj": dense(next(ks), h, h),
        "fc1": dense(next(ks), h, i),
        "fc2": dense(next(ks), i, h),
    }
    return {
        "class_embedding": (jax.random.normal(next(ks), (h,)) * 0.02).astype(dtype),
        "patch_embedding": {
            "kernel": (jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, cfg.num_channels, h)
            ) * 0.02).astype(dtype),
        },
        "position_embedding": (
            jax.random.normal(next(ks), (cfg.num_positions, h)) * 0.02
        ).astype(dtype),
        "pre_layrnorm": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "layers": layers,
    }


def convert_hf(sd, cfg: CLIPVisionConfig):
    """HF CLIPVisionModel state dict -> param pytree (layers trimmed to the
    select tap)."""
    import numpy as np

    from memory_augmented_vlm_tpu.checkpoint.hf_import import _stack, _strip_prefix

    sd = _strip_prefix(sd, ("vision_tower.vision_tower.vision_model.",
                            "vision_model.",))
    used = cfg.num_hidden_layers + cfg.select_layer + 1
    p = "encoder.layers.{}."
    layers = {
        "layer_norm1": {"weight": _stack(sd, p + "layer_norm1.weight", used),
                        "bias": _stack(sd, p + "layer_norm1.bias", used)},
        "layer_norm2": {"weight": _stack(sd, p + "layer_norm2.weight", used),
                        "bias": _stack(sd, p + "layer_norm2.bias", used)},
        "q_proj": {"kernel": _stack(sd, p + "self_attn.q_proj.weight", used, transpose=True),
                   "bias": _stack(sd, p + "self_attn.q_proj.bias", used)},
        "k_proj": {"kernel": _stack(sd, p + "self_attn.k_proj.weight", used, transpose=True),
                   "bias": _stack(sd, p + "self_attn.k_proj.bias", used)},
        "v_proj": {"kernel": _stack(sd, p + "self_attn.v_proj.weight", used, transpose=True),
                   "bias": _stack(sd, p + "self_attn.v_proj.bias", used)},
        "out_proj": {"kernel": _stack(sd, p + "self_attn.out_proj.weight", used, transpose=True),
                     "bias": _stack(sd, p + "self_attn.out_proj.bias", used)},
        "fc1": {"kernel": _stack(sd, p + "mlp.fc1.weight", used, transpose=True),
                "bias": _stack(sd, p + "mlp.fc1.bias", used)},
        "fc2": {"kernel": _stack(sd, p + "mlp.fc2.weight", used, transpose=True),
                "bias": _stack(sd, p + "mlp.fc2.bias", used)},
    }
    return {
        "class_embedding": sd["embeddings.class_embedding"].astype(np.float32),
        "patch_embedding": {
            "kernel": sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0).astype(np.float32),
        },
        "position_embedding": sd["embeddings.position_embedding.weight"].astype(np.float32),
        "pre_layrnorm": {"weight": sd["pre_layrnorm.weight"].astype(np.float32),
                         "bias": sd["pre_layrnorm.bias"].astype(np.float32)},
        "layers": layers,
    }
