"""MLCD RoPE-2D vision tower (alternative encoder, reference
llava/model/multimodal_encoder/mlcd_encoder.py + mlcd/vit_rope2d_hf.py).

CLIP-like pre-LN ViT with NO positional embedding table; instead 2-D rotary
embeddings over (row, col) patch positions: rotary dim = head_dim/2, split
half for rows and half for cols, frequencies concatenated then duplicated
(`repeat(1,1,2)`) and applied with rotate_half in fp32
(vit_rope2d_hf.py:13-29). The CLS token carries a learned rotary phase
(`class_pos_emb`). Feature tap: hidden_states[select_layer] with "patch"
dropping CLS (mlcd_encoder.py:51-63).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class MLCDVisionConfig:
    hidden_size: int = 1664           # vit-bigG
    intermediate_size: int = 8192
    num_hidden_layers: int = 48
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    num_channels: int = 3
    hidden_act: str = "gelu"          # transformers MLCD default; the
                                      # vendored reference inherits CLIP's
                                      # quick_gelu — set per checkpoint config
    select_layer: int = -2
    select_feature: str = "patch"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size


def rot_pos_freqs(params, cfg: MLCDVisionConfig) -> jax.Array:
    """(1 + patches, head_dim/2) rotary angles: CLS uses the learned
    class_pos_emb row; patches use [row_freqs | col_freqs]
    (vit_rope2d_hf.py:290-307,323-325)."""
    side = cfg.num_patches_per_side
    rotary_dim = cfg.head_dim // 2          # angles per token
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, rotary_dim // 2, dtype=np.float32)
                                  / (rotary_dim // 2)))
    pos = np.arange(side, dtype=np.float32)
    table = np.outer(pos, inv_freq)          # (side, rotary_dim/2)
    hpos = np.repeat(np.arange(side), side)  # row index per patch
    wpos = np.tile(np.arange(side), side)    # col index per patch
    patch = np.concatenate([table[hpos], table[wpos]], axis=-1)  # (P, rotary_dim)
    return jnp.concatenate(
        [params["class_pos_emb"].astype(jnp.float32), jnp.asarray(patch)], axis=0)


def _apply_rope2d(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """x: (B, S, H, D); freqs: (S, D/2) — duplicated cos/sin + rotate_half in
    fp32 (vit_rope2d_hf.py:19-29)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    cos = jnp.tile(cos, (1, 2))[None, :, None, :]
    sin = jnp.tile(sin, (1, 2))[None, :, None, :]
    half = xf.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * cos + rot * sin).astype(dtype)


def _linear(p, x):
    out = jnp.einsum("...i,io->...o", x, p["kernel"])
    if "bias" in p:
        out = out + p["bias"]
    return out


def forward(params, cfg: MLCDVisionConfig, pixel_values: jax.Array) -> jax.Array:
    """(B, H, W, C) -> selected features (select layer -2, CLS dropped)."""
    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixel_values,
        params["patch_embedding"]["kernel"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embedding"][None, None, :],
                           (b, 1, cfg.hidden_size)).astype(patches.dtype)
    hidden = jnp.concatenate([cls, patches], axis=1)
    hidden = layer_norm(hidden, params["pre_layrnorm"]["weight"],
                        params["pre_layrnorm"]["bias"], cfg.layer_norm_eps)

    freqs = rot_pos_freqs(params, cfg)
    s, h = hidden.shape[1], cfg.hidden_size
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    def layer_body(hidden, lp):
        residual = hidden
        x = layer_norm(hidden, lp["layer_norm1"]["weight"], lp["layer_norm1"]["bias"],
                       cfg.layer_norm_eps)
        q = _linear(lp["q_proj"], x).reshape(b, s, nh, hd)
        k = _linear(lp["k_proj"], x).reshape(b, s, nh, hd)
        v = _linear(lp["v_proj"], x).reshape(b, s, nh, hd)
        q = _apply_rope2d(q, freqs)
        k = _apply_rope2d(k, freqs)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(x.dtype), v).reshape(b, s, h)
        hidden = residual + _linear(lp["out_proj"], attn)
        residual = hidden
        x = layer_norm(hidden, lp["layer_norm2"]["weight"], lp["layer_norm2"]["bias"],
                       cfg.layer_norm_eps)
        x = _linear(lp["fc1"], x)
        if cfg.hidden_act == "quick_gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = jax.nn.gelu(x, approximate=cfg.hidden_act == "gelu_pytorch_tanh")
        hidden = residual + _linear(lp["fc2"], x)
        return hidden, None

    hidden, _ = jax.lax.scan(layer_body, hidden, params["layers"])
    if cfg.select_feature == "patch":
        return hidden[:, 1:]
    return hidden


def init_params(cfg: MLCDVisionConfig, key: jax.Array, dtype=jnp.float32):
    """Random params matching the `convert_hf` pytree."""
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
        "pre_layrnorm": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "class_pos_emb": (jax.random.normal(next(ks), (1, cfg.head_dim // 2)) * 0.02).astype(dtype),
        "layers": layers,
    }


def convert_hf(sd, cfg: MLCDVisionConfig):
    """HF MLCDVisionModel state dict -> param pytree, trimmed to the tap."""
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
        "pre_layrnorm": {"weight": sd["pre_layrnorm.weight"].astype(np.float32),
                         "bias": sd["pre_layrnorm.bias"].astype(np.float32)},
        "class_pos_emb": sd["class_pos_emb"].astype(np.float32),
        "layers": layers,
    }
