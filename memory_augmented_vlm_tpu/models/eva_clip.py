"""EVA-CLIP vision towers, TPU-native.

Capability parity with the reference's vendored EVA-CLIP tree
(llava/model/multimodal_encoder/eva_clip/eva_vit.py:501-848,
eva_clip_encoder.py:11-77) — the `EvaClipVisionTower` / `EVAEncoderWrapper`
families are commented out of the reference's tower builder
(builder.py:36-39) but ship in full; here they are a functional ViT with
the EVA-specific pieces as config flags:

  - 2D VisionRotaryEmbeddingFast on q/k EXCLUDING the cls token
    (eva_vit.py:37-86,325-333): per-axis interleaved-pair rope of
    head_dim//2 frequencies, row/col concatenated, with `intp_freq`
    interpolation (t = arange(ft)/ft * pt);
  - subln attention: separate q/k/v projections with q/v bias only and an
    inner LayerNorm between attention and the output projection
    (eva_vit.py:252-262,296);
  - naiveswiglu MLP: silu(w1 x) * (w2 x) -> ffn LayerNorm -> w3
    (eva_vit.py:217-239); the EVA01 variant is a plain gelu MLP;
  - optional postnorm blocks and layer-scale gammas (eva_vit.py:429-445);
  - `forward_features` SKIPS the last block (eva_vit.py:689-691) and the
    encoder wrapper strips the cls token (eva_vit.py:846-848), so the tower
    output is (B, num_patches, width) from depth-1 blocks, un-normalized.

Weight layout matches `EVAVisionTransformer.state_dict()`
(`convert_eva_state_dict`), parity-pinned by tests/test_eva_clip.py, which
imports the reference eva_vit (with its timm dependency stubbed) and
compares outputs on random init.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.attention import mha_attention
from memory_augmented_vlm_tpu.ops.norms import layer_norm

# vision_cfg dicts of the reference model_configs/ JSONs (factory.py) for
# the headline EVA releases; any vision_cfg dict is accepted too
MODEL_CONFIGS = {
    "EVA02-CLIP-L-14-336": dict(
        image_size=336, layers=24, width=1024, head_width=64,
        mlp_ratio=2.6667, patch_size=14, xattn=True, rope=True,
        pt_hw_seq_len=16, intp_freq=True, naiveswiglu=True, subln=True),
    "EVA02-CLIP-L-14": dict(
        image_size=224, layers=24, width=1024, head_width=64,
        mlp_ratio=2.6667, patch_size=14, xattn=True, rope=True,
        pt_hw_seq_len=16, intp_freq=True, naiveswiglu=True, subln=True),
    "EVA01-CLIP-g-14": dict(
        image_size=224, layers=40, width=1408, head_width=88,
        mlp_ratio=4.3637, patch_size=14, xattn=True, rope=False,
        naiveswiglu=False, subln=False),
    "EVA-CLIP-8B": dict(
        image_size=224, layers=32, width=4096, head_width=128,
        mlp_ratio=5.0, patch_size=14, xattn=True, rope=False,
        postnorm=True, naiveswiglu=False, subln=False),
}


@dataclasses.dataclass(frozen=True)
class EvaVisionConfig:
    width: int = 1024
    layers: int = 24
    head_width: int = 64
    mlp_ratio: float = 2.6667
    patch_size: int = 14
    image_size: int = 336
    qkv_bias: bool = True
    rope: bool = False
    pt_hw_seq_len: int = 16
    intp_freq: bool = False
    naiveswiglu: bool = False
    subln: bool = False
    postnorm: bool = False
    ls_init_value: Optional[float] = None
    layer_norm_eps: float = 1e-6
    num_channels: int = 3

    @staticmethod
    def from_vision_cfg(raw: dict) -> "EvaVisionConfig":
        known = {f.name for f in dataclasses.fields(EvaVisionConfig)}
        return EvaVisionConfig(**{k: v for k, v in raw.items() if k in known})

    @property
    def num_heads(self) -> int:
        return self.width // self.head_width

    @property
    def hw(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.hw * self.hw

    @property
    def mlp_hidden(self) -> int:
        return int(self.width * self.mlp_ratio)


def rope_2d_tables(cfg: EvaVisionConfig):
    """VisionRotaryEmbeddingFast buffers (eva_vit.py:37-67): (hw*hw, head_dim)
    cos/sin with per-axis interleaved-duplicated lang frequencies."""
    dim = cfg.head_width // 2                  # per-axis rope dim
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    ft = cfg.hw
    pt = cfg.pt_hw_seq_len if cfg.intp_freq else ft
    t = np.arange(ft) / ft * pt if cfg.intp_freq else np.arange(ft)
    freqs = np.einsum("n,f->nf", t, inv)       # (ft, dim//2)
    freqs = np.repeat(freqs, 2, axis=-1)       # (ft, dim) — '(n r)' with r=2
    # broadcat row/col: (ft, 1, dim) + (1, ft, dim) -> (ft, ft, 2*dim)
    row = np.broadcast_to(freqs[:, None, :], (ft, ft, dim))
    col = np.broadcast_to(freqs[None, :, :], (ft, ft, dim))
    full = np.concatenate([row, col], axis=-1).reshape(ft * ft, 2 * dim)
    return jnp.asarray(np.cos(full), jnp.float32), \
        jnp.asarray(np.sin(full), jnp.float32)


def _rotate_half_interleaved(x):
    """eva_vit.py::rotate_half: pairs are adjacent ('... (d r)' with r=2)."""
    x2 = x[..., 1::2]
    x1 = x[..., 0::2]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(x.shape)


def _apply_rope(x, cos, sin):
    """x: (B, S, H, D) patch tokens (no cls); tables (S, D)."""
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return x * c + _rotate_half_interleaved(x) * s


def init_params(cfg: EvaVisionConfig, key: jax.Array, dtype=jnp.float32):
    L, H, I = cfg.layers, cfg.width, cfg.mlp_hidden
    ks = jax.random.split(key, 16)

    def dense(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    def ln(stacked=True):
        shape = (L, H) if stacked else (H,)
        return {"weight": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    layers = {
        "norm1": ln(),
        "norm2": ln(),
        "q_proj": {"kernel": dense(ks[2], (L, H, H)),
                   "bias": jnp.zeros((L, H), dtype)},
        "k_proj": {"kernel": dense(ks[3], (L, H, H))},
        "v_proj": {"kernel": dense(ks[4], (L, H, H)),
                   "bias": jnp.zeros((L, H), dtype)},
        "proj": {"kernel": dense(ks[5], (L, H, H)),
                 "bias": jnp.zeros((L, H), dtype)},
    }
    if cfg.subln:
        layers["inner_attn_ln"] = {"weight": jnp.ones((L, H), dtype),
                                   "bias": jnp.zeros((L, H), dtype)}
    if cfg.naiveswiglu:
        layers["w1"] = {"kernel": dense(ks[6], (L, H, I)),
                        "bias": jnp.zeros((L, I), dtype)}
        layers["w2"] = {"kernel": dense(ks[7], (L, H, I)),
                        "bias": jnp.zeros((L, I), dtype)}
        layers["w3"] = {"kernel": dense(ks[8], (L, I, H)),
                        "bias": jnp.zeros((L, H), dtype)}
        if cfg.subln:
            layers["ffn_ln"] = {"weight": jnp.ones((L, I), dtype),
                                "bias": jnp.zeros((L, I), dtype)}
    else:
        layers["fc1"] = {"kernel": dense(ks[6], (L, H, I)),
                         "bias": jnp.zeros((L, I), dtype)}
        layers["fc2"] = {"kernel": dense(ks[7], (L, I, H)),
                         "bias": jnp.zeros((L, H), dtype)}
        if cfg.subln:
            layers["ffn_ln"] = {"weight": jnp.ones((L, I), dtype),
                                "bias": jnp.zeros((L, I), dtype)}
    if cfg.ls_init_value:
        layers["gamma_1"] = jnp.full((L, H), cfg.ls_init_value, dtype)
        layers["gamma_2"] = jnp.full((L, H), cfg.ls_init_value, dtype)
    return {
        "patch_embed": {
            "kernel": dense(ks[0], (cfg.patch_size, cfg.patch_size,
                                    cfg.num_channels, H)),
            "bias": jnp.zeros((H,), dtype),
        },
        "cls_token": dense(ks[1], (H,)),
        "pos_embed": dense(ks[9], (cfg.num_patches + 1, H)),
        "layers": layers,
    }


def _lin(p, x):
    out = jnp.einsum("...i,io->...o", x, p["kernel"])
    if "bias" in p:
        out = out + p["bias"]
    return out


def forward(params, cfg: EvaVisionConfig, pixel_values: jax.Array,
            *, remat: bool = False) -> jax.Array:
    """(B, H, W, C) NHWC pixels -> (B, num_patches, width) features:
    `EVAEncoderWrapper.forward` semantics (return_all_features, last block
    skipped, cls stripped, no final norm)."""
    x = jax.lax.conv_general_dilated(
        pixel_values,
        params["patch_embed"]["kernel"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = x.shape[0]
    x = x.reshape(b, cfg.num_patches, cfg.width)
    x = x + params["patch_embed"]["bias"].astype(x.dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype)[None, None],
                           (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    nh, hd = cfg.num_heads, cfg.head_width
    s = cfg.num_patches + 1
    if cfg.rope:
        rope_cos, rope_sin = rope_2d_tables(cfg)
    eps = cfg.layer_norm_eps

    def attention(lp, x):
        q = _lin(lp["q_proj"], x).reshape(b, s, nh, hd)
        k = _lin(lp["k_proj"], x).reshape(b, s, nh, hd)
        v = _lin(lp["v_proj"], x).reshape(b, s, nh, hd)
        if cfg.rope:
            q = jnp.concatenate(
                [q[:, :1], _apply_rope(q[:, 1:], rope_cos, rope_sin)], axis=1)
            k = jnp.concatenate(
                [k[:, :1], _apply_rope(k[:, 1:], rope_cos, rope_sin)], axis=1)
        attn = mha_attention(q, k, v).reshape(b, s, cfg.width)
        if cfg.subln:
            attn = layer_norm(attn, lp["inner_attn_ln"]["weight"],
                              lp["inner_attn_ln"]["bias"], eps)
        return _lin(lp["proj"], attn)

    def mlp(lp, x):
        if cfg.naiveswiglu:
            h = jax.nn.silu(_lin(lp["w1"], x)) * _lin(lp["w2"], x)
            if cfg.subln:
                h = layer_norm(h, lp["ffn_ln"]["weight"], lp["ffn_ln"]["bias"],
                               eps)
            return _lin(lp["w3"], h)
        h = jax.nn.gelu(_lin(lp["fc1"], x), approximate=False)
        if cfg.subln:
            h = layer_norm(h, lp["ffn_ln"]["weight"], lp["ffn_ln"]["bias"], eps)
        return _lin(lp["fc2"], h)

    def gamma(lp, name, y):
        return lp[name] * y if cfg.ls_init_value else y

    def layer_body(hidden, lp):
        if cfg.postnorm:
            a = layer_norm(attention(lp, hidden), lp["norm1"]["weight"],
                           lp["norm1"]["bias"], eps)
            hidden = hidden + gamma(lp, "gamma_1", a)
            m = layer_norm(mlp(lp, hidden), lp["norm2"]["weight"],
                           lp["norm2"]["bias"], eps)
            hidden = hidden + gamma(lp, "gamma_2", m)
        else:
            a = attention(lp, layer_norm(hidden, lp["norm1"]["weight"],
                                         lp["norm1"]["bias"], eps))
            hidden = hidden + gamma(lp, "gamma_1", a)
            m = mlp(lp, layer_norm(hidden, lp["norm2"]["weight"],
                                   lp["norm2"]["bias"], eps))
            hidden = hidden + gamma(lp, "gamma_2", m)
        return hidden, None

    if remat:
        layer_body = jax.checkpoint(layer_body, prevent_cse=False)
    # forward_features skips the LAST block (eva_vit.py:689-691): slice the
    # stacked params to depth-1
    used = jax.tree.map(lambda a: a[: cfg.layers - 1], params["layers"])
    x, _ = jax.lax.scan(layer_body, x, used)
    return x[:, 1:]          # strip cls (eva_vit.py:847)


def convert_eva_state_dict(sd, cfg: EvaVisionConfig) -> dict:
    """EVAVisionTransformer.state_dict() (numpy values) -> param pytree."""
    L = cfg.layers

    def stack(fmt, transpose=False, missing_ok=False):
        rows = []
        for i in range(L):
            key = fmt.format(i)
            if key not in sd:
                if missing_ok:
                    return None
                raise KeyError(key)
            w = np.asarray(sd[key], np.float32)
            rows.append(w.T if transpose else w)
        return jnp.asarray(np.stack(rows))

    def ln_entry(prefix):
        return {"weight": stack(prefix + ".weight"),
                "bias": stack(prefix + ".bias")}

    layers = {
        "norm1": ln_entry("blocks.{}.norm1"),
        "norm2": ln_entry("blocks.{}.norm2"),
        "proj": {"kernel": stack("blocks.{}.attn.proj.weight", transpose=True),
                 "bias": stack("blocks.{}.attn.proj.bias")},
    }
    if cfg.subln:
        layers["q_proj"] = {
            "kernel": stack("blocks.{}.attn.q_proj.weight", transpose=True),
            "bias": stack("blocks.{}.attn.q_bias")}
        layers["k_proj"] = {
            "kernel": stack("blocks.{}.attn.k_proj.weight", transpose=True)}
        layers["v_proj"] = {
            "kernel": stack("blocks.{}.attn.v_proj.weight", transpose=True),
            "bias": stack("blocks.{}.attn.v_bias")}
        layers["inner_attn_ln"] = ln_entry("blocks.{}.attn.inner_attn_ln")
    else:
        # packed qkv weight (3H, H); q/v bias separate, k bias zero
        qkv = stack("blocks.{}.attn.qkv.weight")      # (L, 3H, H)
        h = cfg.width
        layers["q_proj"] = {
            "kernel": jnp.swapaxes(qkv[:, :h], 1, 2),
            "bias": stack("blocks.{}.attn.q_bias")}
        layers["k_proj"] = {"kernel": jnp.swapaxes(qkv[:, h:2 * h], 1, 2)}
        layers["v_proj"] = {
            "kernel": jnp.swapaxes(qkv[:, 2 * h:], 1, 2),
            "bias": stack("blocks.{}.attn.v_bias")}
    if cfg.naiveswiglu:
        layers["w1"] = {"kernel": stack("blocks.{}.mlp.w1.weight", transpose=True),
                        "bias": stack("blocks.{}.mlp.w1.bias")}
        layers["w2"] = {"kernel": stack("blocks.{}.mlp.w2.weight", transpose=True),
                        "bias": stack("blocks.{}.mlp.w2.bias")}
        layers["w3"] = {"kernel": stack("blocks.{}.mlp.w3.weight", transpose=True),
                        "bias": stack("blocks.{}.mlp.w3.bias")}
    else:
        layers["fc1"] = {"kernel": stack("blocks.{}.mlp.fc1.weight", transpose=True),
                         "bias": stack("blocks.{}.mlp.fc1.bias")}
        layers["fc2"] = {"kernel": stack("blocks.{}.mlp.fc2.weight", transpose=True),
                         "bias": stack("blocks.{}.mlp.fc2.bias")}
    if cfg.subln:
        layers["ffn_ln"] = ln_entry("blocks.{}.mlp.ffn_ln")
    if cfg.ls_init_value:
        layers["gamma_1"] = stack("blocks.{}.gamma_1")
        layers["gamma_2"] = stack("blocks.{}.gamma_2")

    patch_w = np.asarray(sd["patch_embed.proj.weight"], np.float32)  # (H,C,p,p)
    return {
        "patch_embed": {
            "kernel": jnp.asarray(patch_w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np.asarray(sd["patch_embed.proj.bias"],
                                           np.float32)),
        },
        "cls_token": jnp.asarray(
            np.asarray(sd["cls_token"], np.float32).reshape(-1)),
        "pos_embed": jnp.asarray(
            np.asarray(sd["pos_embed"], np.float32).reshape(
                cfg.num_patches + 1, cfg.width)),
        "layers": layers,
    }
