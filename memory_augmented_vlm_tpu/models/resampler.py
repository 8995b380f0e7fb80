"""Vision resamplers — capability parity with
llava/model/multimodal_resampler/ (all dormant on the active path, selected
by `mm_resampler_type`; `None` -> identity, builder.py:21-34):

  - `masked_drop`  : random token masking at train time (masked_drop.py)
  - `spatial_pool` : 2-D pooling downsample (spatial_pool.py)
  - `perceiver`    : Flamingo-style latent resampler (perceiver.py)
  - `qformer`      : full BLIP-2 BERT Q-Former (qformer.py, 1,160 LoC) —
                     models/qformer.py, loads reference-pretrained weights
                     (parity: tests/test_qformer_parity.py)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.norms import layer_norm
from memory_augmented_vlm_tpu.ops.pooling import avg_pool_2d, max_pool_2d, bilinear_resize


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_params(resampler_type: Optional[str], key: jax.Array, *,
                hidden: int, latents: int = 64, depth: int = 2, heads: int = 8,
                dtype=jnp.float32):
    if resampler_type in (None, "identity", "none"):
        return {}
    ks = jax.random.split(key, depth * 8 + 2)

    def dense(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    def lin(k, i, o):
        return {"kernel": dense(k, (i, o)), "bias": jnp.zeros((o,), dtype)}

    def ln():
        return {"weight": jnp.ones((hidden,), dtype), "bias": jnp.zeros((hidden,), dtype)}

    if resampler_type == "masked_drop":
        return {}
    if resampler_type == "spatial_pool":
        return {}
    if resampler_type == "qformer":
        from memory_augmented_vlm_tpu.models import qformer as qformer_mod

        qcfg = qformer_mod.QFormerConfig(
            hidden_size=hidden if hidden % heads == 0 else 768,
            num_hidden_layers=max(depth, 1) * 2,
            num_attention_heads=heads,
            intermediate_size=4 * (hidden if hidden % heads == 0 else 768),
            encoder_width=hidden,
            num_query_tokens=latents,
            cross_attention_freq=max(depth, 1),
        )
        return qformer_mod.init_params(qcfg, key, dtype=dtype)
    if resampler_type == "perceiver":
        layers = []
        for i in range(depth):
            lk = jax.random.split(ks[i], 8)
            layers.append({
                "ln_q": ln(), "ln_kv": ln(), "ln_mlp": ln(),
                "q": lin(lk[0], hidden, hidden),
                "k": lin(lk[1], hidden, hidden),
                "v": lin(lk[2], hidden, hidden),
                "o": lin(lk[3], hidden, hidden),
                "fc1": lin(lk[4], hidden, hidden * 4),
                "fc2": lin(lk[5], hidden * 4, hidden),
            })
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        return {
            "latents": dense(ks[-1], (latents, hidden), scale=1.0 / hidden**0.5),
            "layers": stacked,
            "final_ln": ln(),
        }
    raise ValueError(f"unknown resampler: {resampler_type}")


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _linear(p, x):
    return jnp.einsum("...i,io->...o", x, p["kernel"]) + p["bias"]


def _xattn(lp, heads, q_in, kv_in):
    b, lq, h = q_in.shape
    hd = h // heads
    q = _linear(lp["q"], layer_norm(q_in, lp["ln_q"]["weight"], lp["ln_q"]["bias"]))
    kvn = layer_norm(kv_in, lp["ln_kv"]["weight"], lp["ln_kv"]["bias"])
    k = _linear(lp["k"], kvn)
    v = _linear(lp["v"], kvn)
    q = q.reshape(b, lq, heads, hd)
    k = k.reshape(b, -1, heads, hd)
    v = v.reshape(b, -1, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / hd**0.5
    probs = jax.nn.softmax(logits, axis=-1).astype(q_in.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, lq, h)
    x = q_in + _linear(lp["o"], ctx)
    y = layer_norm(x, lp["ln_mlp"]["weight"], lp["ln_mlp"]["bias"])
    y = _linear(lp["fc2"], jax.nn.gelu(_linear(lp["fc1"], y), approximate=False))
    return x + y


def forward(params, resampler_type: Optional[str], x: jax.Array, *,
            train: bool = False, rng: Optional[jax.Array] = None,
            drop_ratio: float = 0.5, pool_stride: int = 2,
            pool_mode: str = "average", heads: int = 8) -> jax.Array:
    """x: (B, N, H) vision features -> resampled features."""
    if resampler_type in (None, "identity", "none"):
        return x
    if resampler_type == "masked_drop":
        if not train or rng is None:
            return x
        b, n, h = x.shape
        keep = max(1, int(n * (1.0 - drop_ratio)))
        noise = jax.random.uniform(rng, (b, n))
        idx = jnp.argsort(noise, axis=1)[:, :keep]
        return jnp.take_along_axis(x, jnp.sort(idx, axis=1)[..., None], axis=1)
    if resampler_type == "spatial_pool":
        b, n, h = x.shape
        side = int(round(n**0.5))
        img = x.reshape(b, side, side, h)
        if pool_mode == "average":
            img = avg_pool_2d(img, pool_stride)
        elif pool_mode == "max":
            img = max_pool_2d(img, pool_stride)
        else:
            out = -(-side // pool_stride)
            img = bilinear_resize(img, out, out)
        return img.reshape(b, -1, h)
    if resampler_type == "qformer":
        from memory_augmented_vlm_tpu.models import qformer as qformer_mod

        qcfg = qformer_mod.QFormerConfig(
            hidden_size=params["query_tokens"].shape[-1],
            num_hidden_layers=len(params["layers"]),
            num_attention_heads=heads,
            intermediate_size=params["layers"][0]["ffn_q"]["intermediate"]["kernel"].shape[-1],
            encoder_width=params["ln_vision"]["weight"].shape[0],
            num_query_tokens=params["query_tokens"].shape[0],
        )
        return qformer_mod.forward(params, qcfg, x)
    if resampler_type == "perceiver":
        b = x.shape[0]
        lat = jnp.broadcast_to(params["latents"][None], (b,) + params["latents"].shape)
        lat = lat.astype(x.dtype)

        def body(lat, lp):
            # perceiver: queries attend over [features; latents]
            kv = jnp.concatenate([x, lat], axis=1)
            return _xattn(lp, heads, lat, kv), None

        lat, _ = jax.lax.scan(body, lat, params["layers"])
        return layer_norm(lat, params["final_ln"]["weight"], params["final_ln"]["bias"])
    raise ValueError(f"unknown resampler: {resampler_type}")
