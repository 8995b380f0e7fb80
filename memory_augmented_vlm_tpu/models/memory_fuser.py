"""Alternate TransformerEncoder memory fuser — parity with the reference's
dormant `MemoryFuser` (llava/model/memory_module/MemoryFuser.py:4-30):
input_proj -> torch `nn.TransformerEncoder` (post-norm layers, gelu FFN,
batch_first) -> output_proj. The active path uses the MLP fuser in
models/memory.py instead (llava_arch.py:132-136); this variant loads the
reference's `MemoryFuser` state_dict keys (input_proj, transformer_encoder.
layers.{i}.self_attn/linear1/linear2/norm1/norm2, output_proj).

Parity pinned against torch in tests/test_bigru.py."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.norms import layer_norm


def init_params(hidden_dim: int, key: jax.Array, num_layers: int = 2,
                dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, num_layers * 6 + 2)

    def lin(k, i, o, scale=0.02):
        return {"kernel": (jax.random.normal(k, (i, o)) * scale).astype(dtype),
                "bias": jnp.zeros((o,), dtype)}

    def ln():
        return {"weight": jnp.ones((hidden_dim,), dtype),
                "bias": jnp.zeros((hidden_dim,), dtype)}

    layers = []
    for i in range(num_layers):
        lk = jax.random.split(ks[i], 6)
        layers.append({
            "in_proj": lin(lk[0], hidden_dim, 3 * hidden_dim),
            "out_proj": lin(lk[1], hidden_dim, hidden_dim),
            "linear1": lin(lk[2], hidden_dim, 4 * hidden_dim),
            "linear2": lin(lk[3], 4 * hidden_dim, hidden_dim),
            "norm1": ln(),
            "norm2": ln(),
        })
    return {
        "input_proj": lin(ks[-2], hidden_dim, hidden_dim),
        "layers": layers,
        "output_proj": lin(ks[-1], hidden_dim, hidden_dim),
    }


def _linear(p, x):
    return jnp.einsum("...i,io->...o", x, p["kernel"]) + p["bias"]


def _encoder_layer(lp, x: jax.Array, num_heads: int) -> jax.Array:
    """torch TransformerEncoderLayer, post-norm (norm_first=False), gelu."""
    b, s, h = x.shape
    hd = h // num_heads
    qkv = _linear(lp["in_proj"], x)                       # (B, S, 3H)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, num_heads, hd)
    k = k.reshape(b, s, num_heads, hd)
    v = v.reshape(b, s, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / hd**0.5
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, h)
    x = layer_norm(x + _linear(lp["out_proj"], ctx),
                   lp["norm1"]["weight"], lp["norm1"]["bias"], 1e-5)
    ff = _linear(lp["linear2"], jax.nn.gelu(_linear(lp["linear1"], x),
                                            approximate=False))
    return layer_norm(x + ff, lp["norm2"]["weight"], lp["norm2"]["bias"], 1e-5)


def forward(params, memory_tokens: jax.Array, num_heads: int = 4) -> jax.Array:
    """(B, num_segments, H) memory tokens -> fused (B, num_segments, H)."""
    x = _linear(params["input_proj"], memory_tokens)
    for lp in params["layers"]:
        x = _encoder_layer(lp, x, num_heads)
    return _linear(params["output_proj"], x)


def convert_torch(sd: Dict) -> Dict:
    """Map the reference MemoryFuser state_dict."""
    def lin(prefix):
        return {"kernel": jnp.asarray(sd[prefix + ".weight"]).T,
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"weight": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    layers = []
    i = 0
    while f"transformer_encoder.layers.{i}.self_attn.in_proj_weight" in sd:
        base = f"transformer_encoder.layers.{i}"
        layers.append({
            "in_proj": {
                "kernel": jnp.asarray(sd[f"{base}.self_attn.in_proj_weight"]).T,
                "bias": jnp.asarray(sd[f"{base}.self_attn.in_proj_bias"]),
            },
            "out_proj": lin(f"{base}.self_attn.out_proj"),
            "linear1": lin(f"{base}.linear1"),
            "linear2": lin(f"{base}.linear2"),
            "norm1": ln(f"{base}.norm1"),
            "norm2": ln(f"{base}.norm2"),
        })
        i += 1
    return {
        "input_proj": lin("input_proj"),
        "layers": layers,
        "output_proj": lin("output_proj"),
    }
