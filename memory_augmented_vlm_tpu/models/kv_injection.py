"""Memory-as-KV injection (dormant experimental path).

Capability parity with `inject_memory_as_kv` (llava_arch.py:880-922) and the
vendored per-layer memory-prompt Qwen2 (language_model/modeling_qwen2.py
:743-794, :1062-1115): instead of splicing memory tokens into the input
sequence, project them into per-layer K/V and prepend to the cache, so every
layer attends to the memory bank "for free".

Functional design: `inject_memory_as_kv` takes per-layer projection params
(the reference references undefined `memory_key_projs` — here they are real,
initialized by `init_kv_proj_params`) and returns a KVCache whose first
`T` positions hold the projected memory; `prepend_to_cache` merges with an
existing prefill cache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig
from memory_augmented_vlm_tpu.models.qwen2 import KVCache


def init_kv_proj_params(cfg: LMConfig, key: jax.Array, dtype=jnp.float32):
    """Per-layer memory K/V projections, stacked for scan:
    kernels (L, H, Hkv*Dh)."""
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    out = cfg.num_key_value_heads * cfg.head_dim
    kk, kv = jax.random.split(key)
    scale = 0.02
    return {
        "memory_key_projs": (jax.random.normal(kk, (L, H, out)) * scale).astype(dtype),
        "memory_value_projs": (jax.random.normal(kv, (L, H, out)) * scale).astype(dtype),
    }


def inject_memory_as_kv(
    proj_params,
    cfg: LMConfig,
    memory_readout: jax.Array,  # (T, H) flattened memory tokens
    max_len: int,
) -> KVCache:
    """Project memory into a fresh KVCache occupying positions [0, T)."""
    t, h = memory_readout.shape
    if max_len < t:
        raise ValueError(f"max_len {max_len} < memory tokens {t}")
    nkv, dh = cfg.num_key_value_heads, cfg.head_dim
    mem_k = jnp.einsum("th,lho->lto", memory_readout, proj_params["memory_key_projs"])
    mem_v = jnp.einsum("th,lho->lto", memory_readout, proj_params["memory_value_projs"])
    mem_k = mem_k.reshape(cfg.num_hidden_layers, 1, t, nkv, dh)
    mem_v = mem_v.reshape(cfg.num_hidden_layers, 1, t, nkv, dh)
    pad = ((0, 0), (0, 0), (0, max_len - t), (0, 0), (0, 0))
    return KVCache(
        k=jnp.pad(mem_k, pad).astype(memory_readout.dtype),
        v=jnp.pad(mem_v, pad).astype(memory_readout.dtype),
        length=jnp.asarray([t], jnp.int32),
    )


def prepend_to_cache(memory_cache: KVCache, cache: KVCache) -> KVCache:
    """Concatenate memory KV before an existing cache (llava_arch.py:916-917
    `cat([mem, old], dim=2)`), re-padded to the combined static length."""
    t = memory_cache.length[0]
    L, b, s_mem, nkv, dh = memory_cache.k.shape
    s_old = cache.k.shape[2]

    def merge(mem, old):
        total = s_mem + s_old
        out = jnp.zeros((L, b, total, nkv, dh), old.dtype)
        out = jax.lax.dynamic_update_slice(out, mem.astype(old.dtype), (0, 0, 0, 0, 0))
        # old cache contents shift right by t (dynamic)
        idx = jnp.arange(total)
        src = jnp.clip(idx - t, 0, s_old - 1)
        shifted = jnp.take(old, src, axis=2)
        keep_old = (idx >= t)[None, None, :, None, None]
        return jnp.where(keep_old, shifted, out)

    return KVCache(
        k=merge(memory_cache.k, cache.k),
        v=merge(memory_cache.v, cache.v),
        length=cache.length + t,
    )
