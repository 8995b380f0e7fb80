"""Recurrent memory transformer — the reference's novel capability, TPU-native.

Reference semantics (llava/model/memory_module/MemoryController.py):
  per 32-frame segment,
    1. memory evolution: if the cache is non-empty, take the *last* cached
       memory as the current tokens and cross-attend them (queries, flattened
       to 8*196 tokens) over the concatenated cache (keys/values)
       (`_update_memory_tokens_with_cache`, :89-115); otherwise use the
       learned `initial_memory + memory_pos_embed` (:123-127);
    2. fusion: `depth`(=2) post-LN transformer layers where the memory
       (8*196 queries) cross-attends over the segment's frame tokens
       (F*196 keys) with a relu MLP, each sub-block wrapped in the
       `Residual` = LayerNorm(Linear(out) + input) pattern (:59-72);
    3. append the result to a ring cache capped at 10 entries (:152-154).

TPU-first re-design: the per-video loop is a single `lax.scan` over a static
number of segments carrying `(cache, cache_len)`; the cache is a fixed
`(cap, 8, 196, D)` array with a validity count instead of a Python list, and
padded frames/segments are handled with masks inside the fp32 softmax (never
zero-filled keys). The whole video -> memory bank computation jits with
static shapes for any frame bucket.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import MemoryConfig
from memory_augmented_vlm_tpu.ops.norms import layer_norm

NEG_INF = -1e30


class MemoryState(NamedTuple):
    cache: jax.Array      # (cap, num_mem, patch, D)
    cache_len: jax.Array  # () int32 — number of valid entries (<= cap)

    @staticmethod
    def zeros(cfg: MemoryConfig, dtype=jnp.float32) -> "MemoryState":
        return MemoryState(
            cache=jnp.zeros(
                (cfg.cache_cap, cfg.num_memory_tokens, cfg.patch_size, cfg.hidden_size),
                dtype,
            ),
            cache_len=jnp.zeros((), jnp.int32),
        )


def _attn_init(key, h, dtype):
    ks = jax.random.split(key, 4)

    def dense(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    def lin(k, i, o):
        return {"kernel": dense(k, (i, o)), "bias": jnp.zeros((o,), dtype)}

    return {
        "q_proj": lin(ks[0], h, h),
        "k_proj": lin(ks[1], h, h),
        "v_proj": lin(ks[2], h, h),
        "residual": {
            "dense": lin(ks[3], h, h),
            "layernorm": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        },
    }


def init_params(cfg: MemoryConfig, key: jax.Array, dtype=jnp.float32):
    h, inter = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 4 + cfg.depth)

    def dense(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    layers = []
    for i in range(cfg.depth):
        lk = jax.random.split(ks[3 + i], 3)
        layers.append({
            "attention": _attn_init(lk[0], h, dtype),
            "mlp": {"kernel": dense(lk[1], (h, inter)), "bias": jnp.zeros((inter,), dtype)},
            "residual": {
                "dense": {"kernel": dense(lk[2], (inter, h)), "bias": jnp.zeros((h,), dtype)},
                "layernorm": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
            },
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    # xavier-uniform initial memory (MemoryController.py:84); torch fan
    # convention for a 3-D tensor: fan_in = patch*h, fan_out = num_tokens*h
    fan_in, fan_out = cfg.patch_size * h, cfg.num_memory_tokens * h
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return {
        "initial_memory": (
            jax.random.uniform(ks[0], (cfg.num_memory_tokens, cfg.patch_size, h),
                               minval=-bound, maxval=bound)
        ).astype(dtype),
        "memory_pos_embed": dense(ks[1], (cfg.num_memory_tokens, 1, h), scale=1.0),
        "memory_update_attention": _attn_init(ks[2], h, dtype),
        "layers": stacked,
    }


def _linear(p, x):
    return jnp.einsum("...i,io->...o", x, p["kernel"]) + p["bias"]


def _residual(p, hidden, input_tensor, eps):
    out = _linear(p["dense"], hidden)
    return layer_norm(out + input_tensor, p["layernorm"]["weight"], p["layernorm"]["bias"], eps)


def attention(p, cfg: MemoryConfig, query: jax.Array, kv: jax.Array,
              kv_mask: Optional[jax.Array] = None,
              kv_valid_len: Optional[jax.Array] = None) -> jax.Array:
    """Post-LN cross attention (MemoryController.py:31-57).

    query: (B, Lq, D), kv: (B, Lk, D), kv_mask: (B, Lk) bool (True = attend).
    output = LayerNorm(Linear(softmax(QK^T/sqrt(dh)) V) + query).

    On TPU, when the mask is a prefix (kv_valid_len given), the softmax runs
    through the Pallas flash kernel with the head dim zero-padded to a lane
    multiple — the XLA path materializes (H, Lq, Lk) fp32 logits (~315 MB at
    the flagship 1568x6272 shape), which made the memory module HBM-bound.
    """
    b, lq, d = query.shape
    nh = cfg.num_attention_heads
    hd = d // nh
    q = _linear(p["q_proj"], query).reshape(b, lq, nh, hd)
    k = _linear(p["k_proj"], kv).reshape(b, kv.shape[1], nh, hd)
    v = _linear(p["v_proj"], kv).reshape(b, kv.shape[1], nh, hd)

    use_flash = (
        jax.default_backend() == "tpu"
        and kv_mask is None
        and lq >= 128
        and kv.shape[1] >= 256
    )
    if use_flash:
        from memory_augmented_vlm_tpu.ops.pallas_flash import pallas_flash_attention

        hd_pad = ((hd + 127) // 128) * 128
        pad = ((0, 0), (0, 0), (0, 0), (0, hd_pad - hd))
        ctx = pallas_flash_attention(
            jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
            causal=False,
            kv_valid_len=kv_valid_len,
            scale=hd**-0.5,
            block_q=256,
            block_k=512,
        )[..., :hd].reshape(b, lq, d)
    else:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / (hd**0.5)
        if kv_mask is not None:
            logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
        elif kv_valid_len is not None:
            pos = jnp.arange(kv.shape[1])[None, None, None, :]
            logits = jnp.where(pos < kv_valid_len[:, None, None, None], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(query.dtype), v).reshape(b, lq, d)
    return _residual(p["residual"], ctx, query, cfg.layer_norm_eps)


def _act(cfg: MemoryConfig, x):
    if cfg.hidden_act == "relu":
        return jax.nn.relu(x)
    if cfg.hidden_act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(cfg.hidden_act)


def evolve_with_cache(params, cfg: MemoryConfig, state: MemoryState) -> jax.Array:
    """Memory-evolution step (MemoryController.py:89-115, :125-127).

    Takes the last cached memory as the current tokens and cross-attends the
    flattened (8*196) queries over every valid cached memory. Only called when
    cache_len > 0 (callers guard with lax.cond).
    """
    cap, nm, pp, d = state.cache.shape
    last = jax.lax.dynamic_index_in_dim(
        state.cache, jnp.maximum(state.cache_len - 1, 0), axis=0, keepdims=False
    )
    query = last.reshape(1, nm * pp, d)
    keyval = state.cache.reshape(1, cap * nm * pp, d)
    # valid cache entries occupy a prefix -> express the mask as a length so
    # the flash path applies
    kv_len = (state.cache_len * nm * pp)[None]
    updated = attention(params["memory_update_attention"], cfg, query, keyval,
                        kv_valid_len=kv_len)
    return updated.reshape(nm, pp, d)


def fuse_segment(params, cfg: MemoryConfig, memory_tokens: jax.Array,
                 segment: jax.Array, frame_valid: jax.Array) -> jax.Array:
    """Fusion transformer: memory queries over segment frame tokens
    (MemoryController.py:118-141), with padded frames masked out.

    memory_tokens: (8, 196, D); segment: (Fseg, 196, D);
    frame_valid: (Fseg,) bool.
    """
    nm, pp, d = memory_tokens.shape
    fseg = segment.shape[0]
    mem2d = memory_tokens.reshape(1, nm * pp, d)
    seg2d = segment.reshape(1, fseg * pp, d)
    # valid frames are a prefix of the segment (global prefix padding), so a
    # length mask suffices and enables the flash kernel
    kv_len = (jnp.sum(frame_valid.astype(jnp.int32)) * pp)[None]

    def layer_body(mem2d, lp):
        attn_out = attention(lp["attention"], cfg, mem2d, seg2d,
                             kv_valid_len=kv_len)
        mlp_out = _act(cfg, _linear(lp["mlp"], attn_out))
        out = _residual(lp["residual"], mlp_out, attn_out, cfg.layer_norm_eps)
        return out, None

    mem2d, _ = jax.lax.scan(layer_body, mem2d, params["layers"])
    return mem2d.reshape(nm, pp, d)


def segment_step(params, cfg: MemoryConfig, state: MemoryState,
                 segment: jax.Array, frame_valid: jax.Array) -> MemoryState:
    """One recurrent step (MemoryController.py:118-158): evolve -> fuse ->
    append to the ring cache (sliding window of the last `cap` entries)."""

    def with_cache(_):
        return evolve_with_cache(params, cfg, state)

    def without_cache(_):
        init = params["initial_memory"] + params["memory_pos_embed"]
        return init.astype(state.cache.dtype)

    memory_tokens = jax.lax.cond(state.cache_len > 0, with_cache, without_cache, None)
    final = fuse_segment(params, cfg, memory_tokens, segment, frame_valid)

    cap = state.cache.shape[0]
    full = state.cache_len >= cap
    # sliding window: when full, drop the oldest (roll left), write at cap-1
    rolled = jnp.where(full, jnp.roll(state.cache, -1, axis=0), state.cache)
    write_idx = jnp.where(full, cap - 1, state.cache_len)
    new_cache = jax.lax.dynamic_update_index_in_dim(rolled, final, write_idx, axis=0)
    new_len = jnp.minimum(state.cache_len + 1, cap)

    # fully-padded segment: no-op
    any_valid = jnp.any(frame_valid)
    return MemoryState(
        cache=jnp.where(any_valid, new_cache, state.cache),
        cache_len=jnp.where(any_valid, new_len, state.cache_len),
    )


def run_video(params, cfg: MemoryConfig, frames: jax.Array,
              frame_valid: jax.Array) -> MemoryState:
    """Run the recurrent memory over a whole (padded) video.

    frames:      (Fmax, 196, D) pooled+PE'd features, Fmax % segment_frames == 0.
    frame_valid: (Fmax,) bool.

    Segmentation follows `uniform_segment_variant(d=32)` (segment.py:169-192):
    the active sampler emits either one short segment (<32 frames) or exact
    multiples of 32, so fixed 32-frame chunks with masking cover both.
    """
    fmax, pp, d = frames.shape
    seg = cfg.segment_frames
    assert fmax % seg == 0, f"pad frames to a multiple of {seg}, got {fmax}"
    nseg = fmax // seg
    segs = frames.reshape(nseg, seg, pp, d)
    valids = frame_valid.reshape(nseg, seg)

    def body(state, xs):
        segment, valid = xs
        return segment_step(params, cfg, state, segment, valid), None

    state0 = MemoryState.zeros(cfg, dtype=frames.dtype)
    state, _ = jax.lax.scan(body, state0, (segs, valids))
    return state


def fuse_memory_bank(fuser_params, state: MemoryState) -> Tuple[jax.Array, jax.Array]:
    """Memory-fuser MLP over the concatenated cache (llava_arch.py:132-136,546).

    Returns (fused (cap*8, 196, D), token_valid (cap*8,) bool) — downstream
    splicing keeps only valid entries.
    """
    cap, nm, pp, d = state.cache.shape
    x = state.cache.reshape(cap * nm, pp, d)
    h = _linear(fuser_params["fc1"], x)
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(fuser_params["fc2"], h)
    valid = jnp.repeat(jnp.arange(cap) < state.cache_len, nm)
    return h, valid
