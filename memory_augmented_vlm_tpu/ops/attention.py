"""Attention ops — the TPU replacement for flash-attn-2 (SURVEY.md §2.9).

Three entry points:
  - `mha_attention`     : general batched attention (self or cross), fp32
                          softmax, optional additive mask. XLA-fused reference
                          path; used by the vision tower and the memory module
                          and as the numerical oracle for the Pallas kernels.
  - `flash_attention`   : tiled Pallas flash-attention for LM prefill (causal,
                          long sequence). Falls back to `mha_attention` off-TPU
                          or for tiny shapes.
  - `decode_attention`  : single-query attention against a padded KV cache
                          (latency-critical decode step).

All softmax math is fp32 regardless of input dtype (matches flash-attn-2 and
HF eager attention numerics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite large-negative to avoid NaN from (-inf) - (-inf)

# Training-path attention kernel selector (A/B tooling for bench_train.py):
#   "ours"   — our tiled Pallas backward (ops/pallas_flash_bwd.py)
#   "intree" — jax.experimental in-tree differentiable flash kernel
#   "xla"    — fused-XLA reference attention (materializes logits)
TRAIN_ATTENTION_IMPL = "ours"


def mha_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Batched multi-head attention.

    q: (B, Sq, H, D); k, v: (B, Sk, H, D)   [H may differ via GQA — repeat first]
    mask: broadcastable to (B, H, Sq, Sk); True/nonzero = attend.
    bias: optional additive logits bias broadcastable to (B, H, Sq, Sk)
          (ALiBi for the MPT family), applied after scaling, before masking.
    Returns (B, Sq, H, D) in q.dtype.
    """
    dtype = q.dtype
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    # Logits accumulate in the input dtype (bf16 on TPU — the class of the
    # reference's fp16 eager attention and of flash-attn tensor cores; fp32
    # logits double the HBM traffic of the (B,H,Sq,Sk) tensor). Softmax
    # statistics stay fp32 below. fp32 inputs keep fp32 logits, so CPU
    # parity tests are unaffected.
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=dtype if dtype == jnp.bfloat16
                        else jnp.float32)
    logits = (logits * scale).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        # queries are the last sq positions of the sk-long sequence
        qpos = jnp.arange(sq)[:, None] + (sk - sq)
        kpos = jnp.arange(sk)[None, :]
        logits = jnp.where(kpos <= qpos, logits, NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v)
    return out


def repeat_kv(x: jax.Array, groups: int) -> jax.Array:
    """(B, S, Hkv, D) -> (B, S, Hkv*groups, D), matching HF repeat_kv order."""
    if groups == 1:
        return x
    b, s, h, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, groups, d))
    return x.reshape(b, s, h * groups, d)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_len: jax.Array,
    *,
    kv_groups: int = 1,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Single-position attention against a padded KV cache.

    q:        (B, 1, H, D)
    k_cache:  (B, Smax, Hkv, D) — only the first `cache_len` entries are valid.
    cache_len:(B,) int32 — number of valid cache positions (including current).
    bias:     optional additive logits bias broadcastable to (B, H, 1, Smax)
              (ALiBi), reshaped internally to the GQA-grouped layout.
    """
    dtype = q.dtype
    b, _, h, d = q.shape
    scale = scale if scale is not None else d**-0.5
    hkv = k_cache.shape[2]
    # GQA-native: group query heads against their kv head without
    # materializing the repeated cache (saves kv_groups x cache traffic on
    # the latency-critical decode step)
    qg = q.reshape(b, q.shape[1], hkv, kv_groups, d)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_cache,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        smax = k_cache.shape[1]
        logits = logits + bias.astype(jnp.float32).reshape(
            b, hkv, kv_groups, 1, smax)
    valid = jnp.arange(k_cache.shape[1])[None, None, None, None, :] < (
        cache_len[:, None, None, None, None])
    logits = jnp.where(valid, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(dtype), v_cache)
    return out.reshape(b, q.shape[1], h, d)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    q_valid_len: Optional[jax.Array] = None,
    kv_valid_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    force_reference: bool = False,
    differentiable: bool = False,
    static_valid_len: Optional[int] = None,
) -> jax.Array:
    """Flash attention for LM prefill. Dispatches on TPU to:

      - our forward-only Pallas kernel (ops/pallas_flash.py) for inference —
        measured ~1.5x faster than both XLA fused attention and the in-tree
        kernel at the flagship prefill shape (1x14x9472x64);
      - the in-tree differentiable flash kernel
        (jax.experimental.pallas.ops.tpu.flash_attention) when gradients are
        needed (training), with segment ids expressing the padding mask.

    q, k, v: (B, S, H, D) — same H (repeat GQA beforehand) and same S.
    *_valid_len: (B,) int32 — padding masks for bucketed sequence lengths.
    static_valid_len: compile-time valid length when the caller knows it at
    trace time (the single-clip pipeline's spliced length is a static
    shape); the inference Pallas kernel folds its per-grid-step
    valid-length scalar work to constants (~11% at the flagship prefill
    shape, tools_prefill_flash_ab2.py). Ignored on the training and
    reference paths (the traced kv_valid_len already covers them).
    """
    on_tpu = jax.default_backend() == "tpu"
    d_ok = q.shape[-1] in (64, 128, 256)
    if on_tpu and not force_reference and d_ok and q.shape[1] >= 128:
        if not differentiable:
            from memory_augmented_vlm_tpu.ops.pallas_flash import pallas_flash_attention

            return pallas_flash_attention(
                q, k, v, causal=causal, kv_valid_len=kv_valid_len, scale=scale,
                static_valid_len=static_valid_len,
            )
        if TRAIN_ATTENTION_IMPL == "ours":
            from memory_augmented_vlm_tpu.ops.pallas_flash_bwd import (
                flash_attention_train,
            )

            return flash_attention_train(
                q, k, v, causal=causal, kv_valid_len=kv_valid_len, scale=scale,
            )
        if TRAIN_ATTENTION_IMPL != "xla" and q.shape[1] % 128 == 0:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention as jax_flash_attention,
            )

            seg = None
            if kv_valid_len is not None:
                ids = (
                    jnp.arange(q.shape[1])[None, :] < kv_valid_len[:, None]
                ).astype(jnp.int32)
                seg = SegmentIds(q=ids, kv=ids)
            d = q.shape[-1]
            out = jax_flash_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                segment_ids=seg,
                causal=causal,
                sm_scale=scale if scale is not None else d**-0.5,
            )
            return out.transpose(0, 2, 1, 3)
    mask = None
    if kv_valid_len is not None:
        mask = jnp.arange(k.shape[1])[None, None, None, :] < kv_valid_len[:, None, None, None]
    return mha_attention(q, k, v, mask=mask, causal=causal, scale=scale)
