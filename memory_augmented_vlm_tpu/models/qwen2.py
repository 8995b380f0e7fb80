"""Qwen2-family decoder LM, TPU-native.

Re-implements the capability of the reference's stock HF `Qwen2ForCausalLM`
(llava/model/language_model/llava_qwen.py:31 keeps the HF import) as pure
functions over a parameter pytree:

  - layers are *stacked* along a leading axis and iterated with `lax.scan`
    (one compiled layer body instead of L inlined copies — fast XLA compiles,
    natural remat boundary, and the layout FSDP/TP shardings key off);
  - the KV cache is an explicit carried array `(L, B, Smax, Hkv, Dh)` with a
    static max length, so the whole generate loop jits with fixed shapes;
  - prefill uses `flash_attention` (Pallas on TPU), decode uses the fused
    single-query path.

Numerics match HF Qwen2 (fp32 softmax + RMSNorm accumulation, rotate_half
RoPE, GQA repeat order) — pinned by tests/test_qwen2_parity.py against a tiny
HF checkpoint.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig
from memory_augmented_vlm_tpu.ops.attention import (
    decode_attention,
    flash_attention,
    mha_attention,
    repeat_kv,
)
from memory_augmented_vlm_tpu.ops.norms import rms_norm
from memory_augmented_vlm_tpu.ops.rope import apply_rope, compute_rope_freqs, rope_cos_sin


class KVCache(NamedTuple):
    """Static-shape KV cache carried through the decode loop.

    When `k`/`v` are int8 (serving `kv_int8` mode, halving the cache HBM
    footprint and decode read traffic), each (layer, row, position, head)
    Dh-vector carries a per-row fp32 scale in `k_scale`/`v_scale`;
    dequantization fuses into the decode attention einsums."""

    k: jax.Array  # (L, B, Smax, Hkv, Dh)
    v: jax.Array  # (L, B, Smax, Hkv, Dh)
    length: jax.Array  # (B,) int32 — number of valid positions per sequence
    k_scale: Optional[jax.Array] = None  # (L, B, Smax, Hkv) fp32, int8 mode
    v_scale: Optional[jax.Array] = None

    @staticmethod
    def zeros(cfg: LMConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
        scales = None
        if dtype == jnp.int8:
            scales = jnp.zeros(shape[:-1], jnp.float32)
        return KVCache(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((batch,), jnp.int32),
            k_scale=scales,
            v_scale=scales,
        )


def quantize_kv_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization over the last (head_dim) axis:
    (..., D) -> ((..., D) int8, (...) fp32 scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_cache(cache: KVCache) -> KVCache:
    """Convert a bf16 prefill cache to the int8 `kv_int8` form (per-row
    symmetric int8 + fp32 scales) so decode streams half the cache bytes —
    at a 9.7k-token video context the bf16 cache read (~238 MB/step at 0.5B)
    rivals the weight stream. `decode_step` handles the int8 cache natively
    (dequant fuses into the attention einsums)."""
    if cache.k.dtype == jnp.int8:
        return cache
    kq, ks = quantize_kv_rows(cache.k)
    vq, vs = quantize_kv_rows(cache.v)
    return KVCache(k=kq, v=vq, length=cache.length, k_scale=ks, v_scale=vs)


def _maybe_bias(kernel, bias_shape, cfg, dtype):
    out = {"kernel": kernel}
    if cfg.attention_bias:
        out["bias"] = jnp.zeros(bias_shape, dtype)
    return out


def init_params(cfg: LMConfig, key: jax.Array, dtype=jnp.float32):
    """Random init (for tests / from-scratch training). HF-style scales."""
    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    NH, NKV, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    ks = jax.random.split(key, 10)

    def dense(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    params = {
        "embed_tokens": dense(ks[0], (cfg.vocab_size, H)),
        "layers": {
            "input_layernorm": jnp.ones((L, H), dtype),
            "post_attention_layernorm": jnp.ones((L, H), dtype),
            "q_proj": _maybe_bias(dense(ks[1], (L, H, NH * D)), (L, NH * D), cfg, dtype),
            "k_proj": _maybe_bias(dense(ks[2], (L, H, NKV * D)), (L, NKV * D), cfg, dtype),
            "v_proj": _maybe_bias(dense(ks[3], (L, H, NKV * D)), (L, NKV * D), cfg, dtype),
            "o_proj": {"kernel": dense(ks[4], (L, NH * D, H))},
        },
        "norm": jnp.ones((H,), dtype),
    }
    if cfg.num_local_experts > 0:
        E = cfg.num_local_experts
        params["layers"]["moe_gate"] = {"kernel": dense(ks[5], (L, H, E))}
        params["layers"]["experts"] = {
            "gate_proj": {"kernel": dense(ks[6], (L, E, H, I))},
            "up_proj": {"kernel": dense(ks[7], (L, E, H, I))},
            "down_proj": {"kernel": dense(ks[9], (L, E, I, H))},
        }
        if cfg.moe_shared_expert_size > 0:
            SI = cfg.moe_shared_expert_size
            sk = jax.random.split(ks[9], 4)
            params["layers"]["shared_expert"] = {
                "gate_proj": {"kernel": dense(sk[0], (L, H, SI))},
                "up_proj": {"kernel": dense(sk[1], (L, H, SI))},
                "down_proj": {"kernel": dense(sk[2], (L, SI, H))},
            }
            params["layers"]["shared_expert_gate"] = {
                "kernel": dense(sk[3], (L, H, 1))}
    else:
        if cfg.mlp_gated:
            params["layers"]["gate_proj"] = {"kernel": dense(ks[5], (L, H, I))}
        params["layers"]["up_proj"] = {"kernel": dense(ks[6], (L, H, I))}
        params["layers"]["down_proj"] = {"kernel": dense(ks[7], (L, I, H))}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(ks[8], (H, cfg.vocab_size))
    return params


def embed_tokens(params, input_ids: jax.Array, cfg: Optional[LMConfig] = None) -> jax.Array:
    out = jnp.take(params["embed_tokens"], input_ids, axis=0)
    if cfg is not None and cfg.scale_embeddings:
        out = out * jnp.asarray(cfg.hidden_size**0.5, out.dtype)
    return out


def unembed(params, cfg: LMConfig, hidden: jax.Array) -> jax.Array:
    """Final norm already applied by the caller; project to vocab in fp32.

    The tied path contracts directly against the (V, H) embedding table —
    never materialize `embed_tokens.T` (a 260 MB transpose per decode step
    at 0.5B scale; measured 28.7 ms/step before this fix).

    When `prequantize_int8(..., include_unembed=True)` installed an int8
    copy of the unembedding (`unembed_int8` (V, H) + per-vocab-row
    `unembed_scale`), the logits matmul runs activation-row-quant int8 x
    int8 -> int32 on the int8 MXU and streams half the bytes — the single
    largest HBM read of a decode step (272 MB bf16 at 0.5B scale)."""
    if "unembed_int8" in params:
        from memory_augmented_vlm_tpu.ops.pallas_int8 import quantize_rows

        xq, sx = quantize_rows(hidden)
        acc = jax.lax.dot_general(
            xq, params["unembed_int8"], (((xq.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * sx * params["unembed_scale"]
    if cfg.tie_word_embeddings:
        return jnp.einsum("...h,vh->...v", hidden, params["embed_tokens"],
                          preferred_element_type=jnp.float32)
    return jnp.einsum("...h,hv->...v", hidden, params["lm_head"],
                      preferred_element_type=jnp.float32)


def _act(x, act: str):
    if act == "silu":
        return jax.nn.silu(x)
    if act in ("gelu", "gelu_pytorch_tanh"):
        return jax.nn.gelu(x, approximate=act == "gelu_pytorch_tanh")
    raise ValueError(act)


def _proj(p, x):
    """Dense projection; prequantized int8/int4 params take the int8 MXU
    path (lm_int8 / load_8bit / load_4bit serving modes)."""
    if "kernel_int8" in p:
        from memory_augmented_vlm_tpu.ops.quant import int8_linear

        return int8_linear(p, x)
    if "kernel_int4" in p:
        from memory_augmented_vlm_tpu.ops.quant import int4_linear

        return int4_linear(p, x)
    return jnp.einsum("...h,hd->...d", x, p["kernel"])


def prequantize_int8(params, cfg: Optional[LMConfig] = None, *,
                     bits: int = 8, include_unembed: bool = False):
    """Static-scale int8/int4 LM weights (the load_8bit / load_4bit LM half;
    bitsandbytes equivalents). Quantizes the stacked per-layer dense
    kernels; embeddings / norms stay high-precision (the logits matmul is
    the quality-sensitive tail). MoE experts stay dense. bits=4 packs two
    nibbles per byte — parameter HBM halves again.

    include_unembed=True additionally installs a per-vocab-row int8 copy of
    the unembedding (`unembed_int8` (V, H) + `unembed_scale` (V,) fp32) that
    `unembed` prefers — the 272 MB/step bf16 logits-weight read is the
    single biggest decode HBM stream at 0.5B scale. Tied models keep the
    bf16 `embed_tokens` for token lookups (the int8 copy adds V*H bytes);
    untied models drop the dense `lm_head` (the int8 copy replaces it).
    Numerics qualification: tests/test_quant.py greedy-agreement +
    logit-drift corpus test; PERFORMANCE.md round 4."""
    from memory_augmented_vlm_tpu.ops.quant import (
        prequantize_kernel,
        prequantize_kernel_int4,
    )

    layers = params["layers"]
    new_layers = dict(layers)
    for name in ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj"):
        if name not in layers:
            continue
        if bits == 4:
            wq, scale = prequantize_kernel_int4(layers[name]["kernel"])
            entry = {"kernel_int4": wq, "scale": scale}
        else:
            wq, scale = prequantize_kernel(layers[name]["kernel"])
            entry = {"kernel_int8": wq, "scale": scale}
        if "bias" in layers[name]:
            entry["bias"] = layers[name]["bias"]
        new_layers[name] = entry
    out = dict(params)
    out["layers"] = new_layers
    if include_unembed:
        import jax.numpy as jnp

        # per-vocab-row symmetric int8 over the hidden axis of the (V, H)
        # unembedding table: output-channel scales keep each vocab row's
        # logit scale exact, so quantization error is purely in-row
        table = (params["embed_tokens"] if "lm_head" not in params
                 else params["lm_head"].T)
        tf = table.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(tf), axis=1), 1e-12) / 127.0
        out["unembed_int8"] = jnp.clip(
            jnp.round(tf / scale[:, None]), -127, 127).astype(jnp.int8)
        out["unembed_scale"] = scale
        out.pop("lm_head", None)
    return out


def _dense_mlp(lp, x, act: str = "silu", gated: bool = True):
    up = _proj(lp["up_proj"], x)
    if gated:
        hidden = _act(_proj(lp["gate_proj"], x), act) * up
    else:
        # MPT MptMLP: up -> act -> down, no gate
        hidden = _act(up, act)
    return _proj(lp["down_proj"], hidden)


def _moe_mlp(lp, x, cfg: "LMConfig"):
    """Sparse-MoE block (HF MixtralSparseMoeBlock / Qwen2MoeSparseMoeBlock
    semantics): fp32 softmax router, top-k selection, SwiGLU experts
    (w1=gate, w3=up, w2=down). Mixtral renormalizes the top-k weights;
    Qwen2MoE keeps the raw softmax probabilities (norm_topk_prob=False) and
    adds a sigmoid-gated shared expert (llava_qwen_moe.py via HF
    Qwen2MoeForCausalLM).

    TPU-native dispatch: experts are computed densely over a stacked
    (E, H, I) kernel and combined with the zero-masked routing weights —
    one einsum per projection instead of per-expert gathers (no dynamic
    shapes, and sharding the E axis over the mesh gives expert parallelism
    with a single psum on the weighted sum).
    """
    e, k = cfg.num_local_experts, cfg.num_experts_per_tok
    logits = jnp.einsum("bsh,he->bse", x, lp["moe_gate"]["kernel"])
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(probs, k)
    if cfg.moe_norm_topk_prob:
        top_w = top_w / top_w.sum(axis=-1, keepdims=True)
    # scatter the top-k weights back to a dense (B, S, E) map
    weights = jnp.sum(
        jax.nn.one_hot(top_i, e, dtype=jnp.float32) * top_w[..., None], axis=-2
    ).astype(x.dtype)
    gate = jnp.einsum("bsh,ehi->bsei", x, lp["experts"]["gate_proj"]["kernel"])
    up = jnp.einsum("bsh,ehi->bsei", x, lp["experts"]["up_proj"]["kernel"])
    act = jax.nn.silu(gate) * up
    out = jnp.einsum("bsei,eih->bseh", act, lp["experts"]["down_proj"]["kernel"])
    out = jnp.einsum("bseh,bse->bsh", out, weights)
    if cfg.moe_shared_expert_size > 0:
        se = lp["shared_expert"]
        shared = _proj(se["down_proj"],
                       jax.nn.silu(_proj(se["gate_proj"], x))
                       * _proj(se["up_proj"], x))
        sgate = jax.nn.sigmoid(
            jnp.einsum("bsh,ho->bso", x.astype(jnp.float32),
                       lp["shared_expert_gate"]["kernel"].astype(jnp.float32)))
        out = out + sgate.astype(x.dtype) * shared
    return out


def _layer_mlp(lp, x, act: str = "silu", cfg: Optional["LMConfig"] = None):
    if cfg is not None and cfg.num_local_experts > 0:
        return _moe_mlp(lp, x, cfg)
    return _dense_mlp(lp, x, act, gated=cfg.mlp_gated if cfg else True)


# The fused int8 SwiGLU half-block measured a WASH at the LM prefill shape
# (tools_swiglu_ab.py, round 5: 407.5 ms e2e off vs 409.2-410.1 across
# block_m 128-1024 with raised VMEM) — the 9.7k-row LM chain is far less
# intermediate-bound than the tower's 46.6k-row MLP, so XLA's fusion holds.
# The kernel stays available for A/B runs and non-flagship shapes.
fused_swiglu_enabled = False


def _mlp_half(lp, hidden, cfg: "LMConfig"):
    """Post-attention norm + MLP + residual for one layer.

    With `fused_swiglu_enabled`, the int8 serving path at prefill shapes
    runs the whole half-block as ONE Pallas pass
    (ops/pallas_mlp_int8.fused_swiglu_block_int8) — RMSNorm, row quant,
    gate/up int8 matmuls, silu-gate, requant, down projection and the
    residual add, with the (M, I) intermediates VMEM-resident. Measured a
    wash at the flagship shape (see module comment), so the default is the
    composed XLA math."""
    b, s, h = hidden.shape
    if (fused_swiglu_enabled
            and cfg.num_local_experts == 0 and cfg.mlp_gated
            and cfg.mlp_act == "silu" and cfg.norm_type != "layernorm"
            and "gate_proj" in lp and "kernel_int8" in lp["gate_proj"]
            and "bias" not in lp["gate_proj"]
            and jax.default_backend() == "tpu" and b * s >= 1024):
        from memory_augmented_vlm_tpu.ops.pallas_mlp_int8 import (
            fused_swiglu_block_int8,
        )

        w = lp["post_attention_layernorm"]
        if cfg.norm_plus_one:
            w = 1.0 + w
        return fused_swiglu_block_int8(
            hidden.reshape(b * s, h), w,
            lp["gate_proj"]["kernel_int8"], lp["gate_proj"]["scale"],
            lp["up_proj"]["kernel_int8"], lp["up_proj"]["scale"],
            lp["down_proj"]["kernel_int8"], lp["down_proj"]["scale"],
            eps=cfg.rms_norm_eps,
        ).reshape(b, s, h)
    x = _norm(hidden, lp["post_attention_layernorm"], cfg)
    return hidden + _layer_mlp(lp, x, cfg.mlp_act, cfg)


def _norm(x, w, cfg: LMConfig):
    if cfg.norm_type == "layernorm":
        # MPT: bias-free LayerNorm (no_bias=True in the HF config)
        from memory_augmented_vlm_tpu.ops.norms import layer_norm

        return layer_norm(x, w, jnp.zeros_like(w), cfg.rms_norm_eps)
    return rms_norm(x, (1.0 + w) if cfg.norm_plus_one else w, cfg.rms_norm_eps)


def alibi_slopes(cfg: LMConfig) -> jax.Array:
    """HF `build_mpt_alibi_tensor` head slopes (alibi_bias_max=8).

    The per-row ALiBi offset is softmax-shift-invariant, so attention uses
    the row-free form bias[h, j] = slopes[h] * j (equivalent probabilities
    to HF's (j - S + 1) form)."""
    import math

    n = cfg.num_attention_heads
    next_pow2 = 2 ** math.ceil(math.log2(n))
    base = jnp.arange(1, next_pow2 + 1, dtype=jnp.float32)
    base = base * (cfg.alibi_bias_max / next_pow2)
    slopes = 1.0 / jnp.power(2.0, base)
    if next_pow2 != n:
        slopes = jnp.concatenate([slopes[1::2], slopes[0::2]])[:n]
    return slopes


def _qkv(lp, cfg: LMConfig, x):
    b, s, _ = x.shape
    NH, NKV, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    # _proj applies the bias when the param dict carries one (attention_bias)
    q = _proj(lp["q_proj"], x)
    k = _proj(lp["k_proj"], x)
    v = _proj(lp["v_proj"], x)
    if cfg.attention_bias and "kernel" in lp["q_proj"]:
        # quantized entries (kernel_int8 / kernel_int4) already added the
        # bias inside int8_linear/int4_linear
        q = q + lp["q_proj"]["bias"]
        k = k + lp["k_proj"]["bias"]
        v = v + lp["v_proj"]["bias"]
    return (
        q.reshape(b, s, NH, D),
        k.reshape(b, s, NKV, D),
        v.reshape(b, s, NKV, D),
    )


def forward(
    params,
    cfg: LMConfig,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    valid_len: Optional[jax.Array] = None,
    *,
    cache_max_len: Optional[int] = None,
    remat: bool = False,
    force_reference_attention: bool = False,
    differentiable_attention: bool = False,
    memory_prompt: Optional[jax.Array] = None,
    memory_prompt_layers: int = 10,
    need_cache: bool = True,
    static_valid_len: Optional[int] = None,
) -> Tuple[jax.Array, KVCache]:
    """Full-sequence forward (prefill / training).

    inputs_embeds: (B, S, H) — already spliced with visual embeddings.
    positions:     (B, S) int32 RoPE positions.
    valid_len:     (B,) int32 — right-padded valid length (None = all valid).
    static_valid_len: compile-time valid length when the caller knows it at
                   trace time (single-clip pipelines: the spliced length is
                   a static shape) — folds the prefill flash kernel's
                   per-grid-step valid-length scalar work to constants
                   (ops/attention.py). Must equal every valid_len entry.
    cache_max_len: if set, the returned KVCache is padded to this length so
                   decode can continue in place.
    memory_prompt: optional (T, H) deep-prompt memory tokens exposed as extra
                   attention keys/values in the LAST `memory_prompt_layers`
                   layers — the dormant "memory as per-layer prompt" design
                   of the vendored Qwen2 (modeling_qwen2.py:743-794,
                   :1062-1115; prepend-then-trim there is equivalent to
                   extra non-causal K/V here since the prompt's own query
                   rows are discarded).
    need_cache:    pass False on loss-only paths (training); this both skips
                   the cache assembly and enables the pipeline-parallel layer
                   scan under a `pp>1` mesh (ops/pipeline.py), which does not
                   collect per-layer K/V. The cache slot of the return value
                   is None in that case.

    Returns (hidden_states (B, S, H) after final norm, KVCache).
    """
    b, s, _ = inputs_embeds.shape
    use_alibi = cfg.position_embedding == "alibi"
    if use_alibi:
        # row-free ALiBi bias slopes[h] * j (see alibi_slopes); shape (1,H,1,S)
        alibi_bias = (alibi_slopes(cfg)[None, :, None, None]
                      * jnp.arange(s, dtype=jnp.float32)[None, None, None, :])
        cos = sin = None
    else:
        inv_freq = compute_rope_freqs(
            cfg.head_dim, cfg.rope_theta,
            scaling_type=cfg.rope_scaling_type,
            scaling_factor=cfg.rope_scaling_factor,
            max_position_embeddings=cfg.max_position_embeddings,
            # dynamic-NTK basis must agree between prefill and decode: use the
            # full cache bound when decode will continue from this prefill
            seq_len=cache_max_len or s,
        )
        cos, sin = rope_cos_sin(positions, inv_freq)

    if valid_len is None:
        valid_len = jnp.full((b,), s, jnp.int32)

    if memory_prompt is not None and use_alibi:
        raise NotImplementedError("memory_prompt requires RoPE positions")
    if memory_prompt is not None:
        # Per-layer chunking (modeling_qwen2.py:1062-1078): the (T, H) prompt
        # splits into one chunk per injected layer; memory keys take positions
        # 0..t_chunk-1 and the sequence's positions shift by +t_chunk on
        # injected layers; the chunk is prepended RAW (after input_layernorm
        # already ran on the hidden states), so k/v projections see un-normed
        # memory tokens.
        n_layers = params["layers"]["input_layernorm"].shape[0]
        n_inj = min(memory_prompt_layers, n_layers)
        if n_inj <= 0:
            memory_prompt = None  # zero injection layers == plain forward
    if memory_prompt is not None:
        if memory_prompt.shape[0] % n_inj != 0:
            raise ValueError(
                f"memory_prompt length {memory_prompt.shape[0]} must divide "
                f"into {n_inj} per-layer chunks")
        t_chunk = memory_prompt.shape[0] // n_inj
        chunks = memory_prompt.reshape(n_inj, t_chunk, -1)
        zero_pad = jnp.zeros((n_layers - n_inj, t_chunk, chunks.shape[-1]),
                             chunks.dtype)
        layer_chunks = jnp.concatenate([zero_pad, chunks], axis=0)
        inject_flags = jnp.arange(n_layers) >= (n_layers - n_inj)
        mem_cos, mem_sin = rope_cos_sin(jnp.arange(t_chunk)[None], inv_freq)
        cos_shift, sin_shift = rope_cos_sin(positions + t_chunk, inv_freq)

    from memory_augmented_vlm_tpu.ops.pipeline import (
        pipeline_scan,
        pp_viable,
    )
    from memory_augmented_vlm_tpu.ops.ring_attention import sp_size

    nlayers = params["layers"]["input_layernorm"].shape[0]
    pp_m = cfg.pp_microbatches or None
    if (not need_cache and memory_prompt is None and not use_alibi
            and sp_size() == 1 and pp_viable(b, nlayers, pp_m)):
        # pipeline-parallel layer scan (ops/pipeline.py): stages hold L/P
        # layers each, microbatches stream via ppermute. Loss-only (no
        # per-layer K/V collection); rope tables and valid lengths travel
        # with the microbatch payload.
        def pp_body(payload, lp):
            hid, pcos, psin, pvalid = payload
            residual = hid
            x = _norm(hid, lp["input_layernorm"], cfg)
            q, k, v = _qkv(lp, cfg, x)
            q = apply_rope(q, pcos, psin)
            k = apply_rope(k, pcos, psin)
            attn = flash_attention(
                q, repeat_kv(k, cfg.kv_groups), repeat_kv(v, cfg.kv_groups),
                causal=True, kv_valid_len=pvalid,
                force_reference=force_reference_attention,
                differentiable=differentiable_attention,
            )
            hid = residual + _proj(lp["o_proj"], attn.reshape(*hid.shape))
            hid = _mlp_half(lp, hid, cfg)
            return (hid, pcos, psin, pvalid), None

        if remat:
            pp_body = jax.checkpoint(pp_body, prevent_cse=False)
        out_payload = pipeline_scan(
            pp_body, (inputs_embeds, cos, sin, valid_len), params["layers"],
            num_microbatches=pp_m)
        hidden = _norm(out_payload[0], params["norm"], cfg)
        return hidden, None

    def layer_body(hidden, xs):
        if memory_prompt is None:
            lp = xs
        else:
            lp, inject, mem_chunk = xs
        residual = hidden
        x = _norm(hidden, lp["input_layernorm"], cfg)
        if memory_prompt is None:
            q, k, v = _qkv(lp, cfg, x)
            if use_alibi:
                kq = repeat_kv(k, cfg.kv_groups)
                vq = repeat_kv(v, cfg.kv_groups)
                kv_ok = jnp.arange(s)[None, None, None, :] < \
                    valid_len[:, None, None, None]
                attn = mha_attention(q, kq, vq, mask=kv_ok, causal=True,
                                     bias=alibi_bias)
            else:
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
                kq = repeat_kv(k, cfg.kv_groups)
                vq = repeat_kv(v, cfg.kv_groups)
                from memory_augmented_vlm_tpu.ops.ring_attention import (
                    ring_attention,
                    sp_size,
                )

                if sp_size() > 1:
                    # sequence-parallel prefill: the ambient mesh carries an
                    # `sp` axis, so attention runs as a ppermute ring over
                    # sequence shards (ops/ring_attention.py) — differentiable,
                    # so it serves the train step too
                    attn = ring_attention(q, kq, vq, kv_valid_len=valid_len,
                                          causal=True)
                else:
                    attn = flash_attention(
                        q, kq, vq,
                        causal=True,
                        kv_valid_len=valid_len,
                        force_reference=force_reference_attention,
                        differentiable=differentiable_attention,
                        static_valid_len=static_valid_len,
                    )
        else:
            # memory chunk as extra (non-causal) keys/values, masked out on
            # layers without injection; sequence RoPE shifted by +t_chunk on
            # injected layers per the reference position ids
            lcos = jnp.where(inject, cos_shift, cos)
            lsin = jnp.where(inject, sin_shift, sin)
            q, k, v = _qkv(lp, cfg, x)
            q = apply_rope(q, lcos, lsin)
            k = apply_rope(k, lcos, lsin)
            mq, mk, mv = _qkv(lp, cfg, jnp.broadcast_to(
                mem_chunk[None], (b,) + mem_chunk.shape))
            mk = apply_rope(mk, mem_cos, mem_sin)
            t_m = mk.shape[1]
            kq = repeat_kv(jnp.concatenate([mk, k], axis=1), cfg.kv_groups)
            vq = repeat_kv(jnp.concatenate([mv, v], axis=1), cfg.kv_groups)
            sq, sk = s, t_m + s
            qpos = jnp.arange(sq)[:, None]
            kpos = jnp.arange(sk)[None, :]
            causal_part = (kpos - t_m) <= qpos
            mem_part = (kpos < t_m) & inject
            kv_ok = (kpos - t_m) < valid_len[:, None, None, None]
            mask = ((mem_part | ((kpos >= t_m) & causal_part))[None, None] & kv_ok)
            attn = mha_attention(q, kq, vq, mask=mask)
        attn = attn.reshape(b, s, -1)
        attn = _proj(lp["o_proj"], attn)
        hidden = residual + attn
        hidden = _mlp_half(lp, hidden, cfg)
        return hidden, (k, v)

    if remat:
        layer_body = jax.checkpoint(layer_body, prevent_cse=False)

    scan_xs = (params["layers"] if memory_prompt is None
               else (params["layers"], inject_flags, layer_chunks))
    hidden, (ks, vs) = jax.lax.scan(layer_body, inputs_embeds, scan_xs)
    hidden = _norm(hidden, params["norm"], cfg)

    max_len = cache_max_len or s
    if max_len < s:
        raise ValueError(f"cache_max_len {max_len} < sequence length {s}")
    pad = max_len - s
    if pad:
        pad_spec = ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))
        ks = jnp.pad(ks, pad_spec)
        vs = jnp.pad(vs, pad_spec)
    cache = KVCache(k=ks, v=vs, length=valid_len)
    return hidden, cache


def forward_chunk(
    params,
    cfg: LMConfig,
    token_embeds: jax.Array,
    cache: KVCache,
    start: jax.Array,
    *,
    row=0,
    rope_seq_len: Optional[int] = None,
) -> Tuple[jax.Array, KVCache]:
    """C-token step against a cache prefix: rows [0, start) of cache row
    `row` are the valid context; the chunk attends to that prefix plus its
    own causal triangle, and its K/V are written at rows [start, start+C)
    of that cache row.

    The verification step of speculative decoding (vlm.generate_speculative)
    and the chunk step of the batch engine's chunked prefill / prefix
    caching (`row` = slot of the pooled (L, B, Smax, ...) cache; the input
    chunk is (1, C, H) when targeting one slot). Returns (hidden (1, C, H)
    after final norm, cache with length[row] = start + C — callers roll
    `length` back on partial acceptance; rows beyond the accepted point
    are garbage that the next chunk/decode write overwrites).

    `rope_seq_len` pins the dynamic-NTK frequency basis; it must match
    whatever bound the surrounding prefill/decode used (defaults to the
    cache buffer length). int8 caches quantize on write and fuse dequant
    into the attention einsums, as in decode_step."""
    if cfg.position_embedding == "alibi":
        raise NotImplementedError("forward_chunk requires RoPE positions")
    b, c, _ = token_embeds.shape
    smax = cache.k.shape[2]
    inv_freq = compute_rope_freqs(
        cfg.head_dim, cfg.rope_theta,
        scaling_type=cfg.rope_scaling_type,
        scaling_factor=cfg.rope_scaling_factor,
        max_position_embeddings=cfg.max_position_embeddings,
        seq_len=rope_seq_len or smax,
    )
    qpos = start + jnp.arange(c)
    cos, sin = rope_cos_sin(jnp.broadcast_to(qpos[None], (b, c)), inv_freq)
    mask = (jnp.arange(smax)[None, :] <= qpos[:, None])[None, None]
    quant = cache.k.dtype == jnp.int8
    act_dtype = token_embeds.dtype
    lp_all = params["layers"]

    def layer_body(l, carry):
        if quant:
            hidden, kc, vc, ksc, vsc = carry
        else:
            hidden, kc, vc = carry
        lp = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
            lp_all)
        residual = hidden
        x = _norm(hidden, lp["input_layernorm"], cfg)
        q, k, v = _qkv(lp, cfg, x)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if quant:
            k_w, k_s = quantize_kv_rows(k)
            v_w, v_s = quantize_kv_rows(v)
            ksc = jax.lax.dynamic_update_slice(ksc, k_s[None],
                                               (l, row, start, 0))
            vsc = jax.lax.dynamic_update_slice(vsc, v_s[None],
                                               (l, row, start, 0))
        else:
            k_w, v_w = k.astype(kc.dtype), v.astype(vc.dtype)
        kc = jax.lax.dynamic_update_slice(kc, k_w[None], (l, row, start, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v_w[None], (l, row, start, 0, 0))

        def row_of(a):
            return jax.lax.dynamic_index_in_dim(
                jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
                row, 0, keepdims=True)            # (1, Smax, Hkv, ...)

        layer_k, layer_v = row_of(kc), row_of(vc)
        if quant:
            k_sl, v_sl = row_of(ksc), row_of(vsc)
            layer_k = (layer_k.astype(jnp.float32)
                       * k_sl[..., None]).astype(act_dtype)
            layer_v = (layer_v.astype(jnp.float32)
                       * v_sl[..., None]).astype(act_dtype)
        kq = repeat_kv(layer_k, cfg.kv_groups)
        vq = repeat_kv(layer_v, cfg.kv_groups)
        attn = mha_attention(q, kq, vq, mask=mask)
        hidden = residual + _proj(lp["o_proj"], attn.reshape(b, c, -1))
        hidden = _mlp_half(lp, hidden, cfg)
        if quant:
            return hidden, kc, vc, ksc, vsc
        return hidden, kc, vc

    if quant:
        hidden, kc, vc, ksc, vsc = jax.lax.fori_loop(
            0, cfg.num_hidden_layers, layer_body,
            (token_embeds, cache.k, cache.v, cache.k_scale, cache.v_scale))
    else:
        hidden, kc, vc = jax.lax.fori_loop(
            0, cfg.num_hidden_layers, layer_body,
            (token_embeds, cache.k, cache.v))
        ksc, vsc = cache.k_scale, cache.v_scale
    hidden = _norm(hidden, params["norm"], cfg)
    length = cache.length.at[row].set(
        jnp.asarray(start + c, jnp.int32))
    return hidden, KVCache(k=kc, v=vc, length=length,
                           k_scale=ksc, v_scale=vsc)


def decode_chunk_batched(
    params,
    cfg: LMConfig,
    token_embeds: jax.Array,
    cache: KVCache,
    starts: jax.Array,
    *,
    rope_seq_len: Optional[int] = None,
) -> Tuple[jax.Array, KVCache]:
    """Batched K-token step with PER-ROW start offsets — the verification
    step of batched speculative decoding (serve/batch_engine.py).

    token_embeds: (B, K, H); starts: (B,) int32 — row b's chunk occupies
    cache positions [starts[b], starts[b]+K) and attends to that row's
    prefix plus its own causal triangle. Rows whose start is >= the cache
    bound write nothing (scatter drops out-of-bounds updates) — the
    engine parks inactive slots there. Returns (hidden (B, K, H), cache);
    `length` is NOT updated (callers own per-row acceptance/rollback)."""
    if cfg.position_embedding == "alibi":
        raise NotImplementedError("decode_chunk_batched requires RoPE")
    b, kk, _ = token_embeds.shape
    smax = cache.k.shape[2]
    inv_freq = compute_rope_freqs(
        cfg.head_dim, cfg.rope_theta,
        scaling_type=cfg.rope_scaling_type,
        scaling_factor=cfg.rope_scaling_factor,
        max_position_embeddings=cfg.max_position_embeddings,
        seq_len=rope_seq_len or smax,
    )
    qpos = starts[:, None] + jnp.arange(kk)[None, :]          # (B, K)
    cos, sin = rope_cos_sin(qpos, inv_freq)
    mask = (jnp.arange(smax)[None, None, None, :]
            <= qpos[:, None, :, None])                        # (B,1,K,Smax)
    quant = cache.k.dtype == jnp.int8
    act_dtype = token_embeds.dtype
    lp_all = params["layers"]
    bidx = jnp.arange(b)[:, None]

    def layer_body(l, carry):
        if quant:
            hidden, kc, vc, ksc, vsc = carry
        else:
            hidden, kc, vc = carry
        lp = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
            lp_all)
        residual = hidden
        x = _norm(hidden, lp["input_layernorm"], cfg)
        q, k, v = _qkv(lp, cfg, x)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if quant:
            k_w, k_s = quantize_kv_rows(k)
            v_w, v_s = quantize_kv_rows(v)
            ksc = ksc.at[l, bidx, qpos].set(k_s, mode="drop")
            vsc = vsc.at[l, bidx, qpos].set(v_s, mode="drop")
        else:
            k_w, v_w = k.astype(kc.dtype), v.astype(vc.dtype)
        kc = kc.at[l, bidx, qpos].set(k_w, mode="drop")
        vc = vc.at[l, bidx, qpos].set(v_w, mode="drop")
        layer_k = jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False)
        layer_v = jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False)
        if quant:
            k_sl = jax.lax.dynamic_index_in_dim(ksc, l, 0, keepdims=False)
            v_sl = jax.lax.dynamic_index_in_dim(vsc, l, 0, keepdims=False)
            layer_k = (layer_k.astype(jnp.float32)
                       * k_sl[..., None]).astype(act_dtype)
            layer_v = (layer_v.astype(jnp.float32)
                       * v_sl[..., None]).astype(act_dtype)
        kq = repeat_kv(layer_k, cfg.kv_groups)
        vq = repeat_kv(layer_v, cfg.kv_groups)
        attn = mha_attention(q, kq, vq, mask=mask)
        hidden = residual + _proj(lp["o_proj"], attn.reshape(b, kk, -1))
        residual = hidden
        x = _norm(hidden, lp["post_attention_layernorm"], cfg)
        hidden = residual + _layer_mlp(lp, x, cfg.mlp_act, cfg)
        if quant:
            return hidden, kc, vc, ksc, vsc
        return hidden, kc, vc

    if quant:
        hidden, kc, vc, ksc, vsc = jax.lax.fori_loop(
            0, cfg.num_hidden_layers, layer_body,
            (token_embeds, cache.k, cache.v, cache.k_scale, cache.v_scale))
    else:
        hidden, kc, vc = jax.lax.fori_loop(
            0, cfg.num_hidden_layers, layer_body,
            (token_embeds, cache.k, cache.v))
        ksc, vsc = cache.k_scale, cache.v_scale
    return hidden, KVCache(k=kc, v=vc, length=cache.length,
                           k_scale=ksc, v_scale=vsc)


def decode_step(
    params,
    cfg: LMConfig,
    token_embeds: jax.Array,
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """One decode step with in-place (donated) cache update.

    token_embeds: (B, 1, H). cache.length counts existing valid positions; the
    new token is written at index cache.length and the returned cache has
    length+1.
    """
    b = token_embeds.shape[0]
    use_alibi = cfg.position_embedding == "alibi"
    pos = cache.length  # (B,) — position of the new token
    if use_alibi:
        smax = cache.k.shape[2]
        alibi_bias = (alibi_slopes(cfg)[None, :, None, None]
                      * jnp.arange(smax, dtype=jnp.float32)[None, None, None, :])
        alibi_bias = jnp.broadcast_to(
            alibi_bias, (b, cfg.num_attention_heads, 1, smax))
        cos = sin = None
    else:
        inv_freq = compute_rope_freqs(
            cfg.head_dim, cfg.rope_theta,
            scaling_type=cfg.rope_scaling_type,
            scaling_factor=cfg.rope_scaling_factor,
            max_position_embeddings=cfg.max_position_embeddings,
            seq_len=cache.k.shape[2],  # static cache bound (prefill used seq<=this)
        )
        cos, sin = rope_cos_sin(pos[:, None], inv_freq)

    lp_all = params["layers"]
    quant = cache.k.dtype == jnp.int8
    act_dtype = token_embeds.dtype

    def layer_body(l, carry):
        # fori_loop + dynamic_update_slice keeps the (L, B, Smax, Hkv, Dh)
        # cache update in place; the previous scan-over-layers stacked fresh
        # (k, v) ys, which re-wrote the whole cache every token (measured
        # 3.31 -> 2.75 ms/token at 0.5B / 9.6k context)
        if quant:
            hidden, kc, vc, ksc, vsc = carry
        else:
            hidden, kc, vc = carry
        lp = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
            lp_all)
        residual = hidden
        x = _norm(hidden, lp["input_layernorm"], cfg)
        q, k, v = _qkv(lp, cfg, x)
        if not use_alibi:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        if quant:
            k, k_s = quantize_kv_rows(k)  # (B, 1, Hkv, D), (B, 1, Hkv)
            v, v_s = quantize_kv_rows(v)
        if b == 1:
            kc = jax.lax.dynamic_update_slice(kc, k[None], (l, 0, pos[0], 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, v[None], (l, 0, pos[0], 0, 0))
            if quant:
                ksc = jax.lax.dynamic_update_slice(
                    ksc, k_s[None], (l, 0, pos[0], 0))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, v_s[None], (l, 0, pos[0], 0))
        else:
            batch_idx = jnp.arange(b)
            kc = kc.at[l, batch_idx, pos].set(k[:, 0])
            vc = vc.at[l, batch_idx, pos].set(v[:, 0])
            if quant:
                ksc = ksc.at[l, batch_idx, pos].set(k_s[:, 0])
                vsc = vsc.at[l, batch_idx, pos].set(v_s[:, 0])
        layer_k = jax.lax.dynamic_index_in_dim(kc, l, 0, keepdims=False)
        layer_v = jax.lax.dynamic_index_in_dim(vc, l, 0, keepdims=False)
        if quant:
            # dequant fuses into the attention einsums (XLA folds the
            # convert+scale into the dot operands); HBM still reads int8
            k_sl = jax.lax.dynamic_index_in_dim(ksc, l, 0, keepdims=False)
            v_sl = jax.lax.dynamic_index_in_dim(vsc, l, 0, keepdims=False)
            layer_k = (layer_k.astype(jnp.float32)
                       * k_sl[..., None]).astype(act_dtype)
            layer_v = (layer_v.astype(jnp.float32)
                       * v_sl[..., None]).astype(act_dtype)
        attn = decode_attention(q, layer_k, layer_v, pos + 1,
                                kv_groups=cfg.kv_groups,
                                bias=alibi_bias if use_alibi else None)
        attn = attn.reshape(b, 1, -1)
        attn = _proj(lp["o_proj"], attn)
        hidden = residual + attn
        residual = hidden
        x = _norm(hidden, lp["post_attention_layernorm"], cfg)
        hidden = residual + _layer_mlp(lp, x, cfg.mlp_act, cfg)
        if quant:
            return hidden, kc, vc, ksc, vsc
        return hidden, kc, vc

    if quant:
        hidden, new_k, new_v, new_ks, new_vs = jax.lax.fori_loop(
            0, cfg.num_hidden_layers, layer_body,
            (token_embeds, cache.k, cache.v, cache.k_scale, cache.v_scale))
    else:
        hidden, new_k, new_v = jax.lax.fori_loop(
            0, cfg.num_hidden_layers, layer_body,
            (token_embeds, cache.k, cache.v))
        new_ks = new_vs = None
    hidden = _norm(hidden, params["norm"], cfg)
    return hidden, KVCache(k=new_k, v=new_v, length=cache.length + 1,
                           k_scale=new_ks, v_scale=new_vs)
