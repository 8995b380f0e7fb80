"""Model registry — name -> (family, config mapper), the reference's
`AVAILABLE_MODELS` table (llava/model/__init__.py:1-16).

All decoder-only families run through the same functional decoder
(models/qwen2.py) parameterized by LMConfig; the registry captures which HF
config fields / weight layouts each family uses:

  llava_qwen     : Qwen2 (qkv bias, optional tied embeddings)   — ACTIVE
  llava_llama    : Llama  (no attention bias)
  llava_mistral  : Mistral (no attention bias, sliding window unused <=32k)
  llava_mixtral  : Mixtral sparse MoE (ACTIVE in the reference registry,
                   model/__init__.py:7; llava_mixtral.py:1-143)
  llava_gemma    : Gemma (gelu MLP + embed scaling)
  llava_qwen_moe : Qwen2MoE sparse MoE + gated shared expert (the wrapper
                   exists at llava_qwen_moe.py:1-149 but is commented out
                   of the reference registry, __init__.py:8; supported
                   here as a config-flag variant)
  llava_mpt      : MPT (ALiBi, bias-free LayerNorm, ungated gelu MLP)
"""

from __future__ import annotations

from memory_augmented_vlm_tpu.config import LMConfig


def lm_config_for(model_type: str, raw: dict) -> LMConfig:
    """Map an HF config dict to LMConfig per family."""
    n_heads = raw.get("num_attention_heads", 14)
    base = dict(
        vocab_size=raw.get("vocab_size", 151936),
        hidden_size=raw.get("hidden_size", 896),
        intermediate_size=raw.get("intermediate_size", 4864),
        num_hidden_layers=raw.get("num_hidden_layers", 24),
        num_attention_heads=n_heads,
        num_key_value_heads=raw.get("num_key_value_heads", n_heads),
        head_dim=raw.get("head_dim") or raw.get("hidden_size", 896) // n_heads,
        max_position_embeddings=raw.get("max_position_embeddings", 32768),
        rope_theta=raw.get("rope_theta", 1000000.0),
        rms_norm_eps=raw.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=raw.get("tie_word_embeddings", False),
    )
    family = model_type.replace("llava_", "")
    if family in ("qwen", "qwen2", "llava_qwen"):
        return LMConfig(attention_bias=True, **base)
    if family == "mixtral":
        return LMConfig(
            attention_bias=False,
            num_local_experts=raw.get("num_local_experts", 8),
            num_experts_per_tok=raw.get("num_experts_per_tok", 2),
            **base,
        )
    if family in ("qwen_moe", "qwen2_moe"):
        # disabled (commented out) in the reference registry
        # (llava/model/__init__.py:8) but the wrapper exists
        # (llava_qwen_moe.py) — supported here as a config-flag variant of
        # the shared MoE decoder. HF Qwen2MoeConfig names:
        # num_experts / moe_intermediate_size / shared_expert_intermediate_size
        if raw.get("mlp_only_layers") or raw.get("decoder_sparse_step", 1) != 1:
            raise NotImplementedError(
                "qwen_moe with dense interleaved layers "
                "(mlp_only_layers / decoder_sparse_step != 1) is not supported")
        base["intermediate_size"] = raw.get("moe_intermediate_size", 1408)
        return LMConfig(
            attention_bias=True,
            num_local_experts=raw.get("num_experts", 60),
            num_experts_per_tok=raw.get("num_experts_per_tok", 4),
            moe_norm_topk_prob=raw.get("norm_topk_prob", False),
            moe_shared_expert_size=raw.get(
                "shared_expert_intermediate_size", 5632),
            **base,
        )
    if family in ("llama", "mistral"):
        return LMConfig(attention_bias=False, **base)
    if family == "gemma":
        act = (raw.get("hidden_activation") or raw.get("hidden_act")
               or "gelu_pytorch_tanh")
        return LMConfig(attention_bias=False, mlp_act=act, norm_plus_one=True,
                        scale_embeddings=True, **base)
    if family == "mpt":
        # HF MptConfig names: d_model/n_heads/n_layers/expansion_ratio
        d = raw.get("d_model", raw.get("hidden_size", 896))
        n = raw.get("n_heads", raw.get("num_attention_heads", 14))
        attn_cfg = raw.get("attn_config") or {}
        if isinstance(attn_cfg, dict):
            bias_max = attn_cfg.get("alibi_bias_max", 8)
        else:
            bias_max = getattr(attn_cfg, "alibi_bias_max", 8)
        return LMConfig(
            vocab_size=raw.get("vocab_size", 50368),
            hidden_size=d,
            intermediate_size=raw.get("expansion_ratio", 4) * d,
            num_hidden_layers=raw.get("n_layers", raw.get("num_hidden_layers", 24)),
            num_attention_heads=n,
            num_key_value_heads=n,
            head_dim=d // n,
            max_position_embeddings=raw.get("max_seq_len", 2048),
            rms_norm_eps=raw.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=True,
            attention_bias=False,
            position_embedding="alibi",
            norm_type="layernorm",
            mlp_gated=False,
            mlp_act="gelu",
            alibi_bias_max=bias_max,
        )
    raise ValueError(f"unsupported model family: {model_type}")


AVAILABLE_MODELS = {
    "llava_qwen": "active",
    "llava_llama": "supported",
    "llava_mistral": "supported",
    "llava_mixtral": "supported",
    "llava_qwen_moe": "supported",
    "llava_gemma": "supported",
    "llava_mpt": "supported",
}
