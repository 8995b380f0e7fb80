"""Model loading — the public `load_pretrained_model` API
(reference: llava/model/builder.py:27-305).

Returns the same 4-tuple `(tokenizer, model, image_processor, context_len)`
the lmms-eval `llava_onevision` adapter and all serve/demo entry points
consume. Reads HF-format LlavaQwen checkpoints (config.json +
*.safetensors with `model.`-prefixed LM keys and sibling multimodal keys)
straight into the JAX pytree via checkpoint/hf_import.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import (
    LMConfig,
    MemoryConfig,
    PipelineConfig,
    VisionConfig,
    VLMConfig,
)
from memory_augmented_vlm_tpu.checkpoint import hf_import
from memory_augmented_vlm_tpu.data.preprocessing import SigLipImageProcessor
from memory_augmented_vlm_tpu.eval.model import MavlmForCausalLM


def infer_vision_config(sd: dict, tower_name: str = "siglip"):
    """Infer the tower family + geometry from checkpoint tensors and the
    `mm_vision_tower` name (the reference dispatches on the name alone,
    multimodal_encoder/builder.py:13-41; tensors pin the geometry for tiny
    test checkpoints). Returns the family-appropriate config dataclass."""
    import re as _re

    if "imagebind" in tower_name.lower():
        from memory_augmented_vlm_tpu.models.imagebind import ImageBindConfig

        return ImageBindConfig()
    is_clip = any(k.endswith("embeddings.class_embedding") for k in sd)
    is_mlcd = any(k.endswith("class_pos_emb") for k in sd) or "mlcd" in tower_name.lower()

    pe_key = next((k for k in sd if k.endswith("patch_embedding.weight")), None)
    if pe_key is None:
        return VisionConfig()
    w = sd[pe_key]  # (out, in, kh, kw) torch conv layout
    hidden, _, patch, _ = w.shape
    layer_idx = [
        int(m.group(1))
        for k in sd
        if (m := _re.search(r"encoder\.layers\.(\d+)\.", k))
    ]
    layers = 1 + max(layer_idx)
    fc1_key = next(k for k in sd if k.endswith("layers.0.mlp.fc1.weight"))
    inter = sd[fc1_key].shape[0]
    # true head counts for the published tower families (head count is not
    # derivable from weight shapes; hidden//64 covers standard ViTs, with
    # the exceptions pinned: SigLIP-SO400M 1152/16 (head_dim 72) and
    # ViT-H/bigG 1280/1664 at 16 heads)
    heads = {768: 12, 1024: 16, 1152: 16, 1280: 16, 1408: 16, 1664: 16}.get(
        hidden, max(hidden // 64, 1))

    if is_mlcd:
        from memory_augmented_vlm_tpu.models.mlcd import MLCDVisionConfig

        # MLCD has no positional table to read the grid from; RoPE-2D works
        # at any grid, so keep the family-default 336px unless the name says
        # otherwise. The reference keeps the FULL tower and taps
        # hidden_states[-2] (mlcd_encoder.py:63), so the stored layer count
        # IS num_hidden_layers (select_layer drops the last at runtime).
        return MLCDVisionConfig(
            hidden_size=hidden, intermediate_size=inter,
            num_hidden_layers=layers, num_attention_heads=heads,
            image_size=448 if "448" in tower_name else 336, patch_size=patch,
        )
    if is_clip:
        from memory_augmented_vlm_tpu.models.clip import CLIPVisionConfig

        pos_key = next(k for k in sd if k.endswith("embeddings.position_embedding.weight"))
        num_positions = sd[pos_key].shape[0]           # patches + CLS
        side = int(round((num_positions - 1) ** 0.5))
        # reference CLIP towers are stored FULL (only SigLIP deletes its
        # last layer, siglip_encoder.py:571); hidden_states[-2] is taken at
        # runtime via select_layer, so stored layers == num_hidden_layers
        return CLIPVisionConfig(
            hidden_size=hidden, intermediate_size=inter,
            num_hidden_layers=layers, num_attention_heads=heads,
            image_size=side * patch, patch_size=patch,
        )
    pos_key = next(k for k in sd if k.endswith("embeddings.position_embedding.weight"))
    num_patches = sd[pos_key].shape[0]
    side = int(round(num_patches ** 0.5))
    return VisionConfig(
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers + 1,  # checkpoint holds the trimmed tower
        num_attention_heads=heads,
        image_size=side * patch,
        patch_size=patch,
    )


def infer_memory_config(sd: dict, lm_hidden: int) -> MemoryConfig:
    import re as _re

    init_key = next((k for k in sd if k.endswith("recurrent_memory_transformer.initial_memory")), None)
    if init_key is None:
        return MemoryConfig(hidden_size=lm_hidden)
    nm, pp, _ = sd[init_key].shape
    depth_idx = [
        int(m.group(1))
        for k in sd
        if (m := _re.search(r"recurrent_memory_transformer\.layers\.(\d+)\.", k))
    ]
    depth = 1 + max(depth_idx) if depth_idx else 2
    return MemoryConfig(hidden_size=lm_hidden, num_memory_tokens=nm,
                        patch_size=pp, depth=depth)


def _hashable_pinpoints(pp):
    """config.json stores `image_grid_pinpoints` as a list of [w, h] pairs or
    a spec string; PipelineConfig needs a hashable value (jit static)."""
    if isinstance(pp, (list, tuple)):
        return tuple(tuple(int(v) for v in p) for p in pp)
    return pp


def config_from_json(raw: dict) -> VLMConfig:
    """Map a Llava-family HF config.json onto our typed config.

    `model_type` dispatches through the registry (llava/model/__init__.py
    AVAILABLE_MODELS), which owns per-family semantics such as Llama's
    attention_bias=False — hand-building LMConfig here would silently apply
    Qwen2 bias defaults to every family.
    """
    from memory_augmented_vlm_tpu.models.registry import lm_config_for

    lm = lm_config_for(raw.get("model_type", "llava_qwen"), raw)
    pipeline = PipelineConfig(
        mm_vision_tower=raw.get("mm_vision_tower",
                                "google/siglip-so400m-patch14-384"),
        s2=raw.get("s2", False),
        mm_projector_type=raw.get("mm_projector_type", "mlp2x_gelu"),
        mm_patch_merge_type=raw.get("mm_patch_merge_type", "spatial_unpad"),
        mm_newline_position=raw.get("mm_newline_position", "one_token"),
        mm_spatial_pool_mode=raw.get("mm_spatial_pool_mode", "bilinear"),
        image_aspect_ratio=raw.get("image_aspect_ratio", "anyres_max_9"),
        image_grid_pinpoints=_hashable_pinpoints(
            raw.get("image_grid_pinpoints", "(1x1),...,(6x6)")),
        dropout_frames=raw.get("dropout_frames", False),
        add_time_instruction=raw.get("add_time_instruction", False),
        tokenizer_model_max_length=raw.get("tokenizer_model_max_length", 32768),
        frames_upbound=raw.get("frames_upbound", 300),
        tower_int8=raw.get("tower_int8", False),
    )
    return VLMConfig(lm=lm, pipeline=pipeline,
                     vision=VisionConfig(), memory=MemoryConfig(hidden_size=lm.hidden_size))


def config_from_json_and_weights(raw: dict, sd: dict) -> VLMConfig:
    base = config_from_json(raw)
    import dataclasses as _dc

    return _dc.replace(
        base,
        vision=infer_vision_config(sd, base.pipeline.mm_vision_tower),
        memory=infer_memory_config(sd, base.lm.hidden_size),
    )


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    model_name: Optional[str] = None,
    torch_dtype: str = "bfloat16",
    attn_implementation: str = "pallas_flash",  # accepted for signature parity
    device_map: str = "auto",
    load_8bit: bool = False,
    load_4bit: bool = False,
    overwrite_config: Optional[dict] = None,
    device_preprocess: bool = False,
    **kwargs,
) -> Tuple[object, MavlmForCausalLM, SigLipImageProcessor, int]:
    """Load an HF-format checkpoint directory into the TPU-native model.

    Mirrors builder.py:27-305's contract: `overwrite_config` entries override
    config.json fields (this is how lmms-eval passes `max_frames_num` etc.);
    returns context_len resolved from max_sequence_length /
    max_position_embeddings / tokenizer_model_max_length / 2048.
    """
    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    if overwrite_config:
        raw.update(overwrite_config)
    if load_8bit or load_4bit:
        # both halves quantize like bitsandbytes (tower + LM); load_4bit
        # stores the LM kernels as packed int4 (half the int8 footprint)
        raw["tower_int8"] = True
        raw["lm_int8"] = True
        if load_4bit:
            raw["lm_int4"] = True
    sd = hf_import.load_safetensors_dir(model_path)
    cfg = config_from_json_and_weights(raw, sd)
    dtype = jnp.bfloat16 if torch_dtype in ("bfloat16", "auto") else jnp.float32
    if dtype == jnp.float32 and cfg.lm.dtype != "float32":
        import dataclasses as _dc

        # activation dtype follows the requested load dtype (fp32 loads are
        # the parity/testing path; bf16 is the TPU production path)
        cfg = _dc.replace(cfg, lm=_dc.replace(cfg.lm, dtype="float32"))

    lm_sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")
             and not k.startswith(("model.vision_tower", "model.mm_projector",
                                   "model.recurrent_memory_transformer",
                                   "model.memory_fuser", "model.token_type_embedding",
                                   "model.positional_encoding", "model.image_newline",
                                   "model.vision_resampler"))}
    if "lm_head.weight" in sd:
        lm_sd["lm_head.weight"] = sd["lm_head.weight"]
    from memory_augmented_vlm_tpu.models.encoders import tower_for

    tower_sd = {k[len("model."):]: v for k, v in sd.items()
                if k.startswith("model.vision_tower")}
    if cfg.lm.num_local_experts > 0:
        # Qwen2MoE uses `mlp.experts` key layout + shared expert; Mixtral
        # uses `block_sparse_moe`
        if cfg.lm.moe_shared_expert_size > 0 or any(
                ".mlp.experts." in k for k in lm_sd):
            lm_convert = hf_import.convert_qwen2_moe
        else:
            lm_convert = hf_import.convert_mixtral
    elif "mpt" in str(raw.get("model_type", "")).lower() or any(
            k.startswith(("transformer.wte", "model.transformer.wte"))
            for k in sd):
        lm_convert = hf_import.convert_mpt
    else:
        lm_convert = hf_import.convert_qwen2
    tower = tower_for(cfg)
    if tower_sd:
        tower_params = tower.convert_hf(tower_sd)
    else:
        # reference checkpoints may omit the tower (delay_load pulls it from
        # the hub at builder.py:289-294); offline we initialize fresh
        import jax as _jax

        tower_params = tower.init_params(_jax.random.key(0), dtype)
    if any("mm_projector" in k for k in sd):
        projector_params = hf_import.convert_projector(
            sd, cfg.pipeline.mm_projector_type)
    else:
        from memory_augmented_vlm_tpu.models import projector as _projector

        import jax as _jax

        projector_params = _projector.init_params(
            cfg.pipeline.mm_projector_type, tower.hidden_size,
            cfg.lm.hidden_size, _jax.random.key(1))
    params = {
        "language_model": lm_convert(lm_sd, cfg.lm),
        "vision_tower": tower_params,
        "mm_projector": projector_params,
    }
    params.update(_memory_and_pe(sd, cfg, dtype))
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    if raw.get("tower_int8") and cfg.pipeline.mm_vision_tower.startswith(
            ("google/siglip", "siglip")):
        # static-scale prequantized int8 tower weights (load_8bit): quantize
        # once at load so inference hits the int8 MXU path, not AQT
        from memory_augmented_vlm_tpu.models import siglip as _siglip

        params["vision_tower"] = _siglip.prequantize_int8(params["vision_tower"])
    if raw.get("lm_int8"):
        from memory_augmented_vlm_tpu.models import qwen2 as _qwen2

        params["language_model"] = _qwen2.prequantize_int8(
            params["language_model"], cfg.lm,
            bits=4 if raw.get("lm_int4") else 8)

    tokenizer = None
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_path)
    except Exception:
        pass

    image_processor = SigLipImageProcessor(
        size=(cfg.vision.image_size, cfg.vision.image_size))
    model = MavlmForCausalLM(params, cfg, raw_config=raw, dtype=dtype,
                             device_preprocess=device_preprocess)

    context_len = (
        raw.get("max_sequence_length")
        or raw.get("max_position_embeddings")
        or raw.get("tokenizer_model_max_length")
        or 2048
    )
    return tokenizer, model, image_processor, context_len


def _memory_and_pe(sd, cfg: VLMConfig, dtype):
    from memory_augmented_vlm_tpu.models.position_encoding import init_params as pe_init

    mem_keys = {k: v for k, v in sd.items() if any(
        t in k for t in ("recurrent_memory_transformer", "memory_fuser",
                         "token_type_embedding", "image_newline"))}
    out = {}
    if mem_keys:
        out["memory"] = hf_import.convert_memory_modules(mem_keys, cfg.memory.depth)
    else:
        # checkpoints without memory weights (plain OneVision): init fresh
        from memory_augmented_vlm_tpu.models import vlm as vlm_mod

        full = vlm_mod.init_params(cfg, jax.random.key(0), dtype)
        out["memory"] = full["memory"]
    if "image_newline" not in out["memory"]:
        newline = sd.get("model.image_newline")
        if newline is None:
            newline = np.random.default_rng(0).standard_normal(
                cfg.lm.hidden_size).astype(np.float32) / np.sqrt(cfg.lm.hidden_size)
        out["memory"]["image_newline"] = newline
    out["positional_encoding"] = pe_init(
        cfg.memory.max_temporal_frames, cfg.lm.hidden_size, cfg.memory.learnable_pe,
        key=jax.random.key(0),
    )
    return out
