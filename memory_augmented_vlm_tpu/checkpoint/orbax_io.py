"""Orbax checkpointing + HF safetensors export.

Replaces the reference's HF Trainer / DeepSpeed checkpoint machinery
(train.py:212-324 `safe_save_model_for_hf_trainer`, auto-resume at
train.py:1816-1818): orbax for native sharded save/resume of the full
TrainState, and a safetensors exporter so checkpoints interoperate with the
reference's HF format (same key names the importer reads).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import numpy as np
import jax


_ASYNC_CKPTR = None  # one process-wide checkpointer so async saves serialize


def save_checkpoint(ckpt_dir: str, state: Any, step: int, keep: int = 2,
                    block: bool = True) -> str:
    """Save a TrainState (or any pytree) under ckpt_dir/checkpoint-<step>.

    block=False returns as soon as the on-device state is snapshotted and
    lets orbax write to disk in the background (training overlaps the
    serialization — call `wait_for_checkpoints()` before exiting). A new
    save always waits for the previous async one first."""
    global _ASYNC_CKPTR
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"checkpoint-{step}")
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    _ASYNC_CKPTR.wait_until_finished()
    _ASYNC_CKPTR.save(path, state)
    if block:
        _ASYNC_CKPTR.wait_until_finished()
    # gc only removes OLDER checkpoint dirs; the in-flight newest survives
    _gc_checkpoints(ckpt_dir, keep)
    return path


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save has fully landed on disk."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Find the newest checkpoint-<step> dir (auto-resume, train.py:1816)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        m = re.match(r"^checkpoint-(\d+)$", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure/shardings of `target`."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def _gc_checkpoints(ckpt_dir: str, keep: int) -> None:
    """save_total_limit equivalent (finetune_short.sh)."""
    import shutil

    entries = []
    for name in os.listdir(ckpt_dir):
        m = re.match(r"^checkpoint-(\d+)$", name)
        if m:
            entries.append((int(m.group(1)), name))
    for _, name in sorted(entries)[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


# ---------------------------------------------------------------------------
# HF-format export (reference key naming, so either stack can consume it)
# ---------------------------------------------------------------------------

def export_hf_safetensors(params: Any, cfg, out_dir: str) -> str:
    """Write params to `model.safetensors` with reference key names."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    flat = {}

    def _kernel(entry):
        """Full-precision view of a (possibly prequantized) kernel entry."""
        if "kernel" in entry:
            return entry["kernel"]
        from memory_augmented_vlm_tpu.ops.quant import unpack_int4

        if "kernel_int8" in entry:
            w = entry["kernel_int8"].astype(np.float32)
        else:
            w = np.asarray(unpack_int4(entry["kernel_int4"]), np.float32)
        return w * np.expand_dims(np.asarray(entry["scale"], np.float32), -2)

    lm = jax.tree.map(np.asarray, params["language_model"])
    flat["model.embed_tokens.weight"] = lm["embed_tokens"]
    flat["model.norm.weight"] = lm["norm"]
    if "lm_head" in lm:
        flat["lm_head.weight"] = lm["lm_head"].T
    L = lm["layers"]["input_layernorm"].shape[0]
    for i in range(L):
        p = f"model.layers.{i}."
        lyr = lm["layers"]
        flat[p + "input_layernorm.weight"] = lyr["input_layernorm"][i]
        flat[p + "post_attention_layernorm.weight"] = lyr["post_attention_layernorm"][i]
        for name in ("q_proj", "k_proj", "v_proj"):
            flat[p + f"self_attn.{name}.weight"] = _kernel(lyr[name])[i].T
            if "bias" in lyr[name]:  # bias-free families (Llama/Mixtral/MPT)
                flat[p + f"self_attn.{name}.bias"] = lyr[name]["bias"][i]
        flat[p + "self_attn.o_proj.weight"] = _kernel(lyr["o_proj"])[i].T
        for name in ("gate_proj", "up_proj", "down_proj"):
            if name in lyr:  # MPT has no gate; MoE families carry experts
                flat[p + f"mlp.{name}.weight"] = _kernel(lyr[name])[i].T

    vt = jax.tree.map(np.asarray, params["vision_tower"])
    vp = "model.vision_tower.vision_tower.vision_model."
    flat[vp + "embeddings.patch_embedding.weight"] = (
        vt["patch_embedding"]["kernel"].transpose(3, 2, 0, 1)
    )
    flat[vp + "embeddings.patch_embedding.bias"] = vt["patch_embedding"]["bias"]
    flat[vp + "embeddings.position_embedding.weight"] = vt["position_embedding"]
    flat[vp + "post_layernorm.weight"] = vt["post_layernorm"]["weight"]
    flat[vp + "post_layernorm.bias"] = vt["post_layernorm"]["bias"]
    VL = vt["layers"]["layer_norm1"]["weight"].shape[0]
    for i in range(VL):
        p = vp + f"encoder.layers.{i}."
        lyr = vt["layers"]
        for ln in ("layer_norm1", "layer_norm2"):
            flat[p + f"{ln}.weight"] = lyr[ln]["weight"][i]
            flat[p + f"{ln}.bias"] = lyr[ln]["bias"][i]
        for name, tgt in (("q_proj", "self_attn.q_proj"), ("k_proj", "self_attn.k_proj"),
                          ("v_proj", "self_attn.v_proj"), ("out_proj", "self_attn.out_proj"),
                          ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            flat[p + f"{tgt}.weight"] = _kernel(lyr[name])[i].T
            flat[p + f"{tgt}.bias"] = lyr[name]["bias"][i]

    proj = jax.tree.map(np.asarray, params["mm_projector"])
    for i, lp in enumerate(proj["layers"]):
        flat[f"model.mm_projector.{i * 2}.weight"] = lp["kernel"].T
        flat[f"model.mm_projector.{i * 2}.bias"] = lp["bias"]

    mem = jax.tree.map(np.asarray, params["memory"])
    rmt = mem["recurrent_memory_transformer"]
    mp = "model.recurrent_memory_transformer."
    flat[mp + "initial_memory"] = rmt["initial_memory"]
    flat[mp + "memory_pos_embed"] = rmt["memory_pos_embed"]

    def attn_out(prefix, a, i=None):
        def g(x):
            return x[i] if i is not None else x

        for name in ("q_proj", "k_proj", "v_proj"):
            flat[prefix + f"{name}.weight"] = g(a[name]["kernel"]).T
            flat[prefix + f"{name}.bias"] = g(a[name]["bias"])
        flat[prefix + "residual.dense.weight"] = g(a["residual"]["dense"]["kernel"]).T
        flat[prefix + "residual.dense.bias"] = g(a["residual"]["dense"]["bias"])
        flat[prefix + "residual.layernorm.weight"] = g(a["residual"]["layernorm"]["weight"])
        flat[prefix + "residual.layernorm.bias"] = g(a["residual"]["layernorm"]["bias"])

    attn_out(mp + "memory_update_attention.", rmt["memory_update_attention"])
    depth = rmt["layers"]["mlp"]["kernel"].shape[0]
    for i in range(depth):
        lp = f"{mp}layers.{i}."
        attn_out(lp + "memory_segment_fusion_attention.", rmt["layers"]["attention"], i)
        flat[lp + "mlp.0.weight"] = rmt["layers"]["mlp"]["kernel"][i].T
        flat[lp + "mlp.0.bias"] = rmt["layers"]["mlp"]["bias"][i]
        flat[lp + "residual.dense.weight"] = rmt["layers"]["residual"]["dense"]["kernel"][i].T
        flat[lp + "residual.dense.bias"] = rmt["layers"]["residual"]["dense"]["bias"][i]
        flat[lp + "residual.layernorm.weight"] = rmt["layers"]["residual"]["layernorm"]["weight"][i]
        flat[lp + "residual.layernorm.bias"] = rmt["layers"]["residual"]["layernorm"]["bias"][i]
    flat["model.memory_fuser.0.weight"] = mem["memory_fuser"]["fc1"]["kernel"].T
    flat["model.memory_fuser.0.bias"] = mem["memory_fuser"]["fc1"]["bias"]
    flat["model.memory_fuser.2.weight"] = mem["memory_fuser"]["fc2"]["kernel"].T
    flat["model.memory_fuser.2.bias"] = mem["memory_fuser"]["fc2"]["bias"]
    flat["model.token_type_embedding.weight"] = mem["token_type_embedding"]
    if "image_newline" in mem:
        flat["model.image_newline"] = mem["image_newline"]

    out_path = os.path.join(out_dir, "model.safetensors")
    save_file({k: np.ascontiguousarray(v.astype(np.float32)) for k, v in flat.items()},
              out_path)
    # minimal config.json so load_pretrained_model round-trips
    import json

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "llava_qwen",
            "vocab_size": cfg.lm.vocab_size,
            "hidden_size": cfg.lm.hidden_size,
            "intermediate_size": cfg.lm.intermediate_size,
            "num_hidden_layers": cfg.lm.num_hidden_layers,
            "num_attention_heads": cfg.lm.num_attention_heads,
            "num_key_value_heads": cfg.lm.num_key_value_heads,
            "max_position_embeddings": cfg.lm.max_position_embeddings,
            "rope_theta": cfg.lm.rope_theta,
            "tie_word_embeddings": cfg.lm.tie_word_embeddings,
            "mm_projector_type": cfg.pipeline.mm_projector_type,
            "mm_patch_merge_type": cfg.pipeline.mm_patch_merge_type,
            "mm_newline_position": cfg.pipeline.mm_newline_position,
            "mm_spatial_pool_mode": cfg.pipeline.mm_spatial_pool_mode,
            "image_aspect_ratio": cfg.pipeline.image_aspect_ratio,
            "image_grid_pinpoints": (
                [list(p) for p in cfg.pipeline.image_grid_pinpoints]
                if isinstance(cfg.pipeline.image_grid_pinpoints, tuple)
                else cfg.pipeline.image_grid_pinpoints),
            "tokenizer_model_max_length": cfg.pipeline.tokenizer_model_max_length,
        }, f, indent=2)
    return out_path
