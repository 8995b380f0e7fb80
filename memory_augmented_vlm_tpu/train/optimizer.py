"""Optimizer construction: AdamW with per-module LR groups and selective
trainability — the optax replacement for DeepSpeed fused AdamW + the
reference's custom param groups (llava/train/llava_trainer.py:360-471) and
`mm_tunable_parts` unfreezing (llava/train/train.py:1694-1728).

Semantics replicated:
  - LR groups by module-name substring: `mm_projector`, `vision_tower`,
    `recurrent_memory_transformer` (memory_transformer_lr),
    `token_type_embedding` + `memory_fuser` (memory_key_value_lr);
    first match in that order wins, default LR otherwise.
  - weight decay applies only to non-norm, non-bias, non-embedding-ish
    parameters (HF `decay_parameters` = everything except LayerNorm params
    and biases).
  - `mm_tunable_parts` freezing: `mm_language_model` -> language_model,
    `larimar_model` -> token_type_embedding + memory_fuser (+image_newline),
    `recurrent_model` -> recurrent_memory_transformer,
    `mm_mlp_adapter` -> mm_projector, `mm_vision_tower` -> vision_tower.
    Frozen leaves get zero updates (optax.set_to_zero) so they stay exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-6          # LM lr (finetune_short.sh)
    mm_projector_lr: Optional[float] = None
    mm_vision_tower_lr: Optional[float] = 2e-6
    memory_transformer_lr: Optional[float] = 1e-5
    memory_key_value_lr: Optional[float] = 1e-5
    weight_decay: float = 0.0
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    schedule: str = "cosine"             # cosine | constant (HF lr_scheduler_type)
    mm_tunable_parts: str = "larimar_model,recurrent_model,mm_language_model"
    grad_accum_steps: int = 1            # gradient_accumulation_steps


from memory_augmented_vlm_tpu.utils.tree import path_str as _path_str


TUNABLE_PART_PREFIXES = {
    "mm_language_model": ("language_model",),
    "larimar_model": ("memory.token_type_embedding", "memory.memory_fuser",
                      "memory.image_newline"),
    "recurrent_model": ("memory.recurrent_memory_transformer",),
    "mm_mlp_adapter": ("mm_projector",),
    "mm_vision_tower": ("vision_tower",),
    "mm_resampler": ("vision_resampler",),
    # PPO value head (trl AutoModelForCausalLMWithValueHead trains it jointly)
    "value_head": ("value_head",),
}


def trainable_mask(params: Any, mm_tunable_parts: str) -> Any:
    """Bool pytree: True = trainable, per mm_tunable_parts (train.py:1694-1728)."""
    parts = [p.strip() for p in mm_tunable_parts.split(",") if p.strip()]
    prefixes: list = []
    for part in parts:
        if part not in TUNABLE_PART_PREFIXES:
            raise ValueError(f"unknown mm_tunable_part: {part}")
        prefixes.extend(TUNABLE_PART_PREFIXES[part])

    def label(path, leaf):
        s = _path_str(path)
        return any(s.startswith(p) for p in prefixes)

    return jax.tree_util.tree_map_with_path(label, params)


def lr_group_labels(params: Any, cfg: OptimizerConfig) -> Any:
    """String-label pytree mirroring the reference's substring lr_mapper."""
    mapper = []
    if cfg.mm_projector_lr is not None:
        mapper.append(("mm_projector", "projector"))
    if cfg.mm_vision_tower_lr is not None:
        mapper.append(("vision_tower", "tower"))
    if cfg.memory_transformer_lr is not None:
        mapper.append(("recurrent_memory_transformer", "memory_transformer"))
    if cfg.memory_key_value_lr is not None:
        mapper.append(("token_type_embedding", "memory_kv"))
        mapper.append(("memory_fuser", "memory_kv"))

    def label(path, leaf):
        s = _path_str(path)
        for keyword, name in mapper:
            if keyword in s:
                return name
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def decay_mask(params: Any) -> Any:
    """weight-decay mask: exclude biases and norm/embedding-style params."""

    def is_decay(path, leaf):
        s = _path_str(path)
        if s.endswith("bias"):
            return False
        if "layernorm" in s.lower() or "norm" in s.split(".")[-1].lower():
            return False
        if leaf.ndim < 2:
            return False
        return True

    return jax.tree_util.tree_map_with_path(is_decay, params)


def make_schedule(cfg: OptimizerConfig, base_lr: float) -> optax.Schedule:
    warmup = max(int(cfg.warmup_ratio * cfg.total_steps), 0)
    if cfg.schedule == "constant":
        if warmup == 0:
            return optax.constant_schedule(base_lr)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup),
             optax.constant_schedule(base_lr)], [warmup])
    return optax.warmup_cosine_decay_schedule(
        0.0, base_lr, warmup, max(cfg.total_steps, warmup + 1), end_value=0.0
    )


def build_optimizer(params: Any, cfg: OptimizerConfig) -> optax.GradientTransformation:
    """AdamW with LR groups + trainability masking + global-norm clipping."""
    group_lrs = {
        "default": cfg.learning_rate,
        "projector": cfg.mm_projector_lr or cfg.learning_rate,
        "tower": cfg.mm_vision_tower_lr or cfg.learning_rate,
        "memory_transformer": cfg.memory_transformer_lr or cfg.learning_rate,
        "memory_kv": cfg.memory_key_value_lr or cfg.learning_rate,
    }
    labels = lr_group_labels(params, cfg)
    used = set(jax.tree.leaves(labels))
    transforms = {}
    for name in used:
        transforms[name] = optax.adamw(
            make_schedule(cfg, group_lrs[name]),
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        )
    opt = optax.multi_transform(transforms, labels)

    mask = trainable_mask(params, cfg.mm_tunable_parts)
    freeze = jax.tree.map(lambda t: not t, mask)
    # zero frozen grads BEFORE the global-norm clip: torch's frozen params
    # (requires_grad=False) never enter clip_grad_norm_, so frozen-module
    # grads must not inflate the norm and over-clip the trainable updates.
    # The trailing zero guards the frozen leaves against AdamW weight decay
    # (decoupled wd updates params even at zero grad).
    chain = [optax.masked(optax.set_to_zero(), freeze)]
    if cfg.max_grad_norm:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    tx = optax.chain(*chain, opt, optax.masked(optax.set_to_zero(), freeze))
    if cfg.grad_accum_steps > 1:
        # gradient accumulation (the reference's HF Trainer
        # gradient_accumulation_steps): average grads over k micro-steps,
        # apply the inner update every k-th
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx
