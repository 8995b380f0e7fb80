"""Training entry point — the `torchrun llava/train/train_mem.py` equivalent.

Argument surface mirrors the reference's Model/Data/TrainingArguments
dataclasses (train.py:70-192) for the knobs the TPU stack honors; launch is
`python -m memory_augmented_vlm_tpu.train.cli --data_path ... --output_dir
...` (single-host; multi-host via `jax.distributed.initialize`, no torchrun /
NCCL env tuning needed).

Loop structure:
  host: dataset -> bucket queues -> collate (data/collator.py)
  device: one jitted train step per bucket (train/trainer.py), params sharded
  per parallel/sharding.py; orbax checkpoints with auto-resume; metrics JSONL
  + optional wandb; step-time breakdown (utils/logging.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from collections import defaultdict
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import MeshConfig, VLMConfig
from memory_augmented_vlm_tpu.data import collator as collator_mod
from memory_augmented_vlm_tpu.data.dataset import LazySupervisedDataset
from memory_augmented_vlm_tpu.checkpoint import orbax_io
from memory_augmented_vlm_tpu.parallel.mesh import build_mesh
from memory_augmented_vlm_tpu.parallel.sharding import shard_params
from memory_augmented_vlm_tpu.train import trainer as trainer_mod
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig
from memory_augmented_vlm_tpu.utils.logging import (
    MetricsLogger,
    StepTimer,
    build_logger,
    rank0_print,
)


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser("mavlm_tpu trainer")
    # model
    p.add_argument("--model_name_or_path", type=str, default=None,
                   help="HF-format checkpoint dir (load_pretrained_model)")
    p.add_argument("--version", type=str, default="qwen_1_5")
    p.add_argument("--mm_tunable_parts", type=str,
                   default="larimar_model,recurrent_model,mm_language_model")
    p.add_argument("--mm_projector_type", type=str, default="mlp2x_gelu")
    p.add_argument("--mm_spatial_pool_mode", type=str, default="bilinear")
    p.add_argument("--dropout_frames", action="store_true")
    p.add_argument("--tower_int8", action="store_true",
                   help="run the frozen tower with prequantized int8 weights "
                        "on the int8 MXU (it is stop-gradient'ed regardless; "
                        "~1.2x tower speedup, drift in the bf16 1e-2 class)")
    # data
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--image_folder", type=str, default=None)
    p.add_argument("--video_folder", type=str, default=None)
    p.add_argument("--add_time_instruction", action="store_true")
    p.add_argument("--frames_upbound", type=int, default=300)
    # optimization (finetune_short.sh defaults)
    p.add_argument("--learning_rate", type=float, default=1e-6)
    p.add_argument("--mm_vision_tower_lr", type=float, default=2e-6)
    p.add_argument("--memory_transformer_lr", type=float, default=1e-5)
    p.add_argument("--memory_key_value_lr", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--lr_scheduler_type", type=str, default="cosine")
    p.add_argument("--num_train_epochs", type=float, default=1.0)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--per_device_train_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--model_max_length", type=int, default=32768)
    # infra
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--save_steps", type=int, default=100)
    p.add_argument("--save_total_limit", type=int, default=2)
    p.add_argument("--logging_steps", type=int, default=1)
    p.add_argument("--report_to", type=str, default="none")
    p.add_argument("--run_name", type=str, default="mavlm")
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_fsdp", type=int, default=0,
                   help="0 = all remaining devices")
    p.add_argument("--mesh_tp", type=int, default=1)
    p.add_argument("--mesh_sp", type=int, default=1,
                   help="sequence-parallel ring size (ring attention over "
                        "the fused prefill; ops/ring_attention.py)")
    p.add_argument("--mesh_pp", type=int, default=1,
                   help="pipeline-parallel stage count (GPipe layer stages; "
                        "ops/pipeline.py)")
    p.add_argument("--mesh_ep", type=int, default=1,
                   help="expert-parallel size (MoE expert axis shards over "
                        "(fsdp, ep); dense params replicate across ep)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="microbatches per pipeline step (0 = one per stage); "
                        "raising it shrinks the GPipe bubble (P-1)/(M+P-1); "
                        "the per-data-shard batch must divide it")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() for multi-host pods")
    return p.parse_args(argv)


def build_model(args) -> tuple:
    """Load or init (tokenizer, params, cfg)."""
    if args.model_name_or_path:
        from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model

        tokenizer, model, _, _ = load_pretrained_model(
            args.model_name_or_path, None, "llava_qwen")
        return tokenizer, model.params, model.cfg
    from memory_augmented_vlm_tpu.data.tokenizer import load_qwen_tokenizer
    from memory_augmented_vlm_tpu.models import vlm as vlm_mod

    cfg = VLMConfig.onevision_0_5b()
    params = vlm_mod.init_params(cfg, jax.random.key(args.seed), dtype=jnp.bfloat16)
    return load_qwen_tokenizer(), params, cfg


def train(args) -> Dict[str, float]:
    if getattr(args, "distributed", False):
        jax.distributed.initialize()  # env-driven coordinator discovery
    logger = build_logger("train", os.path.join(args.output_dir, "train.log"))
    tokenizer, params, cfg = build_model(args)
    from memory_augmented_vlm_tpu.data.dataset import PREPROCESS_FUNCS

    if args.version not in PREPROCESS_FUNCS:
        raise ValueError(
            f"--version {args.version}: available conversation templates: "
            f"{sorted(PREPROCESS_FUNCS)}")
    if args.model_name_or_path and args.mm_projector_type != cfg.pipeline.mm_projector_type:
        raise ValueError(
            f"--mm_projector_type {args.mm_projector_type} conflicts with the "
            f"loaded checkpoint's {cfg.pipeline.mm_projector_type}")
    pipeline = dataclasses.replace(
        cfg.pipeline,
        dropout_frames=args.dropout_frames or cfg.pipeline.dropout_frames,
        mm_spatial_pool_mode=args.mm_spatial_pool_mode,
        add_time_instruction=args.add_time_instruction,
        frames_upbound=args.frames_upbound,
        tokenizer_model_max_length=args.model_max_length,
        tower_int8=getattr(args, "tower_int8", False) or cfg.pipeline.tower_int8,
    )
    if not args.model_name_or_path:
        pipeline = dataclasses.replace(
            pipeline, mm_projector_type=args.mm_projector_type)
    cfg = dataclasses.replace(cfg, pipeline=pipeline)
    if args.pp_microbatches:
        cfg = dataclasses.replace(cfg, lm=dataclasses.replace(
            cfg.lm, pp_microbatches=args.pp_microbatches))
    if cfg.pipeline.tower_int8:
        # the FINAL flag value (CLI or checkpoint config.json) decides; a
        # quantized tower cannot also be trained
        if "mm_vision_tower" in args.mm_tunable_parts:
            raise ValueError(
                "tower_int8 (from --tower_int8 or the checkpoint config) "
                "conflicts with training the tower (mm_tunable_parts "
                "contains mm_vision_tower)")
        if not cfg.pipeline.mm_vision_tower.lower().startswith(
                ("google/siglip", "siglip")):
            raise ValueError(
                f"tower_int8 supports the SigLIP family only; tower is "
                f"{cfg.pipeline.mm_vision_tower}")
        if "kernel_int8" not in str(
                jax.tree_util.tree_structure(params["vision_tower"])):
            from memory_augmented_vlm_tpu.models import siglip as _siglip

            params["vision_tower"] = _siglip.prequantize_int8(
                params["vision_tower"])
            rank0_print("tower: prequantized int8 (frozen, int8 MXU)")

    n_dev = len(jax.devices())
    fsdp = args.mesh_fsdp or max(
        1, n_dev // (args.mesh_data * args.mesh_tp * args.mesh_sp
                     * args.mesh_pp * args.mesh_ep))
    mesh = build_mesh(MeshConfig(args.mesh_data, fsdp, args.mesh_tp,
                                 args.mesh_sp, args.mesh_pp, args.mesh_ep))
    params = shard_params(params, mesh)
    rank0_print(f"mesh: data={args.mesh_data} fsdp={fsdp} "
                f"tp={args.mesh_tp} sp={args.mesh_sp} pp={args.mesh_pp} "
                f"ep={args.mesh_ep}")

    from memory_augmented_vlm_tpu.data.preprocessing import SigLipImageProcessor

    dataset = LazySupervisedDataset(
        args.data_path, tokenizer,
        image_folder=args.image_folder, video_folder=args.video_folder,
        image_processor=SigLipImageProcessor(
            size=(cfg.vision.image_size, cfg.vision.image_size)),
        pipeline=cfg.pipeline,
        conv_version=args.version,
    )
    steps_per_epoch = max(1, len(dataset) // max(
        1, args.per_device_train_batch_size * args.gradient_accumulation_steps))
    total_steps = (args.max_steps if args.max_steps > 0
                   else int(steps_per_epoch * args.num_train_epochs))
    # the loop counts micro-steps; MultiSteps applies every k-th
    total_micro_steps = total_steps * args.gradient_accumulation_steps
    opt_cfg = OptimizerConfig(
        learning_rate=args.learning_rate,
        grad_accum_steps=args.gradient_accumulation_steps,
        mm_vision_tower_lr=args.mm_vision_tower_lr,
        memory_transformer_lr=args.memory_transformer_lr,
        memory_key_value_lr=args.memory_key_value_lr,
        weight_decay=args.weight_decay,
        warmup_ratio=args.warmup_ratio,
        schedule=args.lr_scheduler_type,
        total_steps=total_steps,
        mm_tunable_parts=args.mm_tunable_parts,
    )
    state = trainer_mod.init_train_state(params, opt_cfg)

    resume = orbax_io.latest_checkpoint(args.output_dir)
    if resume:
        rank0_print(f"auto-resuming from {resume}")
        state = orbax_io.restore_checkpoint(resume, state)

    step_fns: Dict = {}
    metrics_log = MetricsLogger(args.output_dir, use_wandb=args.report_to == "wandb",
                                run_name=args.run_name)
    timer = StepTimer()
    rng = np.random.default_rng(args.seed)
    # dataset sampling strategies ('random:N') use the stdlib shuffle; seed
    # it too or auto-resumed runs rebuild a DIFFERENT data subset (the
    # reference gets this via HF set_seed)
    import random as _random

    _random.seed(args.seed)

    # bucketed batching: greedy queueing by bucket key
    queues: Dict[tuple, List] = defaultdict(list)
    order = rng.permutation(len(dataset))
    # tp/sp/pp/ep devices cooperate on the same batch rows; only data/fsdp
    # axes multiply the global batch
    bsz = (args.per_device_train_batch_size * mesh.devices.size
           // (args.mesh_tp * args.mesh_sp * args.mesh_pp * args.mesh_ep))
    step = int(state.step)
    last = {}
    i = 0
    # with --max_steps the data cycles until the step budget is spent;
    # otherwise one pass bounded by num_train_epochs
    data_budget = (np.inf if args.max_steps > 0
                   else len(order) * int(np.ceil(args.num_train_epochs)))
    # the jitted steps must trace under the ambient mesh or every
    # sharding_constraint inside them (CE logits pin, activation specs)
    # silently no-ops — see parallel/sharding.constrain
    mesh_ctx = jax.set_mesh(mesh)
    mesh_ctx.__enter__()
    while step < total_micro_steps and i < data_budget:
        with timer.section("data"):
            sample = dataset[int(order[i % len(order)])]
            i += 1
            key = collator_mod.bucket_key(sample, cfg.memory)
            queues[key].append(sample)
            if len(queues[key]) < bsz:
                continue
            samples = queues.pop(key)
            if key[0] == "text":
                np_batch = collator_mod.collate_text_batch(samples)
                batch = trainer_mod.TextBatch(**{
                    k: jnp.asarray(v) for k, v in np_batch.items()})
                nseg, drop = 0, False
            else:
                np_batch = collator_mod.collate_video_batch(samples, cfg.memory)
                batch = trainer_mod.TrainBatch(**{
                    k: jnp.asarray(v) for k, v in np_batch.items()})
                nseg = min(np_batch["pixels"].shape[1] // cfg.memory.segment_frames,
                           cfg.memory.cache_cap)
                drop = (cfg.pipeline.dropout_frames
                        and trainer_mod.synced_frame_dropout(step))
        fn_key = (key, nseg, drop)
        if fn_key not in step_fns:
            if key[0] == "text":
                step_fns[fn_key] = jax.jit(
                    trainer_mod.make_text_train_step(cfg, opt_cfg),
                    donate_argnums=(0,),
                )
            else:
                step_fns[fn_key] = jax.jit(
                    trainer_mod.make_train_step(cfg, opt_cfg, nseg=nseg,
                                                drop_frames=drop),
                    donate_argnums=(0,),
                )
        with timer.section("step"):
            state, metrics = step_fns[fn_key](state, batch)
            jax.block_until_ready(metrics["loss"])
        step = int(state.step)
        last = {k: float(v) for k, v in metrics.items()}
        if step % args.logging_steps == 0:
            metrics_log.log(step, dict(last, **timer.summary()))
            rank0_print(f"step {step}/{total_micro_steps} loss={last.get('loss', 0):.4f} "
                        f"gnorm={last.get('grad_norm', 0):.3f} {timer.summary()}")
        if args.save_steps and step % args.save_steps == 0:
            with timer.section("checkpoint"):
                # async: the disk write overlaps the next train steps
                orbax_io.save_checkpoint(args.output_dir, state, step,
                                         keep=args.save_total_limit,
                                         block=False)
                last_saved = step

    mesh_ctx.__exit__(None, None, None)
    if step == 0 and any(queues.values()):
        rank0_print(
            f"WARNING: dataset too small to fill a batch of {bsz}; "
            f"{sum(len(q) for q in queues.values())} samples queued but never "
            "trained — reduce batch size or add data")
    orbax_io.wait_for_checkpoints()
    final_path = os.path.join(args.output_dir, f"checkpoint-{step}")
    if step > 0 and not os.path.exists(final_path):
        orbax_io.save_checkpoint(args.output_dir, state, step,
                                 keep=args.save_total_limit)
    orbax_io.export_hf_safetensors(
        jax.tree.map(np.asarray, state.params), cfg,
        os.path.join(args.output_dir, "hf_export"))
    rank0_print(f"done at step {step}: {last}")
    return last


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    return train(args)


if __name__ == "__main__":
    main()
