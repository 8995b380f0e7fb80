#!/bin/bash
# Stage-1 memory finetune (0.5B) — the finetune_short.sh recipe on TPU.
# Reference: scripts/train/finetune_short.sh (torchrun + DeepSpeed ZeRO-2 +
# NCCL env tuning); here one process per host, XLA collectives, fsdp mesh.
# On a v5e-8: --mesh_fsdp 8. Multi-host pods: add --distributed per host.

PREV_STAGE_CHECKPOINT=${1:-lmms-lab/llava-onevision-qwen2-0.5b-ov}
DATA=${2:-scripts/train/short_train.yaml}
VIDEOS=${3:-/data/videos_tensors}

python -m memory_augmented_vlm_tpu.train.cli \
    --model_name_or_path "$PREV_STAGE_CHECKPOINT" \
    --version qwen_1_5 \
    --data_path "$DATA" \
    --video_folder "$VIDEOS" \
    --mm_tunable_parts larimar_model,recurrent_model,mm_language_model \
    --mm_vision_tower_lr 2e-6 \
    --learning_rate 1e-6 \
    --memory_transformer_lr 1e-5 \
    --memory_key_value_lr 1e-5 \
    --lr_scheduler_type cosine --warmup_ratio 0.03 \
    --num_train_epochs 1 \
    --per_device_train_batch_size 1 \
    --gradient_accumulation_steps 4 \
    --model_max_length 32768 \
    --frames_upbound 300 \
    --dropout_frames \
    --save_steps 100 --save_total_limit 2 \
    --mesh_fsdp 8 \
    --output_dir checkpoints/memory_short \
    --run_name memory_short_tpu "$@"
