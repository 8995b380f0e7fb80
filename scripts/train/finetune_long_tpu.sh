#!/bin/bash
# Stage-2 long-video finetune (7B) — the finetune_long.sh recipe on TPU.
# dropout_frames off; 7B needs tp=2 alongside fsdp on a v5e-8.

PREV_STAGE_CHECKPOINT=${1:-lmms-lab/llava-onevision-qwen2-7b-ov}
DATA=${2:-scripts/train/long_train.yaml}
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
    --save_steps 200 --save_total_limit 2 \
    --mesh_fsdp 4 --mesh_tp 2 \
    --output_dir checkpoints/memory_long \
    --run_name memory_long_tpu "$@"
