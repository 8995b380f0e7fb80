#!/bin/bash
# ActivityNet-QA evaluation — the TPU counterpart of the reference's
# scripts/video/eval/activitynet_eval.sh: chunk-sharded answer generation
# followed by the GPT-assisted yes/no + 0-5 scoring protocol
# (eval/gpt_eval.py; offline token-F1 judge when no OPENAI_API_KEY).
#
# Usage: activitynet_eval.sh CKPT GT_QUESTIONS GT_ANSWERS VIDEO_DIR OUT_DIR \
#            [FRAMES=64] [CHUNKS=1] [CONV_MODE=qwen_1_5]
set -euo pipefail

CKPT=$1
GT_Q=$2
GT_A=$3
VIDEOS=$4
OUT=$5
FRAMES=${6:-64}
CHUNKS=${7:-1}
CONV_MODE=${8:-qwen_1_5}

SCRIPT_DIR=$(dirname "$0")
bash "$SCRIPT_DIR/run_video_eval.sh" \
    "$CKPT" "$GT_Q" "$VIDEOS" "$OUT" "$FRAMES" "$CHUNKS" "$CONV_MODE"

python -m memory_augmented_vlm_tpu.eval.gpt_eval \
    --pred_path "$OUT/merge.jsonl" \
    --mode qa \
    --gt_file_question "$GT_Q" \
    --gt_file_answers "$GT_A" \
    --output_json "$OUT/results.json" \
    ${OPENAI_API_KEY:+--api_key "$OPENAI_API_KEY"}
