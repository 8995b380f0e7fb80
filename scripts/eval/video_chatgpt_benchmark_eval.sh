#!/bin/bash
# Video-ChatGPT 5-axis benchmark — the TPU counterpart of the reference's
# scripts/video/eval/video_chatgpt_benchmark_eval_shard.sh +
# video_detail_description_eval_{only,shard}.sh: chunk-sharded generation on
# the generic/temporal/consistency question sets, then the five judge axes
# (eval/gpt_eval.py; offline token-F1 judge when no OPENAI_API_KEY).
#
# Usage: video_chatgpt_benchmark_eval.sh CKPT QUESTIONS_DIR VIDEO_DIR OUT_DIR \
#            [FRAMES=64] [CHUNKS=1] [CONV_MODE=qwen_1_5]
# QUESTIONS_DIR holds generic_qa.json[l] / temporal_qa.json[l] /
# consistency_qa.json[l] (any subset; missing sets are skipped).
set -euo pipefail

CKPT=$1
QDIR=$2
VIDEOS=$3
OUT=$4
FRAMES=${5:-64}
CHUNKS=${6:-1}
CONV_MODE=${7:-qwen_1_5}

SCRIPT_DIR=$(dirname "$0")
judge_flags=(${OPENAI_API_KEY:+--api_key "$OPENAI_API_KEY"})

run_set () {  # run_set <question_file> <subdir>
  bash "$SCRIPT_DIR/run_video_eval.sh" \
      "$CKPT" "$1" "$VIDEOS" "$OUT/$2" "$FRAMES" "$CHUNKS" "$CONV_MODE"
}

qfile () {  # first existing generic/temporal/consistency question file
  for ext in jsonl json; do
    [ -f "$QDIR/$1_qa.$ext" ] && { echo "$QDIR/$1_qa.$ext"; return 0; }
  done
  return 1
}

if GENERIC=$(qfile generic); then
  run_set "$GENERIC" generic
  for axis in correctness detailed_orientation context; do
    python -m memory_augmented_vlm_tpu.eval.gpt_eval \
        --pred_path "$OUT/generic/merge.jsonl" --mode "$axis" \
        --output_json "$OUT/results_${axis}.json" "${judge_flags[@]}"
  done
fi

if TEMPORAL=$(qfile temporal); then
  run_set "$TEMPORAL" temporal
  python -m memory_augmented_vlm_tpu.eval.gpt_eval \
      --pred_path "$OUT/temporal/merge.jsonl" --mode temporal \
      --output_json "$OUT/results_temporal.json" "${judge_flags[@]}"
fi

if CONSISTENCY=$(qfile consistency); then
  # consistency pairs: each question row carries both phrasings; the judge
  # compares pred (first phrasing) with pred2 (second phrasing)
  run_set "$CONSISTENCY" consistency
  python -m memory_augmented_vlm_tpu.eval.gpt_eval \
      --pred_path "$OUT/consistency/merge.jsonl" --mode consistency \
      --output_json "$OUT/results_consistency.json" "${judge_flags[@]}"
fi
