#!/bin/bash
# Chunk-sharded video-QA evaluation — the TPU equivalent of the reference's
# scripts/video/eval/*_shard.sh suites (activitynet / video_chatgpt /
# detail-description all share this shape: split the question file across
# workers, run model_vqa per chunk, concatenate answers).
#
# Usage: run_video_eval.sh CKPT QUESTION_FILE VIDEO_FOLDER OUT_DIR \
#            [FRAMES=64] [CHUNKS=1] [CONV_MODE=qwen_1_5]
set -euo pipefail

CKPT=$1
QFILE=$2
VIDEOS=$3
OUT=$4
FRAMES=${5:-64}
CHUNKS=${6:-1}
CONV_MODE=${7:-qwen_1_5}

mkdir -p "$OUT"
export PYTHONWARNINGS=ignore
export TOKENIZERS_PARALLELISM=false

for IDX in $(seq 0 $((CHUNKS - 1))); do
  python -m memory_augmented_vlm_tpu.eval.model_vqa \
      --model-path "$CKPT" \
      --question-file "$QFILE" \
      --video-folder "$VIDEOS" \
      --answers-file "$OUT/answers_${CHUNKS}_${IDX}.jsonl" \
      --num-chunks "$CHUNKS" --chunk-idx "$IDX" \
      --max_frames_num "$FRAMES" --conv-mode "$CONV_MODE" &
done
wait

cat "$OUT"/answers_${CHUNKS}_*.jsonl > "$OUT/merge.jsonl"
echo "answers -> $OUT/merge.jsonl"
