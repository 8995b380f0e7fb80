#!/bin/bash
# Chunk-parallel interleaved-image answer generation — the TPU counterpart
# of the reference's scripts/interleave/eval_multiprocess.sh (same argument
# surface; chunks run as parallel processes against the one TPU chip or a
# sharded mesh instead of one-GPU-per-chunk).
#
# Usage: eval_multiprocess.sh MODEL_PATH QUESTION_PATH BASE_ANSWER_PATH \
#            IMAGE_FOLDER EXTRA_PROMPT N TEMPERATURE
set -euo pipefail

if [ "$#" -ne 7 ]; then
    echo "Usage: $0 <model_path> <question_path> <base_answer_path>" \
         "<image_folder> <extra_prompt> <N> <temperature>"
    exit 1
fi

model_path=$1
question_path=$2
base_answer_path=$3
image_folder=$4
extra_prompt=$5
N=$6
temperature=$7

mkdir -p "$base_answer_path"

for (( chunk_id=0; chunk_id<N; chunk_id++ )); do
    answer_path="${base_answer_path}/result_${chunk_id}.jsonl"
    rm -f "$answer_path"
    python -m memory_augmented_vlm_tpu.eval.model_vqa \
        --model-path "$model_path" \
        --question-file "$question_path" \
        --answers-file "$answer_path" \
        --num-chunks "$N" --chunk-idx "$chunk_id" \
        --image-folder "$image_folder" \
        --extra-prompt "$extra_prompt" \
        --temperature "$temperature" &
done
wait

merged_file="${base_answer_path}/result.jsonl"
rm -f "$merged_file"
for (( chunk_id=0; chunk_id<N; chunk_id++ )); do
    cat "${base_answer_path}/result_${chunk_id}.jsonl" >> "$merged_file"
done
echo "answers -> $merged_file"
