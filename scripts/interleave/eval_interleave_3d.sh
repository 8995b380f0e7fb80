#!/bin/bash
# One interleave benchmark subset end-to-end — the TPU counterpart of the
# reference's scripts/interleave/eval_interleave_3d.sh: chunked generation
# then ROUGE-L / multi-choice scoring (eval/evaluate_interleave.py).
#
# Usage: eval_interleave_3d.sh CKPT_PATH DATA_PATH EVAL_TYPE [N=8]
set -euo pipefail

CKPT_PATH=$1
DATA_PATH=$2
EVAL_TYPE=$3
N=${4:-8}

NAME=$(basename "$CKPT_PATH")
JSON_PATH=$DATA_PATH/$EVAL_TYPE.json
RESULT_NAME="logs/${NAME}/${EVAL_TYPE}"
mkdir -p "logs/${NAME}"

SCRIPT_DIR=$(dirname "$0")
bash "$SCRIPT_DIR/eval_multiprocess.sh" \
    "$CKPT_PATH" "$JSON_PATH" "$RESULT_NAME" "$DATA_PATH" "" "$N" 0

python -m memory_augmented_vlm_tpu.eval.evaluate_interleave \
    --result-dir "$RESULT_NAME"
