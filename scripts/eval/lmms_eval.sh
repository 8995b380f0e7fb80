#!/bin/bash
# The reference eval protocol (README.md:41-49) on the TPU adapter: runs the
# five headline video benchmarks through lmms-eval when installed, else
# prints the exact command for environments that have it.
#
# Usage: lmms_eval.sh CKPT [FRAMES=64] [TASKS=longvideobench_val_v,...]
set -euo pipefail

CKPT=$1
FRAMES=${2:-64}
TASKS=${3:-longvideobench_val_v,videomme,mlvu_dev,nextqa_mc_test,egoschema}

CMD=(python -m lmms_eval
  --model mavlm_tpu
  --model_args "pretrained=${CKPT},max_frames_num=${FRAMES}"
  --tasks "$TASKS"
  --batch_size 1 --log_samples --output_path ./eval_logs/)

if python -c "import importlib.util,sys; sys.exit(importlib.util.find_spec('lmms_eval.__main__') is None)"; then
  exec "${CMD[@]}"
else
  echo "lmms-eval CLI not installed; run where it is available:"
  printf ' %q' "${CMD[@]}"; echo
  exit 2
fi
