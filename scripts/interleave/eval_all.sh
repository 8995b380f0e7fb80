#!/bin/bash
# All three interleave benchmark subsets — the TPU counterpart of the
# reference's scripts/interleave/eval_all.sh.
#
# Usage: eval_all.sh CKPT_PATH DATA_PATH [N=8]
set -euo pipefail

CKPT_PATH=$1
DATA_PATH=$2
N=${3:-8}

SCRIPT_DIR=$(dirname "$0")
for subset in multi_image_in_domain multi_image_out_domain multi_view_in_domain; do
    bash "$SCRIPT_DIR/eval_interleave_3d.sh" "$CKPT_PATH" "$DATA_PATH" "$subset" "$N"
done
