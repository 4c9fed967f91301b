#!/usr/bin/env bash
# VOT22-RGBD loop over epoch checkpoints (parity: eval_rgbd.sh): each epoch's
# weights become a VOT tracker entry driven through the trax adapter.
set -e
cd "$(dirname "$0")/.."
SCRIPT=${1:-asymmetric_shared_online}
CKPT_DIR=${2:?usage: eval_rgbd.sh <script> <checkpoint_dir>}
for CKPT in "$CKPT_DIR"/*_ep*.msgpack; do
  echo "== $CKPT"
  python - <<PY
from multi_modal_tracking_tpu.eval.vot import run_vot_exp
run_vot_exp("$SCRIPT", checkpoint="$CKPT", channels="rgbd")
PY
done
