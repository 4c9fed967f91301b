#!/usr/bin/env bash
# Evaluate + analyse on LasHeR (parity: eval.sh of the reference).
set -e
cd "$(dirname "$0")/.."
SCRIPT=${1:-asymmetric_shared_ce}
CONFIG=${2:-baseline}
DATASET=${3:-lasher}
python tracking/test.py "$SCRIPT" "$CONFIG" --dataset_name "$DATASET" ${CKPT:+--checkpoint "$CKPT"}
python tracking/analysis_results.py --dataset_name "$DATASET" \
    --results_glob "output/tracking_results/$SCRIPT/*"
