#!/usr/bin/env bash
# VTUAV short+long splits (parity: eval_vtuav.sh).
set -e
cd "$(dirname "$0")/.."
SCRIPT=${1:-asymmetric_shared_ce}
CONFIG=${2:-baseline}
for SPLIT in _short _long; do
  python tracking/test.py "$SCRIPT" "$CONFIG" --dataset_name "vtuav$SPLIT" ${CKPT:+--checkpoint "$CKPT"}
  python tracking/analysis_results.py --dataset_name vtuav --dataset_split "$SPLIT" \
      --results_glob "output/tracking_results/$SCRIPT/*"
done
