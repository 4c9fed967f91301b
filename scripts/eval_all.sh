#!/usr/bin/env bash
# Cross-dataset evaluation sweep (parity: eval_all.sh of the reference).
set -e
cd "$(dirname "$0")/.."
SCRIPT=${1:-asymmetric_shared_ce}
CONFIG=${2:-baseline}
DATASETS=${DATASETS:-"lasher rgbt234 vtuav_short vtuav_long"}
for DS in $DATASETS; do
    python tracking/test.py "$SCRIPT" "$CONFIG" --dataset_name "$DS" ${CKPT:+--checkpoint "$CKPT"}
done
python tracking/analysis_results_crossdatasets.py --datasets_name $DATASETS \
    --results_glob "output/tracking_results/$SCRIPT/*"
