#!/usr/bin/env bash
# SOTA comparison plots (parity: eval_plot.sh of the reference).
set -e
cd "$(dirname "$0")/.."
DATASET=${1:-lasher}
python tracking/analysis_results_plot.py --dataset_name "$DATASET" \
    --results_glob "output/tracking_results/*/*" \
    ${EXTERNAL:+--external_glob "$EXTERNAL"} --language "${LANGUAGE:-en}"
