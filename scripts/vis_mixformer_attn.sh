#!/usr/bin/env bash
# Attention-map visualisation (parity: tracking/vis_mixformer_attn.sh).
set -e
cd "$(dirname "$0")/.."
python tracking/vis_attn.py "${1:-asymmetric_shared_ce}" "${2:-baseline}" \
    --dataset_name "${3:-lasher}" ${CKPT:+--checkpoint "$CKPT"}
