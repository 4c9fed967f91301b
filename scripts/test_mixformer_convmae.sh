#!/usr/bin/env bash
# Test MixFormer-convmae (parity: tracking/test_mixformer_convmae.sh).
set -e
cd "$(dirname "$0")/.."
python tracking/test.py mixformer_convmae "${1:-baseline}" \
    --dataset_name "${2:-lasot}" --type RGB ${CKPT:+--checkpoint "$CKPT"}
