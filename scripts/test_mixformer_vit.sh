#!/usr/bin/env bash
# Test MixFormer-vit (parity: tracking/test_mixformer_vit.sh).
set -e
cd "$(dirname "$0")/.."
python tracking/test.py mixformer_vit "${1:-baseline}" \
    --dataset_name "${2:-lasot}" --type RGB ${CKPT:+--checkpoint "$CKPT"}
