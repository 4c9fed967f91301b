#!/usr/bin/env bash
# Test MixFormer-cvt (parity: tracking/test_mixformer_cvt.sh).
set -e
cd "$(dirname "$0")/.."
python tracking/test.py mixformer_cvt "${1:-baseline}" \
    --dataset_name "${2:-lasot}" --type RGB ${CKPT:+--checkpoint "$CKPT"}
