#!/usr/bin/env bash
# Train MixFormer-convmae (parity: tracking/train_mixformer_convmae.sh).
set -e
cd "$(dirname "$0")/.."
python tracking/train.py --script mixformer_convmae --config "${1:-baseline}" \
    --save_dir "${SAVE_DIR:-output}"
