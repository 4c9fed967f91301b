#!/usr/bin/env bash
# Train MixFormer-vit (parity: tracking/train_mixformer_vit.sh).
set -e
cd "$(dirname "$0")/.."
python tracking/train.py --script mixformer_vit --config "${1:-baseline}" \
    --save_dir "${SAVE_DIR:-output}"
