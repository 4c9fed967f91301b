#!/usr/bin/env bash
# Train MixFormer-cvt (parity: tracking/train_mixformer_cvt.sh).
set -e
cd "$(dirname "$0")/.."
python tracking/train.py --script mixformer_cvt --config "${1:-baseline}" \
    --save_dir "${SAVE_DIR:-output}"
