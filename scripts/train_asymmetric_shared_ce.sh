#!/usr/bin/env bash
# Train the flagship RGB-T tracker (parity: tracking/train_mixformer_vit.sh).
# Single-host multi-chip: data parallelism comes from the jax mesh — no
# torchrun; jax.distributed.initialize() extends this to multi-host.
set -e
cd "$(dirname "$0")/.."
python tracking/train.py --script asymmetric_shared_ce --config "${1:-baseline}" \
    --save_dir "${SAVE_DIR:-output}"
