#!/usr/bin/env bash
# Generate the machine-local dataset/output path file (parity: set_path.sh).
set -e
cd "$(dirname "$0")/.."
python tracking/create_default_local_file.py --workspace_dir . \
    --data_dir "${DATA_DIR:-./data}" --save_dir "${SAVE_DIR:-./output}"
