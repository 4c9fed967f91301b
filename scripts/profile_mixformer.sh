#!/usr/bin/env bash
# FLOPs/params/latency for the main model families (parity: profile_mixformer.sh).
set -e
cd "$(dirname "$0")/.."
for S in mixformer_vit mixformer_cvt mixformer_convmae asymmetric_shared_ce; do
  echo "===== $S"
  python tracking/profile_model.py --script "$S" "$@"
done
