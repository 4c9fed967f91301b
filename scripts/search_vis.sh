#!/usr/bin/env bash
# Multi-model search-feature visualisation (parity: search_vis.sh).
set -e
cd "$(dirname "$0")/.."
python tracking/search_vis.py "$@"
