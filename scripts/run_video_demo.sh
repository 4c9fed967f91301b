#!/usr/bin/env bash
# Track a video file and write the annotated result (parity: run_video_demo.sh).
set -e
cd "$(dirname "$0")/.."
SCRIPT=${1:?usage: run_video_demo.sh <script> <config> <video> [x y w h]}
CONFIG=$2
VIDEO=$3
shift 3
python tracking/video_demo.py "$SCRIPT" "$CONFIG" "$VIDEO" \
    ${1:+--optional_box "$@"} ${CKPT:+--checkpoint "$CKPT"}
