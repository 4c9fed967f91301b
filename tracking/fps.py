"""Compute FPS from saved *_time.txt result files.

Parity target: fps.py of the reference (:1-35) — aggregates per-frame times
over every sequence of a results dir (includes pre/post-processing, excludes
frame reads).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    p = argparse.ArgumentParser()
    p.add_argument("results_dir", type=str)
    args = p.parse_args()
    total_time, total_frames = 0.0, 0
    for f in sorted(glob.glob(os.path.join(args.results_dir, "*_time.txt"))):
        t = np.loadtxt(f).reshape(-1)
        total_time += t.sum()
        total_frames += t.size
    if total_frames == 0:
        raise SystemExit(f"no *_time.txt under {args.results_dir}")
    print(f"{total_frames} frames, {total_time:.2f}s, "
          f"{total_frames / total_time:.2f} FPS")


if __name__ == "__main__":
    main()
