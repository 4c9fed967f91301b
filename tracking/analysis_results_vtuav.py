"""VTUAV analysis CLI: metric tables for the short-/long-term splits.

Parity target: tracking/analysis_results_vtuav.py of the reference
(`--dataset_split _short/_long`, sparse-GT-aware metrics). Thin wrapper over
tracking/analysis_results.py with VTUAV defaults — the sparse 10-frame GT
subsampling itself lives in eval/metrics.py (reference
lib/test/analysis/extract_results.py:125-127).

Usage:
  python tracking/analysis_results_vtuav.py --dataset_split _short \
      --results_glob 'output/tracking_results/asymmetric_shared_ce/*'
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import analysis_results

    argv = sys.argv[1:]
    if not any(a.startswith("--dataset_name") for a in argv):
        argv = ["--dataset_name", "vtuav"] + argv
    if not any(a.startswith("--dataset_split") for a in argv):
        argv = ["--dataset_split", "_short"] + argv
    sys.argv = [sys.argv[0]] + argv
    analysis_results.main()


if __name__ == "__main__":
    main()
