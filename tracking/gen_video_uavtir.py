"""Render result-vs-GT comparison videos over the TIR modality.

Parity target: gen_video_uavtir.py of the reference (renders boxes tracked
on H20T-RGB onto the paired TIR frames). Thin wrapper over
tracking/gen_video.py with `--modality ir` and the VTUAV dataset default.

Usage:
  python tracking/gen_video_uavtir.py --dataset_name vtuav_short \
      --results 'mine=output/tracking_results/asymmetric_shared_ce/baseline'
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import gen_video

    argv = sys.argv[1:]
    if not any(a.startswith("--modality") for a in argv):
        argv = ["--modality", "ir"] + argv
    if not any(a.startswith("--dataset_name") for a in argv):
        argv = ["--dataset_name", "vtuav_short"] + argv
    sys.argv = [sys.argv[0]] + argv
    gen_video.main()


if __name__ == "__main__":
    main()
