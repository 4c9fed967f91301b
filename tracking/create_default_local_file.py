"""Generate the machine-local paths file.

Parity target: tracking/create_default_local_file.py (:17-23) of the
reference, which generates lib/train/admin/local.py and
lib/test/evaluation/local.py; here a single local_paths.json serves both.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_modal_tracking_tpu.train.admin import create_default_local_file

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workspace_dir", type=str, default=".")
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--save_dir", type=str, default="./output")
    args = p.parse_args()
    path = create_default_local_file(args.workspace_dir, args.data_dir, args.save_dir)
    print(f"wrote {path} — edit dataset paths there")


if __name__ == "__main__":
    main()
