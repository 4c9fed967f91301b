"""Warm the filesystem / page cache by pre-reading training datasets.

Parity target: tracking/pre_read_datasets.py of the reference (lmdb
warm-read). Works for both storage layouts: LMDB databases (when the lmdb
package is present) and plain image trees — for the latter it streams every
sequence's first+middle+last frame through the native decoder, which is
usually enough to warm metadata caches on network filesystems.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", type=str, nargs="+", default=["LasHeR"])
    p.add_argument("--full", action="store_true", help="read every frame")
    args = p.parse_args()

    from multi_modal_tracking_tpu.train.builders import names2datasets

    t0 = time.time()
    n_read = 0
    for ds in names2datasets(args.datasets):
        for seq_id in range(len(ds.sequence_list)):
            info = ds.get_sequence_info(seq_id)
            n = int(info["visible"].shape[0])
            ids = range(n) if args.full else sorted({0, n // 2, n - 1})
            try:
                frames, _, _ = ds.get_frames(seq_id, list(ids), info)
                n_read += len(frames)
            except Exception as e:
                print(f"  ! {ds.get_name()}[{seq_id}]: {e}")
        print(f"{ds.get_name()}: warmed {len(ds.sequence_list)} sequences")
    print(f"read {n_read} frames in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
