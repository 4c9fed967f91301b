"""Multi-model search-feature visualisation over a sequence.

Parity target: tracking/search_vis.py + lib/test/mulit_tracker_vis.py
Multi_Trackers (:23-47) / mulit_trackers_multi_modal_vis.py of the reference
— load several RGBT models, run them on the same frames and dump per-model
search-feature panels (RGB / TIR / fused) for side-by-side inspection.

Usage:
  python tracking/search_vis.py --scripts asymmetric_shared asymmetric_shared_ce \
      --dataset_name synthetic_rgbt --sequence synth_00 --out output/search_vis
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scripts", type=str, nargs="+", required=True)
    p.add_argument("--configs", type=str, nargs="*", default=None)
    p.add_argument("--checkpoints", type=str, nargs="*", default=None)
    p.add_argument("--dataset_name", type=str, default="synthetic_rgbt")
    p.add_argument("--sequence", type=str, default=None)
    p.add_argument("--frames", type=int, nargs="*", default=[0],
                   help="frame indices to dump")
    p.add_argument("--out", type=str, default="output/search_vis")
    p.add_argument("--tracking_yaml", type=str, default="tracking_vis",
                   help="tracking-time overlay (experiments/<name>.yaml); "
                        "tracking_vis applies GT-anchored jitter crops")
    args = p.parse_args()

    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.eval.running import _load_frame
    from multi_modal_tracking_tpu.eval.visualize import dump_search_features

    dataset = get_dataset(args.dataset_name)
    seq = dataset[args.sequence] if args.sequence else dataset[0]

    trackers = {}
    for i, script in enumerate(args.scripts):
        cfg_name = args.configs[i] if args.configs else None
        ckpt = args.checkpoints[i] if args.checkpoints else None
        params = get_parameters(script, cfg_name, tracking_yaml=args.tracking_yaml,
                                checkpoint=ckpt)
        trackers[script] = create_tracker(params, dataset_name=args.dataset_name)

    info = seq.init_info()
    for fid in args.frames:
        frame = _load_frame(seq, fid)
        paths = dump_search_features(trackers, frame, info, args.out, frame_id=fid)
        print(*paths, sep="\n")


if __name__ == "__main__":
    main()
