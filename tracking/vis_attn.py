"""Attention-map visualisation CLI.

Parity target: tracking/vis_mixformer_attn.sh + the attention-map hooks in
lib/test/tracker/mixformer_cvt_online.py:99-131 (vis_attn.png) — dump the
template->search attention of the flagship CE model as JET heatmaps per CE
block and modality while tracking a sequence.

Usage:
  python tracking/vis_attn.py asymmetric_shared_ce baseline \
      --dataset_name lasher --sequence car1 --frames 0 10 20 \
      --checkpoint ckpt.msgpack --out_dir output/attn_vis
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("script", type=str)
    p.add_argument("config", type=str)
    p.add_argument("--dataset_name", type=str, default="lasher")
    p.add_argument("--sequence", type=str, default=None)
    p.add_argument("--frames", type=int, nargs="+", default=[1, 25, 50])
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out_dir", type=str, default="output/attn_vis")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.eval.running import _load_frame
    from multi_modal_tracking_tpu.eval.visualize import dump_attention_maps

    params = get_parameters(args.script, args.config, checkpoint=args.checkpoint)
    tracker = create_tracker(params, dataset_name=args.dataset_name)
    dataset = get_dataset(args.dataset_name)
    seq = next(s for s in dataset
               if args.sequence is None or s.name == args.sequence)
    tracker.initialize(_load_frame(seq, 0), seq.init_info())
    out_paths = []
    for k in range(1, max(args.frames) + 1):
        frame = _load_frame(seq, k)
        tracker.track(frame)
        if k in args.frames:
            out_paths += dump_attention_maps(
                tracker, frame, os.path.join(args.out_dir, seq.name), frame_id=k)
    print(*out_paths, sep="\n")


if __name__ == "__main__":
    main()
