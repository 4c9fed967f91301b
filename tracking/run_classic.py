"""Run a classic tracker (ECO / ATOM / DiMP) over an eval dataset.

Parity target: the pytracking run-tracker entry the reference's AR snapshot
is built around (external/AR/pytracking/: ARcm_seg base trackers; upstream
pytracking run_tracker.py semantics — tracker name, dataset, optional
checkpoint, per-run parameter overrides, skip-if-done results).

Usage:
  python tracking/run_classic.py dimp --dataset_name otb \
      --checkpoint DiMPnet_ep0050.pth.tar --params crop_size=288 refine=1
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def main(argv=None):
    p = argparse.ArgumentParser(description="Run ECO/ATOM/DiMP on a dataset.")
    p.add_argument("tracker", choices=("eco", "atom", "dimp"))
    p.add_argument("--dataset_name", type=str, default="otb")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="torch DiMPnet/ATOMnet checkpoint (.pth) to convert "
                        "(dimp/atom; eco is fully online)")
    p.add_argument("--results_dir", type=str, default=None)
    p.add_argument("--sequence", type=str, default=None)
    p.add_argument("--rerun", action="store_true")
    p.add_argument("--params", nargs="*", default=[],
                   help="tracker constructor overrides, key=value")
    args = p.parse_args(argv)

    from multi_modal_tracking_tpu.classic import build_classic_tracker
    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    from multi_modal_tracking_tpu.eval.running import run_dataset
    from multi_modal_tracking_tpu.train.admin import env_settings

    kwargs = {}
    for kv in args.params:
        k, _, v = kv.partition("=")
        kwargs[k] = _coerce(v)

    dataset = get_dataset(args.dataset_name)
    # classic trackers are unimodal: RGBT/RGBD sequences deliver per-frame
    # [visible, infrared] pairs which these trackers cannot consume
    probe = dataset[0] if len(dataset) else None
    if probe is not None and getattr(probe, "multimodal", False):
        p.error(f"dataset '{args.dataset_name}' is multimodal; "
                f"eco/atom/dimp are RGB-only — pick an RGB dataset "
                f"(otb, lasot, got10k_test, ...)")
    if args.sequence:
        dataset = type(dataset)([dataset[args.sequence]])

    tracker = build_classic_tracker(args.tracker, **kwargs)
    if args.checkpoint:
        if not hasattr(tracker, "load_network"):
            p.error(f"--checkpoint not supported for '{args.tracker}'")
        from multi_modal_tracking_tpu.utils.torch_convert import load_torch_state_dict
        tracker.load_network(load_torch_state_dict(args.checkpoint))

    results_dir = args.results_dir or os.path.join(
        env_settings().results_path or "output/tracking_results",
        args.tracker, args.dataset_name)
    stats = run_dataset(dataset, tracker, results_dir,
                        skip_if_done=not args.rerun)
    done = [s for s in stats if s]
    print(f"{args.tracker} on {args.dataset_name}: {len(done)} sequences -> "
          f"{results_dir}")


if __name__ == "__main__":
    main()
