"""Evaluation CLI.

Parity target: tracking/test.py of the reference (:22-124) — run a tracker
(by script + training YAML) over a registered dataset, with --type
RGB/TIR/Prompt/RGBT input modes, per-dataset update intervals, skip-if-done
resume, and checkpoint-sweep mode (--checkpoint_dir globs every epoch
checkpoint and evaluates each).

Usage:
  python tracking/test.py asymmetric_shared_ce baseline --dataset_name lasher \
      --checkpoint out/checkpoints/MixFormerRGBT_ep0290.msgpack --threads 0
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Run a tracker on an eval dataset.")
    p.add_argument("script", type=str, help="model script name (e.g. asymmetric_shared_ce)")
    p.add_argument("config", type=str, nargs="?", default=None,
                   help="training yaml name under experiments/<script>/")
    p.add_argument("--tracking_yaml", type=str, default="auto",
                   help="tracking-time overlay YAML; 'auto' applies "
                        "experiments/tracking.yaml for RGBT scripts only "
                        "(reference parameter-file semantics)")
    p.add_argument("--dataset_name", type=str, default="synthetic_rgbt")
    p.add_argument("--type", type=str, default=None,
                   choices=[None, "RGB", "TIR", "Prompt", "RGBT"],
                   help="input mode; default: RGBT for bimodal scripts else RGB")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--model", type=str, default=None,
                   help="bare checkpoint filename resolved against save_dir "
                        "(reference lib/test/parameter/* semantics: "
                        "save_dir/models/<model>, or save_dir/<model> when "
                        "TEST.LOAD_FROME_TRAIN_RESULT)")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="sweep every epoch checkpoint in this directory")
    p.add_argument("--results_dir", type=str, default=None)
    p.add_argument("--search_area_scale", type=float, default=None)
    p.add_argument("--chunk", type=int, default=16,
                   help="frames per device scan dispatch")
    p.add_argument("--threads", type=int, default=0)
    p.add_argument("--batch_sequences", type=int, default=0,
                   help="track N same-resolution sequences in lockstep on "
                        "one chip (vmapped offline-eval fast path)")
    p.add_argument("--sequence", type=str, default=None, help="run a single sequence")
    p.add_argument("--rerun", action="store_true", help="do not skip finished sequences")
    p.add_argument("--roi_margin", type=float, default=0.0,
                   help="enable ROI-window uploads: upload only a "
                        "margin*search-sized window per chunk with exact "
                        "validity fallback (results byte-identical; big "
                        "upload cut on large frames, eval/running.py)")
    p.add_argument("--vis_search", action="store_true",
                   help="save per-sequence search-region visualisation videos "
                        "(reference params.vis_search)")
    argv, extras = _split_params_argv(sys.argv[1:])
    args = p.parse_args(argv)
    param_overrides = _parse_params_overrides(p, extras)

    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker, is_rgbt_script
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.eval.running import run_dataset, run_sequence
    from multi_modal_tracking_tpu.train.admin import env_settings

    dataset = get_dataset(args.dataset_name)
    if args.sequence:
        dataset = type(dataset)([dataset[args.sequence]])
    mode = args.type or ("RGBT" if is_rgbt_script(args.script) else "RGB")

    checkpoints = [args.checkpoint]
    if args.checkpoint_dir:
        checkpoints = sorted(glob.glob(os.path.join(args.checkpoint_dir, "*_ep*.msgpack")))
        if not args.script.endswith("online"):
            checkpoints = [c for c in checkpoints if _epoch_of(c) > 10]

    base_results = args.results_dir or os.path.join(
        env_settings().results_path or "output/tracking_results",
        args.script, args.config or "default")

    for ckpt in checkpoints:
        suffix = f"_ep{_epoch_of(ckpt)}" if (args.checkpoint_dir and ckpt) else ""
        results_dir = os.path.join(base_results + suffix, args.dataset_name)
        params = get_parameters(args.script, args.config, args.tracking_yaml,
                                checkpoint=ckpt, model=args.model,
                                search_area_scale=args.search_area_scale)
        for k, v in param_overrides.items():
            setattr(params, k, v)
        tracker = create_tracker(params, dataset_name=args.dataset_name, mode=mode)
        factory = (lambda: create_tracker(params, dataset_name=args.dataset_name,
                                          mode=mode)) if args.threads else None
        import jax
        from multi_modal_tracking_tpu.tracking.tracker import (
            OnlineTrackerJit, RGBCachedTrackerJit, RGBTCachedTrackerJit,
            RGBTOnlineCachedTrackerJit, RGBTOnlineTrackerJit, RGBTrackerJit,
            RGBTTrackerJit)
        _batchable = (RGBTTrackerJit, RGBTOnlineTrackerJit, RGBTrackerJit,
                      OnlineTrackerJit)
        if args.batch_sequences > 1 and isinstance(tracker, _batchable):
            from multi_modal_tracking_tpu.eval.running import _load_frame
            from multi_modal_tracking_tpu.tracking.batched import (
                BatchedOnlineTrackerJit, BatchedRGBCachedTrackerJit,
                BatchedRGBTCachedTrackerJit, BatchedRGBTOnlineCachedTrackerJit,
                BatchedRGBTOnlineTrackerJit, BatchedRGBTrackerJit,
                BatchedRGBTTrackerJit, run_sequences_batched)
            # per-family lockstep twin; the cached-template fast path
            # carries over to batching
            batched_cls = {
                RGBTTrackerJit: BatchedRGBTTrackerJit,
                RGBTCachedTrackerJit: BatchedRGBTCachedTrackerJit,
                RGBTOnlineTrackerJit: BatchedRGBTOnlineTrackerJit,
                RGBTOnlineCachedTrackerJit: BatchedRGBTOnlineCachedTrackerJit,
                RGBTrackerJit: BatchedRGBTrackerJit,
                RGBCachedTrackerJit: BatchedRGBCachedTrackerJit,
                OnlineTrackerJit: BatchedOnlineTrackerJit,
            }[type(tracker)]
            kw = dict(
                model=tracker.model, variables=tracker.variables,
                template_factor=tracker.template_factor,
                template_size=tracker.template_size,
                search_factor=tracker.search_factor,
                search_size=tracker.search_size,
                update_interval=tracker.update_interval,
                scan_chunk=args.chunk)
            if isinstance(tracker, (RGBTrackerJit, OnlineTrackerJit)):
                kw.update(mode=tracker.mode,
                          prompt_lambda=tracker.prompt_lambda)
                if isinstance(tracker, OnlineTrackerJit):
                    kw.update(online_size=tracker.online_size,
                              max_score_decay=tracker.max_score_decay)
            else:
                kw["ce_keep_rate"] = tracker.ce_keep_rate
                if isinstance(tracker, RGBTOnlineTrackerJit):
                    kw["max_score_decay"] = tracker.max_score_decay
            bt = batched_cls(**kw)
            groups = {}
            for seq in dataset:
                fr = _load_frame(seq, 0)     # RGBT: [v, i]; unimodal: array
                frame0 = fr[0] if isinstance(fr, list) else fr
                groups.setdefault(frame0.shape[:2], []).append(seq)
            for shape, seqs in groups.items():
                for lo in range(0, len(seqs), args.batch_sequences):
                    run_sequences_batched(seqs[lo: lo + args.batch_sequences], bt,
                                          results_dir, chunk=args.chunk,
                                          skip_if_done=not args.rerun)
        else:
            run_dataset(dataset, tracker, results_dir, skip_if_done=not args.rerun,
                        chunk=args.chunk, threads=args.threads,
                        tracker_factory=factory,
                        devices=jax.devices() if args.threads else None,
                        save_vis=args.vis_search,
                        roi_margin=args.roi_margin)
        print(f"results -> {results_dir}")


def _split_params_argv(argv):
    """Pull `--params__<name> <value>` / `--params__<name>=<value>` pairs out
    of argv BEFORE argparse runs (so bare values can't be mistaken for the
    optional positional). Returns (remaining_argv, extracted_tokens)."""
    rest, extras = [], []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("--params__"):
            extras.append(tok)
            if "=" not in tok and i + 1 < len(argv):
                i += 1
                extras.append(argv[i])
        else:
            rest.append(tok)
        i += 1
    return rest, extras


def _parse_params_overrides(parser, unknown):
    """Dynamic --params__<name> <value> passthrough onto TrackerParams
    (reference tracking/test.py:72-92). Values are literal-coerced
    (int/float/bool where possible, else string)."""
    import ast
    out = {}
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if not tok.startswith("--params__"):
            parser.error(f"unrecognized argument: {tok}")
        key, eq, val = tok[len("--params__"):].partition("=")
        if not eq:
            i += 1
            if i >= len(unknown):
                parser.error(f"--params__{key} needs a value")
            val = unknown[i]
        try:
            out[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            out[key] = val
        i += 1
    return out


def _epoch_of(path):
    import re
    m = re.search(r"_ep(\d+)\.msgpack$", path or "")
    return int(m.group(1)) if m else -1


if __name__ == "__main__":
    main()
