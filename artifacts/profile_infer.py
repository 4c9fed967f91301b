"""Inference-scan FLOP-reduction experiment (VERDICT r4 #4).

The single-stream ceiling is now the compute leg (~1.96 ms/frame bf16 on the
shipped recipe; BENCH_r04). The eval path already runs bf16 matmuls AND the
bf16 softmax the train-side experiment rejected (profile_train3_r4.json was
about training numerics — eval tolerates it and ships it), so the remaining
FLOP lever is test-time candidate-elimination tightening: the per-block
keep_ratio_search (config 0.7 at blocks 3/6/9) sets how many search tokens
blocks 4..12 process. The reference never sweeps this at test time
(lib/models/mixformer_vit_rgbt/asymmetric_shared_ce.py:49-101 applies the
config rate); this measures what the knob buys on TPU and what it costs in
tracking quality:

  for keep in {config 0.7, 0.6, 0.5}:
    * analytic matmul+conv FLOPs of one cached-forward track step;
    * compute-only scan time over a 384-frame clip (min of 2 draws);
    * AUC/OP50/OP75 on the hard synthetic eval set with the TRAINED
      checkpoint (trajectory impact, not just a norm delta).

Writes artifacts/profile_infer_r5.json. A no-win (quality cliff or no
speedup) is a valid recorded outcome.

Run: env PYTHONPATH=/root/repo:/root/.axon_site \
    python artifacts/profile_infer.py [--ckpt CKPT]
"""
import argparse
import glob
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAME_H, FRAME_W, N_FRAMES = 512, 640, 384


def _find_ckpt():
    cands = sorted(glob.glob("/tmp/eval_rehearsal_*/train/checkpoints/**/*.msgpack",
                             recursive=True), key=os.path.getmtime)
    assert cands, "no trained checkpoint; run artifacts/eval_rehearsal.py first"
    return cands[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--config", default="synthetic_learn_hard")
    ap.add_argument("--out", default="profile_infer_r5.json")
    args = ap.parse_args()
    ckpt = args.ckpt or _find_ckpt()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from multi_modal_tracking_tpu.eval.analysis import (TrackerResults,
                                                        compute_scores,
                                                        extract_results)
    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.eval.running import run_sequence
    from multi_modal_tracking_tpu.tracking.tracker import _put
    from multi_modal_tracking_tpu.utils.flops import matmul_conv_flops

    params = get_parameters("asymmetric_shared_ce", args.config,
                            tracking_yaml="tracking")
    params.checkpoint = ckpt
    dataset = get_dataset("synthetic_rgbt_hard")
    rng = np.random.default_rng(0)
    fv = rng.integers(0, 255, (N_FRAMES, FRAME_H, FRAME_W, 3), dtype=np.uint8)
    fi = rng.integers(0, 255, (N_FRAMES, FRAME_H, FRAME_W), dtype=np.uint8)
    init = {"init_bbox": [280.0, 220.0, 80.0, 60.0]}

    work = tempfile.mkdtemp(prefix="profile_infer_")
    results = {}
    trackers = {}
    for keep in (None, 0.6, 0.5):
        tag = "config0.7" if keep is None else str(keep)
        tr = create_tracker(params, "synthetic", dtype=jnp.bfloat16)
        tr.ce_keep_rate = keep
        tr.scan_chunk = N_FRAMES
        trackers[tag] = tr

        # analytic FLOPs of ONE cached track step at bench frame geometry
        tr.initialize([fv[0], fi[0]], init)
        step_fn = lambda v, st, a, b: tr._step((FRAME_H, FRAME_W), v, st, a, b)
        flops = matmul_conv_flops(step_fn, tr.variables, tr._state,
                                  jnp.zeros((FRAME_H, FRAME_W, 3), jnp.uint8),
                                  jnp.zeros((FRAME_H, FRAME_W), jnp.uint8))
        results[tag] = {"step_gflops": round(flops / 1e9, 3)}
        print(f"[{tag}] step GFLOPs {results[tag]['step_gflops']}", flush=True)

    # uploads once (pre-fetch window), then per-variant warm + timed scans
    dv, di = _put(fv), _put(fi)
    for tag, tr in trackers.items():
        tr.initialize([fv[0], fi[0]], init)
        warm = tr.track_chunk(dv, di, fetch=False)
        np.asarray(warm[-1])
        draws = []
        for _ in range(2):
            tr.initialize([fv[0], fi[0]], init)
            t0 = time.perf_counter()
            pend = tr.track_chunk(dv, di, fetch=False)
            np.asarray(pend[-1])
            draws.append(time.perf_counter() - t0)
        ms = min(draws) * 1e3 / N_FRAMES
        results[tag]["scan_ms_per_frame"] = round(ms, 3)
        print(f"[{tag}] {ms:.3f} ms/frame", flush=True)

    # quality: hard-set eval per variant through the analysis stack
    for tag, tr in trackers.items():
        tr.scan_chunk = 32
        res = os.path.join(work, tag)
        for seq in dataset:
            run_sequence(seq, tr, res, chunk=16, report_fps=False)
        m = compute_scores(extract_results(
            [TrackerResults(res, display_name=tag)], dataset, f"pi_{tag}"))
        results[tag].update({k.lower().replace(" ", "_"):
                             round(float(m[k][0]), 2)
                             for k in ("AUC", "OP50", "OP75")})
        print(f"[{tag}] {results[tag]}", flush=True)

    base = results["config0.7"]
    out = {
        "checkpoint": os.path.basename(ckpt),
        "variants": results,
        "speedup_0.5_vs_config": round(base["scan_ms_per_frame"]
                                       / results["0.5"]["scan_ms_per_frame"], 3),
        "auc_delta_0.5_vs_config": round(results["0.5"]["auc"] - base["auc"], 2),
        "flow": "trained flagship ckpt, bf16 cached scan; CE test-time keep "
                "sweep: FLOPs + 384-frame compute scan + hard-set AUC",
    }
    path = os.path.join(REPO, "artifacts", args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
