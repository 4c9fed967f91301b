"""bf16 shipped-path fidelity measurement (VERDICT r4 #1 — the gap between
what is proven and what runs).

The eval stack's default is dtype=bfloat16 with params pre-cast
(eval/evaltracker.py), but the whole oracle/system parity chain runs f32 —
the reference evaluates in f32 under torch.inference_mode
(lib/test/tracker/asymmetric_shared_ce.py:90-98). Tracking is a feedback
loop (the next crop depends on the previous box), so bf16 round-off can
compound; this artifact measures it at the real flagship geometry with a
TRAINED checkpoint on the real chip:

  1. miniature benchmark: both dtypes through run_sequence over the hard
     synthetic eval set -> analysis tables (AUC/OP50/OP75/Prec/NP deltas) +
     result-file row identity (the system-parity tolerance axis the r4
     verdict flagged);
  2. 72-frame stress trajectory: per-frame box divergence bf16 vs f32;
  3. long-sequence soak (~1200 frames): divergence vs frame index — does
     the feedback loop amplify round-off or does re-cropping wash it out?

Writes artifacts/bf16_parity_r5.json; the recorded dtype POLICY lives in
PARITY.md / README ("bf16 default with measured bound" or "f32 eval
default"), pointed at this artifact.

Run: env PYTHONPATH=/root/repo:/root/.axon_site \
    python artifacts/bf16_parity.py [--ckpt CKPT]
"""
import argparse
import glob
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _find_ckpt():
    cands = sorted(glob.glob("/tmp/eval_rehearsal_*/train/checkpoints/**/*.msgpack",
                             recursive=True), key=os.path.getmtime)
    assert cands, "no trained checkpoint found; run artifacts/eval_rehearsal.py first"
    return cands[-1]


def _iou(a, b):
    x1 = np.maximum(a[..., 0], b[..., 0])
    y1 = np.maximum(a[..., 1], b[..., 1])
    x2 = np.minimum(a[..., 0] + a[..., 2], b[..., 0] + b[..., 2])
    y2 = np.minimum(a[..., 1] + a[..., 3], b[..., 1] + b[..., 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    union = a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter
    return inter / np.maximum(union, 1e-9)


def _center_dist(a, b):
    return np.hypot((a[..., 0] + a[..., 2] / 2) - (b[..., 0] + b[..., 2] / 2),
                    (a[..., 1] + a[..., 3] / 2) - (b[..., 1] + b[..., 3] / 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--config", default="synthetic_learn_hard")
    ap.add_argument("--out", default="bf16_parity_r5.json")
    args = ap.parse_args()
    ckpt = args.ckpt or _find_ckpt()
    print(f"checkpoint: {ckpt}", flush=True)

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
    from multi_modal_tracking_tpu.train.data.datasets.synthetic import \
        SyntheticRGBT

    params = get_parameters("asymmetric_shared_ce", args.config,
                            tracking_yaml="tracking")
    params.checkpoint = ckpt
    trackers = {
        "f32": create_tracker(params, "synthetic", dtype=jnp.float32),
        "bf16": create_tracker(params, "synthetic", dtype=jnp.bfloat16),
    }

    # ---- leg 1: miniature benchmark through the full eval+analysis stack --
    work = tempfile.mkdtemp(prefix="bf16_parity_")
    dataset = get_dataset("synthetic_rgbt_hard")
    tables, res_dirs = {}, {}
    for tag, tr in trackers.items():
        res = os.path.join(work, tag)
        for seq in dataset:
            run_sequence(seq, tr, res, chunk=16, report_fps=False)
        res_dirs[tag] = res
        eval_data = extract_results(
            [TrackerResults(res, display_name=tag)], dataset, f"bf16p_{tag}")
        m = compute_scores(eval_data)
        tables[tag] = {k: round(float(m[k][0]), 3)
                       for k in ("AUC", "OP50", "OP75", "Precision",
                                 "Norm Precision")}
        print(f"  {tag}: {tables[tag]}", flush=True)

    # result-file cross-compatibility (PARITY r4 item 1 tolerance axis)
    n_rows = n_ident = 0
    max_dev = 0
    for seq in dataset:
        a = np.loadtxt(os.path.join(res_dirs["f32"], f"{seq.name}.txt"))
        b = np.loadtxt(os.path.join(res_dirs["bf16"], f"{seq.name}.txt"))
        n_rows += len(a)
        n_ident += int((a == b).all(axis=1).sum())
        max_dev = max(max_dev, int(np.abs(a - b).max()))

    # ---- leg 2: 72-frame stress trajectory -------------------------------
    ds = SyntheticRGBT(n_sequences=1, n_frames=72, H=360, W=480)
    fr, tir, gt = ds._seq(0)
    init = {"init_bbox": [float(v) for v in gt[0]]}
    traj = {}
    for tag, tr in trackers.items():
        tr.initialize([fr[0], tir[0]], init)
        fv = np.stack(fr[1:])
        fi = np.stack([t[..., 0] for t in tir[1:]])
        traj[tag] = np.asarray(tr.track_chunk(fv, fi, fetch=True))
    d72_iou = _iou(traj["f32"], traj["bf16"])
    d72_cd = _center_dist(traj["f32"], traj["bf16"])
    gt72 = gt[1:]
    acc72 = {tag: float(_iou(traj[tag], gt72).mean()) for tag in traj}

    # ---- leg 3: long-sequence soak (~1200 frames) ------------------------
    dsl = SyntheticRGBT(n_sequences=1, n_frames=1200, H=360, W=480)
    frl, tirl, gtl = dsl._seq(0)
    initl = {"init_bbox": [float(v) for v in gtl[0]]}
    trajl = {}
    for tag, tr in trackers.items():
        tr.initialize([frl[0], tirl[0]], initl)
        outs = []
        for lo in range(1, 1200, 300):                  # bounded uploads
            hi = min(lo + 300, 1200)
            fv = np.stack(frl[lo:hi])
            fi = np.stack([t[..., 0] for t in tirl[lo:hi]])
            outs.append(np.asarray(tr.track_chunk(fv, fi, fetch=True)))
        trajl[tag] = np.concatenate(outs, axis=0)
    dl_iou = _iou(trajl["f32"], trajl["bf16"])
    dl_cd = _center_dist(trajl["f32"], trajl["bf16"])
    gtl_ = gtl[1:]
    accl = {tag: float(_iou(trajl[tag], gtl_).mean()) for tag in trajl}

    def _at(arr, idx):
        return round(float(arr[min(idx, len(arr) - 1)]), 4)

    out = {
        "checkpoint": os.path.basename(ckpt),
        "benchmark_tables": tables,
        "benchmark_deltas": {k: round(tables["bf16"][k] - tables["f32"][k], 3)
                             for k in tables["f32"]},
        "result_rows_identical_frac": round(n_ident / max(n_rows, 1), 4),
        "result_max_int_deviation_px": max_dev,
        "stress72": {
            "iou_f32_vs_bf16_mean": round(float(d72_iou.mean()), 4),
            "iou_f32_vs_bf16_min": round(float(d72_iou.min()), 4),
            "center_dist_px_mean": round(float(d72_cd.mean()), 3),
            "center_dist_px_max": round(float(d72_cd.max()), 3),
            "gt_iou_f32": round(acc72["f32"], 4),
            "gt_iou_bf16": round(acc72["bf16"], 4),
        },
        "soak1200": {
            "iou_f32_vs_bf16_mean": round(float(dl_iou.mean()), 4),
            "iou_f32_vs_bf16_min": round(float(dl_iou.min()), 4),
            "center_dist_px_mean": round(float(dl_cd.mean()), 3),
            "center_dist_px_max": round(float(dl_cd.max()), 3),
            "center_dist_px_at": {str(k): _at(dl_cd, k)
                                  for k in (100, 300, 600, 900, 1198)},
            "gt_iou_f32": round(accl["f32"], 4),
            "gt_iou_bf16": round(accl["bf16"], 4),
        },
        "flow": "trained flagship ckpt; f32 vs bf16 create_tracker through "
                "run_sequence+analysis (12-seq hard set), 72-frame stress, "
                "1200-frame soak; one v5e chip",
    }
    path = os.path.join(REPO, "artifacts", args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
