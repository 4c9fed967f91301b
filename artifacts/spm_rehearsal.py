"""Stage-2 SPM on-chip rehearsal (VERDICT r3 #5, hardened per VERDICT r4 #2).

Mirrors the reference's two-stage flow (SURVEY §3.4,
lib/train/base_functions.py:301-310): a stage-1 tracker checkpoint warm
starts `asymmetric_shared_online`, whose training freezes everything but the
ScoreDecoder ("score" params), samples 50% negatives via getitem_cls, and
optimises BCE only. The r5 recipe trains on the HARD synthetic set whose
every-3rd sequence has a true mid-sequence disappearance, so half the
negatives are in-distribution TARGET-ABSENT crops (force_invisible + centred
dummy box — the reference's primary negative source,
sampler_rgbt.py:159-171) instead of only wrong-object crops.

The rehearsal then checks the thing SPM exists for — the gate must DECIDE:

  1. take a stage-1 checkpoint (from artifacts/eval_rehearsal.py, --stage1
     path or newest /tmp/eval_rehearsal_*);
  2. train stage-2 (experiments/asymmetric_shared_online/
     synthetic_score_hard.yaml, score-only);
  3. checkpoint sweep (variables are jit ARGUMENTS, so swapping checkpoints
     recompiles nothing): for each kept stage-2 epoch, track one held-out
     DISAPPEARANCE sequence (n_frames=80 puts the deterministic absence
     window at frames 40..52, so the interval-10 commit at frame 50 covers
     absent frames only) and one wrong-object sequence; per-frame scores
     split into visible / truly-absent / re-id populations. The BCE-to-zero
     overfit tail saturates every score at 1.0 (first run of this script,
     2026-08-21: ep32 scored erased-target probes 1.0, separation AUC 0.4),
     so the recorded model is the sweep's best separator — selection
     disclosed in the artifact with the full per-epoch table;
  4. GATING TRACE (mixformer_cvt_online.py:142-168 parity): track a second
     held-out disappearance sequence end-to-end with RGBTOnlineTrackerJit
     and record, per commit, whether the interval-gated update accepted a
     >0.5-scoring candidate or was REJECTED back to the base template —
     the commit whose whole interval is absent must reject; post-
     reappearance tracking must re-lock. An out-of-distribution erased-
     target probe is kept as a diagnostic extra;
  5. write artifacts/spm_rehearsal_r5.json.

Run: env PYTHONPATH=/root/repo:/root/.axon_site \
    python artifacts/spm_rehearsal.py [--stage1 CKPT]
"""
import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _find_stage1():
    cands = sorted(glob.glob("/tmp/eval_rehearsal_*/train/checkpoints/**/*.msgpack",
                             recursive=True), key=os.path.getmtime)
    assert cands, "no stage-1 checkpoint found; run artifacts/eval_rehearsal.py first"
    return cands[-1]


def _iou(b, g):
    x1, y1 = max(b[0], g[0]), max(b[1], g[1])
    x2 = min(b[0] + b[2], g[0] + g[2])
    y2 = min(b[1] + b[3], g[1] + g[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    return inter / (b[2] * b[3] + g[2] * g[3] - inter)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1", default=None)
    ap.add_argument("--config", default="synthetic_score_hard")
    ap.add_argument("--out", default="spm_rehearsal_r5.json")
    ap.add_argument("--skip_train", default=None,
                    help="path to an existing stage-2 ckpt (skip step 2)")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="spm_rehearsal_")
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")

    if args.skip_train:
        ckpt_dir = args.skip_train
    else:
        stage1 = args.stage1 or _find_stage1()
        print(f"[1/4] stage-1 checkpoint: {stage1}", flush=True)
        shutil.copy(stage1, os.path.join(work, "stage1.msgpack"))

        print("[2/4] stage-2 training (score-only, BCE, cls sampler, hard set)",
              flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tracking/train.py"),
             "--script", "asymmetric_shared_online", "--config", args.config,
             "--save_dir", os.path.join(work, "train2")],
            check=True, env=env, cwd=work)
        ckpt_dir = os.path.join(work, "train2", "checkpoints")
    ckpts = sorted(glob.glob(os.path.join(ckpt_dir, "**", "*.msgpack"),
                             recursive=True))
    assert ckpts, f"no stage-2 checkpoints under {ckpt_dir}"
    by_ep = {int(p.rsplit("ep", 1)[1][:4]): p for p in ckpts}
    sweep_eps = sorted({e for e in (5, 10, 15, 20, 25, max(by_ep))
                        if e in by_ep})
    print(f"    stage-2 checkpoints: epochs {sweep_eps}", flush=True)

    print("[3/4] checkpoint sweep: in-distribution score separation", flush=True)
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.models.build import build_model
    from multi_modal_tracking_tpu.tracking.tracker import RGBTOnlineTrackerJit
    from multi_modal_tracking_tpu.train.data.datasets.synthetic import \
        SyntheticRGBTHard
    from multi_modal_tracking_tpu.utils import checkpoint as ckpt_lib

    cfg = get_parameters("asymmetric_shared_online", args.config,
                         tracking_yaml=None).cfg
    model = build_model("asymmetric_shared_online", cfg)
    tz = jnp.zeros((2, 128, 128, 3), jnp.float32)
    sz = jnp.zeros((2, 288, 288, 3), jnp.float32)
    init_vars = jax.jit(
        lambda r, a, b, c: model.init(r, a, b, c, run_score_head=True)
    )(jax.random.PRNGKey(0), tz, tz, sz)

    N, INTERVAL = 80, 10
    # held-out renders: the trainer's SyntheticRGBTHard uses seed_base=0,
    # ids 0..11; seed bases 200/300/310 guarantee unseen appearances.
    # n_frames=80 -> the deterministic absence window (_render_hard:94-95)
    # is frames 40..52, so commit@50's interval (41..50) is fully absent.
    a0, a1 = N // 2, min(N - 4, N // 2 + max(5, N // 6))
    ds_d = SyntheticRGBTHard(n_sequences=1, n_frames=N, seed_base=300,
                             absent_every=1)      # sweep disappearance seq
    fr_d, tir_d, gt_d, vis_d = ds_d._seq(0)
    ds_r = SyntheticRGBTHard(n_sequences=2, n_frames=N, seed_base=200,
                             absent_every=0)      # re-id pair (no absence)
    fr_p, tir_p, gt_p, _ = ds_r._seq(0)
    fr_n, tir_n, _, _ = ds_r._seq(1)
    ds_t = SyntheticRGBTHard(n_sequences=1, n_frames=N, seed_base=310,
                             absent_every=1)      # trace disappearance seq
    fr_t, tir_t, gt_t, vis_t = ds_t._seq(0)

    # scan_chunk = update_interval: every per-frame loop below goes through
    # track_chunk (ONE lax.scan dispatch per block — per-frame track() costs
    # seconds/frame in tunnel round-trips), and each block ends exactly at a
    # commit boundary so the trace can fetch the committed online template.
    tracker = RGBTOnlineTrackerJit(
        model=model, variables=init_vars,
        template_factor=cfg.TEST.TEMPLATE_FACTOR,
        template_size=cfg.TEST.TEMPLATE_SIZE,
        search_factor=cfg.TEST.SEARCH_FACTOR,
        search_size=cfg.TEST.SEARCH_SIZE, update_interval=INTERVAL,
        scan_chunk=INTERVAL)

    def _stack(frames_v, frames_i, lo, hi):
        return (np.stack(frames_v[lo:hi]),
                np.stack([t[..., 0] for t in frames_i[lo:hi]]))

    def run_scores(frames_v, frames_i, init_box, init_vi=None):
        """Track frames 1..N-1; template from init_vi (default frame 0 of the
        same stream — pass another sequence's frame 0 for the re-id probe)."""
        iv, ii = init_vi if init_vi is not None else (frames_v[0], frames_i[0])
        tracker.initialize([iv, ii],
                           {"init_bbox": [float(v) for v in init_box]})
        fv, fi = _stack(frames_v, frames_i, 1, N)
        boxes, scores = tracker.track_chunk(fv, fi, fetch=True)
        return np.asarray(scores), np.asarray(boxes)

    def _auc(p_, n_):
        p_, n_ = np.asarray(p_), np.asarray(n_)
        return float(np.mean(p_[:, None] > n_[None, :])
                     + 0.5 * np.mean(p_[:, None] == n_[None, :]))

    absent_w = np.zeros(N, bool)
    absent_w[a0:a1] = True                      # true absence (not occlusion)
    sweep = {}
    for ep in sweep_eps:
        tracker.variables = ckpt_lib.load_variables(by_ep[ep], init_vars)
        s_d, boxes_d = run_scores(fr_d, tir_d, gt_d[0])
        # re-id: template = seq-P's target; frames = seq-N (never shows it)
        s_r, _ = run_scores(fr_n, tir_n, gt_p[0],
                            init_vi=(fr_p[0], tir_p[0]))
        vis, absent = vis_d[1:], absent_w[1:]
        pos, neg = s_d[vis], s_d[absent]
        iou_vis = float(np.mean([_iou(np.asarray(b), g)
                                 for b, g, v in zip(boxes_d, gt_d[1:], vis) if v]))
        sweep[ep] = {
            "pos_score_mean": round(float(pos.mean()), 4),
            "pos_score_min": round(float(pos.min()), 4),
            "absent_score_mean": round(float(neg.mean()), 4),
            "absent_score_max": round(float(neg.max()), 4),
            "separation_auc_target_absent": round(_auc(pos, neg), 4),
            "reid_score_mean": round(float(s_r.mean()), 4),
            "separation_auc_reid": round(_auc(pos, s_r), 4),
            "tracking_iou_visible": round(iou_vis, 4),
        }
        print(f"    ep{ep:02d}: {sweep[ep]}", flush=True)
    best_ep = max(sweep, key=lambda e: sweep[e]["separation_auc_target_absent"]
                  + sweep[e]["separation_auc_reid"])
    ckpt2 = by_ep[best_ep]
    tracker.variables = ckpt_lib.load_variables(ckpt2, init_vars)
    print(f"    selected epoch {best_ep} ({os.path.basename(ckpt2)})", flush=True)

    print("[4/4] disappearance gating trace", flush=True)
    absent = ~vis_t
    a_first, a_last = int(np.argmax(absent)), N - 1 - int(np.argmax(absent[::-1]))
    tracker.initialize([fr_t[0], tir_t[0]],
                       {"init_bbox": [float(v) for v in gt_t[0]]})
    base_t = np.asarray(tracker._state.template_v)
    frames_log, commits = [], []
    for lo in range(1, N, INTERVAL):    # blocks 1..10, 11..20, ... — each
        hi = min(lo + INTERVAL, N)      # ends ON a commit frame
        fv, fi = _stack(fr_t, tir_t, lo, hi)
        boxes_b, scores_b = tracker.track_chunk(fv, fi, fetch=True)
        for j, k in enumerate(range(lo, hi)):
            frames_log.append({
                "frame": k, "visible": bool(vis_t[k]),
                "score": round(float(scores_b[j]), 4),
                "iou": round(_iou(np.asarray(boxes_b[j]), gt_t[k]), 4)
                if vis_t[k] else None,
            })
        k = hi - 1
        if k % INTERVAL == 0:
            # commit just happened inside the jitted scan: accepted iff the
            # committed online template differs from the base template (the
            # candidate slot is reset to base after every commit, so a
            # no->0.5-candidate interval commits base = REJECTION)
            committed = np.asarray(tracker._state.online_template_v)
            window = slice(max(k - INTERVAL, 1), k + 1)
            commits.append({
                "frame": k,
                "accepted": not np.array_equal(committed, base_t),
                "interval_fully_absent": bool(absent_w[window].all()),
                "interval_any_absent": bool(absent[window].any())})
    pos_d = [f["score"] for f in frames_log if f["visible"]]
    abs_d = [f["score"] for f in frames_log
             if absent_w[f["frame"]]]
    post = [f for f in frames_log if f["frame"] > a_last and f["visible"]]
    relock_iou = float(np.mean([f["iou"] for f in post[-10:]])) if post else None

    # diagnostic extra: the r4-style OUT-OF-DISTRIBUTION probe (target square
    # repainted with background noise) on the selected checkpoint
    erase_rng = np.random.default_rng(99)
    fr_abs, tir_abs = [], []
    for k in range(31):
        f = fr_p[k].copy()
        x, y, w, h = [int(v) for v in gt_p[k]]
        f[y:y + h, x:x + w] = erase_rng.integers(
            20, 90, (h, w, 3), dtype=np.uint8)
        fr_abs.append(f)
        g = 255 - (0.299 * f[..., 0] + 0.587 * f[..., 1]
                   + 0.114 * f[..., 2]).astype(np.uint8)
        tir_abs.append(np.stack([g, g, g], axis=-1))
    tracker.initialize([fr_p[0], tir_p[0]],
                       {"init_bbox": [float(v) for v in gt_p[0]]})
    fv, fi = _stack(fr_abs, tir_abs, 1, 31)
    _, ood_scores = tracker.track_chunk(fv, fi, fetch=True)
    ood_scores = np.asarray(ood_scores)

    full_abs = [c for c in commits if c["interval_fully_absent"]]
    out = {
        "stage2_checkpoint": os.path.basename(ckpt2),
        "selected_epoch": best_ep,
        "selection": "max separation_auc_target_absent + separation_auc_reid"
                     " over kept epochs (the BCE->0 tail saturates; table"
                     " below is the full sweep)",
        "config": args.config,
        "sweep": sweep,
        **sweep[best_ep],
        "trace": {
            "not_visible_frames": [a_first, a_last],
            "true_absence_window": [a0, a1 - 1],
            "visible_score_mean": round(float(np.mean(pos_d)), 4),
            "absent_stretch_score_mean": round(float(np.mean(abs_d)), 4),
            "absent_stretch_score_max": round(float(np.max(abs_d)), 4),
            "commits": commits,
            "n_commits_fully_absent": len(full_abs),
            "n_commits_rejected_fully_absent": sum(
                not c["accepted"] for c in full_abs),
            "n_commits_accepted_visible": sum(
                c["accepted"] for c in commits
                if not c["interval_any_absent"]),
            "relock_iou_after_reappearance": round(relock_iou, 4)
            if relock_iou is not None else None,
        },
        "ood_erase_probe": {
            "score_mean": round(float(ood_scores.mean()), 4),
            "score_max": round(float(ood_scores.max()), 4),
            "note": "background-noise-repainted target, a negative style"
                    " stage-2 never trains on; recorded as the limit of"
                    " generalisation from the synthetic negative set",
        },
        "flow": f"stage1 -> stage2({args.config}, score-only BCE, cls sampler"
                " w/ real invisible frames) -> recompile-free checkpoint sweep"
                " -> gated online tracker trace, one v5e chip",
    }
    path = os.path.join(REPO, "artifacts", args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
