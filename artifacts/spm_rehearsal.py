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
  3. score-separation probes: positives = tracked frames of a held-out
     sequence; negatives = (a) the same frames with the target erased,
     (b) frames of a different sequence (re-id);
  4. GATING TRACE (mixformer_cvt_online.py:142-168 parity): track a held-out
     DISAPPEARANCE sequence end-to-end with RGBTOnlineTrackerJit and record,
     per commit, whether the interval-gated update accepted a >0.5-scoring
     candidate or was REJECTED back to the base template — absent-stretch
     commits must reject; post-reappearance tracking must re-lock;
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
        ckpt2 = args.skip_train
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
        ckpts = sorted(glob.glob(os.path.join(work, "train2", "checkpoints",
                                              "**", "*.msgpack"), recursive=True))
        assert ckpts, "stage-2 produced no checkpoint"
        ckpt2 = ckpts[-1]
    print(f"    stage-2 checkpoint: {ckpt2}", flush=True)

    print("[3/4] score-separation probes", flush=True)
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
    variables = jax.jit(
        lambda r, a, b, c: model.init(r, a, b, c, run_score_head=True)
    )(jax.random.PRNGKey(0), tz, tz, sz)
    variables = ckpt_lib.load_variables(ckpt2, variables)

    # held-out renders: the trainer's SyntheticRGBTHard uses seed_base=0,
    # ids 0..11; seed_base=200 here guarantees unseen sequences
    ds_pos = SyntheticRGBTHard(n_sequences=2, n_frames=60, seed_base=200,
                               absent_every=0)
    fr_pos, tir_pos, gt_pos, _ = ds_pos._seq(0)
    fr_neg, tir_neg, _, _ = ds_pos._seq(1)

    def make_tracker(update_interval=10):
        return RGBTOnlineTrackerJit(
            model=model, variables=variables,
            template_factor=cfg.TEST.TEMPLATE_FACTOR,
            template_size=cfg.TEST.TEMPLATE_SIZE,
            search_factor=cfg.TEST.SEARCH_FACTOR,
            search_size=cfg.TEST.SEARCH_SIZE, update_interval=update_interval)

    tracker = make_tracker()
    tracker.initialize([fr_pos[0], tir_pos[0]],
                       {"init_bbox": [float(v) for v in gt_pos[0]]})
    pos_scores, ious = [], []
    for k in range(1, 31):
        out = tracker.track([fr_pos[k], tir_pos[k]])
        pos_scores.append(out["pred_score"])
        ious.append(_iou(np.asarray(out["target_bbox"]), gt_pos[k]))

    # negatives, two kinds:
    #  (a) TARGET-ABSENT: the same sequence with the target square erased
    #      (repainted with background-statistics noise);
    #  (b) RE-ID: frames from ANOTHER sequence (different-looking target).
    erase_rng = np.random.default_rng(99)
    fr_abs, tir_abs = [], []
    for k in range(31):
        f = fr_pos[k].copy()
        x, y, w, h = [int(v) for v in gt_pos[k]]
        f[y:y + h, x:x + w] = erase_rng.integers(
            20, 90, (h, w, 3), dtype=np.uint8)
        fr_abs.append(f)
        g = 255 - (0.299 * f[..., 0] + 0.587 * f[..., 1]
                   + 0.114 * f[..., 2]).astype(np.uint8)
        tir_abs.append(np.stack([g, g, g], axis=-1))
    tracker.initialize([fr_pos[0], tir_pos[0]],
                       {"init_bbox": [float(v) for v in gt_pos[0]]})
    neg_scores = [tracker.track([fr_abs[k], tir_abs[k]])["pred_score"]
                  for k in range(1, 31)]
    tracker.initialize([fr_pos[0], tir_pos[0]],
                       {"init_bbox": [float(v) for v in gt_pos[0]]})
    reid_scores = [tracker.track([fr_neg[k], tir_neg[k]])["pred_score"]
                   for k in range(1, 31)]

    print("[4/4] disappearance gating trace", flush=True)
    ds_abs = SyntheticRGBTHard(n_sequences=1, n_frames=60, seed_base=300,
                               absent_every=1)     # true mid-seq disappearance
    fr_d, tir_d, gt_d, vis_d = ds_abs._seq(0)
    absent = ~vis_d
    a_first, a_last = int(np.argmax(absent)), 59 - int(np.argmax(absent[::-1]))
    interval = 10
    tr = make_tracker(update_interval=interval)
    tr.initialize([fr_d[0], tir_d[0]],
                  {"init_bbox": [float(v) for v in gt_d[0]]})
    base_t = np.asarray(tr._state.template_v)
    frames_log, commits = [], []
    for k in range(1, 60):
        out = tr.track([fr_d[k], tir_d[k]])
        st = tr._state
        frames_log.append({
            "frame": k, "visible": bool(vis_d[k]),
            "score": round(float(out["pred_score"]), 4),
            "iou": round(_iou(np.asarray(out["target_bbox"]), gt_d[k]), 4)
            if vis_d[k] else None,
        })
        if k % interval == 0:
            # commit just happened inside the jitted step: accepted iff the
            # committed online template differs from the base template (the
            # candidate slot is reset to base after every commit, so a
            # no->0.5-candidate interval commits base = REJECTION)
            committed = np.asarray(st.online_template_v)
            accepted = not np.array_equal(committed, base_t)
            commits.append({"frame": k, "accepted": bool(accepted),
                            "during_absence": bool(absent[max(k - interval, 1):k + 1].any())})
    pos_d = [f["score"] for f in frames_log if f["visible"]]
    abs_d = [f["score"] for f in frames_log if not f["visible"]]
    post = [f for f in frames_log if f["frame"] > a_last and f["visible"]]
    relock_iou = float(np.mean([f["iou"] for f in post[-10:]])) if post else None

    def _auc(p_, n_):
        p_, n_ = np.asarray(p_), np.asarray(n_)
        return float(np.mean(p_[:, None] > n_[None, :])
                     + 0.5 * np.mean(p_[:, None] == n_[None, :]))

    pos, neg, reid = (np.asarray(pos_scores), np.asarray(neg_scores),
                      np.asarray(reid_scores))
    rejected_during_absence = [c for c in commits if c["during_absence"]
                               and not c["accepted"]]
    accepted_elsewhere = [c for c in commits if not c["during_absence"]
                          and c["accepted"]]
    out = {
        "stage2_checkpoint": os.path.basename(ckpt2),
        "config": args.config,
        "pos_score_mean": round(float(pos.mean()), 4),
        "pos_score_min": round(float(pos.min()), 4),
        "absent_score_mean": round(float(neg.mean()), 4),
        "absent_score_max": round(float(neg.max()), 4),
        "separation_auc_target_absent": round(_auc(pos, neg), 4),
        "reid_score_mean": round(float(reid.mean()), 4),
        "separation_auc_reid": round(_auc(pos, reid), 4),
        "tracking_iou_mean_pos_seq": round(float(np.mean(ious)), 4),
        "trace": {
            "absent_frames": [a_first, a_last],
            "visible_score_mean": round(float(np.mean(pos_d)), 4),
            "absent_stretch_score_mean": round(float(np.mean(abs_d)), 4),
            "absent_stretch_score_max": round(float(np.max(abs_d)), 4),
            "commits": commits,
            "n_commits_rejected_during_absence": len(rejected_during_absence),
            "n_commits_accepted_outside": len(accepted_elsewhere),
            "relock_iou_after_reappearance": round(relock_iou, 4)
            if relock_iou is not None else None,
        },
        "flow": f"stage1 -> stage2({args.config}, score-only BCE, cls sampler"
                " w/ real invisible frames) -> gated online tracker trace,"
                " one v5e chip",
    }
    path = os.path.join(REPO, "artifacts", args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
