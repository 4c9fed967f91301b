"""Stage-2 SPM on-chip rehearsal (VERDICT r3 next-round #5).

Mirrors the reference's two-stage flow (SURVEY §3.4,
lib/train/base_functions.py:301-310): a stage-1 tracker checkpoint warm
starts `asymmetric_shared_online`, whose training freezes everything but the
ScoreDecoder ("score" params), samples 50% negatives via getitem_cls, and
optimises BCE only. The rehearsal then checks the thing SPM exists for:
pred_score must SEPARATE on-target from off-target frames, and the
score-gated online tracker must run end-to-end from the stage-2 checkpoint.

  1. take a stage-1 checkpoint (from artifacts/eval_rehearsal.py's
     synthetic_learn run, --stage1 path or newest /tmp/eval_rehearsal_*);
  2. train stage-2 (experiments/asymmetric_shared_online/
     synthetic_score.yaml, score-only, 8 epochs on the synthetic set);
  3. positives: RGBTOnlineTrackerJit tracks a held-out synthetic sequence it
     was initialised on (target present at the tracked location);
     negatives: the SAME tracker state fed frames from a DIFFERENT sequence
     (background where it looks); record the per-frame sigmoid scores;
  4. write artifacts/spm_rehearsal_r4.json with the separation stats.

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1", default=None)
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
        print(f"[1/3] stage-1 checkpoint: {stage1}", flush=True)
        shutil.copy(stage1, os.path.join(work, "stage1.msgpack"))

        print("[2/3] stage-2 training (score-only, BCE, cls sampler)", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tracking/train.py"),
             "--script", "asymmetric_shared_online", "--config", "synthetic_score",
             "--save_dir", os.path.join(work, "train2")],
            check=True, env=env, cwd=work)
        ckpts = sorted(glob.glob(os.path.join(work, "train2", "checkpoints",
                                              "**", "*.msgpack"), recursive=True))
        assert ckpts, "stage-2 produced no checkpoint"
        ckpt2 = ckpts[-1]
    print(f"    stage-2 checkpoint: {ckpt2}", flush=True)

    print("[3/3] score-separation probe with the online tracker", flush=True)
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.models.build import build_model
    from multi_modal_tracking_tpu.tracking.tracker import RGBTOnlineTrackerJit
    from multi_modal_tracking_tpu.train.data.datasets.synthetic import SyntheticRGBT
    from multi_modal_tracking_tpu.utils import checkpoint as ckpt_lib

    cfg = get_parameters("asymmetric_shared_online", "synthetic_score",
                         tracking_yaml=None).cfg
    model = build_model("asymmetric_shared_online", cfg)
    tz = jnp.zeros((2, 128, 128, 3), jnp.float32)
    sz = jnp.zeros((2, 288, 288, 3), jnp.float32)
    variables = jax.jit(
        lambda r, a, b, c: model.init(r, a, b, c, run_score_head=True)
    )(jax.random.PRNGKey(0), tz, tz, sz)
    variables = ckpt_lib.load_variables(ckpt2, variables)

    ds = SyntheticRGBT(n_sequences=10, n_frames=40)
    # held-out sequences (the train sampler uses ids 0..7 of its own instance;
    # ids 8/9 here are new renders)
    fr_pos, tir_pos, gt_pos = ds._seq(8)
    fr_neg, tir_neg, _ = ds._seq(9)

    tracker = RGBTOnlineTrackerJit(
        model=model, variables=variables,
        template_factor=cfg.TEST.TEMPLATE_FACTOR,
        template_size=cfg.TEST.TEMPLATE_SIZE,
        search_factor=cfg.TEST.SEARCH_FACTOR,
        search_size=cfg.TEST.SEARCH_SIZE, update_interval=10)

    tracker.initialize([fr_pos[0], tir_pos[0]],
                       {"init_bbox": [float(v) for v in gt_pos[0]]})
    pos_scores, ious = [], []
    for k in range(1, 31):
        out = tracker.track([fr_pos[k], tir_pos[k]])
        pos_scores.append(out["pred_score"])
        b, g = np.asarray(out["target_bbox"]), gt_pos[k]
        x1, y1 = max(b[0], g[0]), max(b[1], g[1])
        x2 = min(b[0] + b[2], g[0] + g[2])
        y2 = min(b[1] + b[3], g[1] + g[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ious.append(inter / (b[2] * b[3] + g[2] * g[3] - inter))

    # negatives, two kinds:
    #  (a) TARGET-ABSENT: the same sequence with the target square erased
    #      (repainted with background-statistics noise) — the SPM's core
    #      question "is the target present where I looked?"
    #  (b) RE-ID: frames from ANOTHER sequence (a different-looking target
    #      present) — the harder re-identification question
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

    def _auc(p_, n_):
        p_, n_ = np.asarray(p_), np.asarray(n_)
        return float(np.mean(p_[:, None] > n_[None, :])
                     + 0.5 * np.mean(p_[:, None] == n_[None, :]))

    pos, neg, reid = (np.asarray(pos_scores), np.asarray(neg_scores),
                      np.asarray(reid_scores))
    out = {
        "stage2_checkpoint": os.path.basename(ckpt2),
        "pos_score_mean": round(float(pos.mean()), 4),
        "pos_score_min": round(float(pos.min()), 4),
        "absent_score_mean": round(float(neg.mean()), 4),
        "absent_score_max": round(float(neg.max()), 4),
        "separation_auc_target_absent": round(_auc(pos, neg), 4),
        "reid_score_mean": round(float(reid.mean()), 4),
        "separation_auc_reid": round(_auc(pos, reid), 4),
        "tracking_iou_mean_pos_seq": round(float(np.mean(ious)), 4),
        "flow": "stage1(synthetic_learn) -> stage2(synthetic_score, score-only"
                " BCE, cls sampler) -> score-gated online tracker, one v5e chip",
    }
    path = os.path.join(REPO, "artifacts", "spm_rehearsal_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
