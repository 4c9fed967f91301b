"""Training actually LEARNS: loss descends across epochs on the synthetic
RGBT task and the trained checkpoint tracks measurably better than the
random-init model. Guards the full loss->grad->update chain (a sign error in
the CIoU gradients through the one-hot CE select/scatter path would pass
every other test; cf. reference val cycle lib/train/trainers/rgbt_trainer.py
:117-130, which only eyeballs the numbers)."""
import json
import os

import numpy as np
import pytest

import jax

from test_trainer import _tiny_cfg, _tiny_trainer

N_EPOCHS = 8


@pytest.fixture(scope="module")
def learned(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("learn")
    cfg = _tiny_cfg(tmp_path)
    cfg.TRAIN.EPOCH = N_EPOCHS
    cfg.DATA.TRAIN.SAMPLE_PER_EPOCH = 64
    cfg.TRAIN.LR = 1e-3
    # exercise the CE keep-rate schedule mid-run (synthetic_smoke.yaml recipe)
    cfg.TRAIN.CE_START_EPOCH = 1
    cfg.TRAIN.CE_WARM_EPOCH = 1
    tr = _tiny_trainer(cfg, tmp_path)
    init_vars = {"params": jax.device_get(tr.state.params),
                 "batch_stats": jax.device_get(tr.state.batch_stats)}
    tr.train(max_epochs=N_EPOCHS, fail_safe=False)
    return tr, tmp_path, cfg, init_vars


def _epoch_losses(tmp_path):
    path = os.path.join(str(tmp_path), "logs", "asymmetric_shared_ce",
                        "metrics.jsonl")
    by_epoch = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("loader") == "train" and "Loss/total" in rec:
                by_epoch[rec["epoch"]] = rec["Loss/total"]
    return [by_epoch[e] for e in sorted(by_epoch)]


def test_loss_descends(learned):
    _, tmp_path, _, _ = learned
    losses = _epoch_losses(tmp_path)
    assert len(losses) == N_EPOCHS
    # monotone-ish: strictly better than epoch 1 by a clear margin, and the
    # best epoch is not the first
    assert losses[-1] < 0.8 * losses[0], losses
    assert min(losses) < losses[0], losses


def _mean_iou(model, variables, cfg, n_seq=2, n_frames=30):
    from multi_modal_tracking_tpu.tracking.tracker import RGBTTrackerJit
    from multi_modal_tracking_tpu.train.data.datasets.synthetic import SyntheticRGBT

    src = SyntheticRGBT(n_sequences=n_seq, n_frames=n_frames)
    ious = []
    for k in range(n_seq):
        frames, tir, gt = src._seq(k)
        tr = RGBTTrackerJit(model=model, variables=variables,
                            template_factor=cfg.TEST.TEMPLATE_FACTOR,
                            template_size=cfg.DATA.TEMPLATE.SIZE,
                            search_factor=cfg.TEST.SEARCH_FACTOR,
                            search_size=cfg.DATA.SEARCH.SIZE,
                            update_interval=10_000)
        tr.initialize([frames[0], tir[0]], {"init_bbox": gt[0]})
        for t in range(1, n_frames):
            box = np.asarray(
                tr.track([frames[t], tir[t]])["target_bbox"], np.float64)
            g = gt[t].astype(np.float64)
            x1, y1 = max(box[0], g[0]), max(box[1], g[1])
            x2 = min(box[0] + box[2], g[0] + g[2])
            y2 = min(box[1] + box[3], g[1] + g[3])
            inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
            union = box[2] * box[3] + g[2] * g[3] - inter
            ious.append(inter / union if union > 0 else 0.0)
    return float(np.mean(ious))


def test_tracking_improves_over_random_init(learned):
    tr, _, cfg, init_vars = learned
    trained_vars = {"params": jax.device_get(tr.state.params),
                    "batch_stats": jax.device_get(tr.state.batch_stats)}
    iou_random = _mean_iou(tr.model, init_vars, cfg)
    iou_trained = _mean_iou(tr.model, trained_vars, cfg)
    # the trained tiny model must clearly beat its random init on the
    # synthetic moving-square task. Relative margin, not an absolute one:
    # the absolute IoU at this tiny geometry shifts with init/CE details
    # (0.081 with ALL-rows CE pooling, 0.037 once tiny grids got true
    # CTR_POINT semantics) while the trained/random ratio stays >> 10x.
    assert iou_trained > max(10 * iou_random, 0.02), (iou_random, iou_trained)
