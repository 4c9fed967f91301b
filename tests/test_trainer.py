"""Trainer epoch-loop tests on the synthetic RGBT dataset with a tiny model:
checkpoint/resume exactness, fail-safe restart, stats logging.
(The reference has no such tests; parity via SURVEY.md §4/§5 semantics.)"""
import dataclasses
import os

import numpy as np
import pytest

from multi_modal_tracking_tpu.config import get_default_config


def _tiny_cfg(tmp_path):
    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32
    cfg.DATA.TRAIN.DATASETS_NAME = ["SyntheticRGBT"]
    cfg.DATA.TRAIN.DATASETS_RATIO = [1]
    cfg.DATA.TRAIN.SAMPLE_PER_EPOCH = 8
    cfg.DATA.VAL.DATASETS_NAME = []
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.NUM_WORKER = 0
    cfg.TRAIN.EPOCH = 2
    cfg.TRAIN.PRINT_INTERVAL = 1
    cfg.MODEL.FUSION_LAYERS = 1
    return cfg


def _tiny_trainer(cfg, tmp_path, **kw):
    from multi_modal_tracking_tpu.models.asymmetric_shared import MixFormerRGBT
    from multi_modal_tracking_tpu.train import trainer as trainer_mod

    tr = trainer_mod.Trainer.__new__(trainer_mod.Trainer)
    # Shrink the backbone before expensive init: patch build_model via subclass
    import multi_modal_tracking_tpu.models.build as build_mod
    orig = build_mod.build_model

    def tiny_build(script, cfg_, dtype=None, axis_name=None):
        model = orig(script, cfg_, dtype=dtype, axis_name=axis_name)
        spec = dataclasses.replace(model.spec, depth=2, embed_dim=64, num_heads=2,
                                   head_dim=32, ce_loc=(1,),
                                   ce_keep_ratio=(0.7,))
        return type(model)(spec=spec, with_score=model.with_score, dtype=model.dtype)

    build_mod.build_model = tiny_build
    trainer_mod.build_model = tiny_build
    try:
        kw.setdefault("use_mesh", False)
        kw.setdefault("script", "asymmetric_shared_ce")
        tr.__init__(cfg=cfg, save_dir=str(tmp_path), seed=0, **kw)
    finally:
        build_mod.build_model = orig
        trainer_mod.build_model = orig
    return tr


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("trainer")
    cfg = _tiny_cfg(tmp_path)
    tr = _tiny_trainer(cfg, tmp_path)
    tr.train(max_epochs=2, fail_safe=False)
    return tr, tmp_path, cfg


def test_trainer_runs_and_checkpoints(trained):
    tr, tmp_path, _ = trained
    assert tr.epoch == 2
    ckpts = os.listdir(tr.ckpt_dir)
    assert any("_ep0001" in c for c in ckpts) and any("_ep0002" in c for c in ckpts)
    assert os.path.isfile(os.path.join(str(tmp_path), "logs",
                                       "asymmetric_shared_ce", "metrics.jsonl"))


def test_resume_restores_epoch_and_params(trained):
    tr, tmp_path, cfg = trained
    tr2 = _tiny_trainer(cfg, tmp_path)
    assert tr2.load_checkpoint()
    assert tr2.epoch == 2
    import jax
    a = jax.tree.leaves(tr.state.params)
    b = jax.tree.leaves(tr2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(tr2.state.step) == int(tr.state.step)


def test_fail_safe_restart(trained, tmp_path):
    _, prev_tmp, cfg = trained
    tr = _tiny_trainer(cfg, tmp_path)
    calls = {"n": 0}
    orig_cycle = tr.cycle_dataset

    def flaky(loader, train):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected failure")
        return orig_cycle(loader, train)

    tr.cycle_dataset = flaky
    tr.train(max_epochs=2, fail_safe=True)
    assert tr.epoch == 2          # recovered and finished
    assert calls["n"] >= 3


def test_keep_rate_schedule_reference_mapping(tmp_path):
    """CE keep-rate schedule maps config keys exactly as the reference actor
    (actors/mixformer_rgbt.py:72-80): keep 1.0 while epoch < CE_START_EPOCH,
    cosine-anneal to CE_KEEP_RATIO[0] by CE_START_EPOCH + CE_WARM_EPOCH."""
    import math
    cfg = _tiny_cfg(tmp_path)
    cfg.TRAIN.CE_START_EPOCH = 4
    cfg.TRAIN.CE_WARM_EPOCH = 8
    cfg.MODEL.BACKBONE.CE_KEEP_RATIO = [0.7, 0.7, 0.7]
    tr = _tiny_trainer(cfg, tmp_path)
    from multi_modal_tracking_tpu.train.train_step import bucketize_keep_rate
    n_search = (cfg.DATA.SEARCH.SIZE // 16) ** 2

    assert tr._keep_rate(1) == 1.0          # warmup: full tokens
    assert tr._keep_rate(3) == 1.0
    # mid-anneal epoch 8: reference formula with ITERS_PER_EPOCH=1
    frac = (8 - 4) / 8
    want = 0.7 + 0.3 * (math.cos(frac * math.pi) + 1) / 2
    assert tr._keep_rate(8) == pytest.approx(
        bucketize_keep_rate(want, n_search))
    # fully annealed
    assert tr._keep_rate(12) == pytest.approx(
        bucketize_keep_rate(0.7, n_search))
    assert tr._keep_rate(100) == pytest.approx(
        bucketize_keep_rate(0.7, n_search))


def test_missing_warmstart_path_fails_loudly(tmp_path):
    """A configured-but-absent pretrain path must abort trainer construction
    (the reference's torch.load raises there); silently training from random
    init is unacceptable."""
    cfg = _tiny_cfg(tmp_path)
    cfg.MODEL.RGBT_PRETRAINED_PATH = "./models/does_not_exist.pth.tar"
    with pytest.raises(FileNotFoundError, match="RGBT_PRETRAINED_PATH"):
        _tiny_trainer(cfg, tmp_path)

    cfg2 = _tiny_cfg(tmp_path)
    cfg2.MODEL.BACKBONE.PRETRAINED = True
    cfg2.MODEL.BACKBONE.PRETRAINED_PATH = "./models/missing_mae.pth"
    with pytest.raises(FileNotFoundError, match="BACKBONE.PRETRAINED_PATH"):
        _tiny_trainer(cfg2, tmp_path)


def test_lr_schedule_counts_applied_updates_under_accumulation(tmp_path):
    """TRAIN.ACCUM_ITER>1: optax.MultiSteps advances the inner AdamW step
    count once per accumulation group, so the epoch schedule must be
    expressed in applied updates — the reference's per-epoch StepLR
    (base_functions.py:525-532) drops at real epoch boundaries regardless
    of accum_iter."""
    import jax.numpy as jnp
    import optax

    from multi_modal_tracking_tpu.train.optimizer import make_optimizer

    cfg = get_default_config("mixformer_vit")      # default unimodal regime
    cfg.TRAIN.ACCUM_ITER = 3
    cfg.TRAIN.SCHEDULER.TYPE = "step"
    cfg.TRAIN.LR_DROP_EPOCH = 1
    steps_per_epoch = 6                # loader batches -> 2 updates/epoch

    params = {"box_head": {"w": jnp.ones((4,))}}   # "main" group
    tx = make_optimizer(cfg, params, steps_per_epoch=steps_per_epoch)
    state = tx.init(params)
    g = {"box_head": {"w": jnp.full((4,), 0.5)}}
    deltas, p = [], params
    for _ in range(2 * steps_per_epoch):           # two epochs of batches
        upd, state = tx.update(g, state, p)
        newp = optax.apply_updates(p, upd)
        d = float(jnp.abs(newp["box_head"]["w"] - p["box_head"]["w"]).max())
        if d > 0:
            deltas.append(d)
        p = newp
    assert len(deltas) == 4                        # one update per 3 batches
    # constant grads -> Adam update magnitude ~ lr: epoch-1 updates must be
    # ~10x smaller than epoch-0's (pre-fix they stayed at full LR for 3x
    # too many epochs)
    assert deltas[1] == pytest.approx(deltas[0], rel=0.2)
    assert deltas[2] < 0.3 * deltas[0]
    assert deltas[3] < 0.3 * deltas[0]


def test_stage2_score_training_runs_net_in_eval_mode(tmp_path):
    """SPM stage 2 (train_score): the reference puts the whole net in eval()
    and trains ONLY score_branch (actors/mixformer_rgbt.py:18-26) — corner
    head BN keeps its stage-1 running stats. Pre-fix, the step ran the net
    with train=True and committed re-estimated BN stats on the SPM batch."""
    import dataclasses as _dc
    import functools

    import jax
    import jax.numpy as jnp

    from multi_modal_tracking_tpu.models.build import build_model
    from multi_modal_tracking_tpu.train.optimizer import make_optimizer
    from multi_modal_tracking_tpu.train.train_step import (TrainState,
                                                           make_train_step)

    cfg = get_default_config("asymmetric_shared_online")
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32
    cfg.MODEL.FUSION_LAYERS = 1
    cfg.TRAIN.TRAIN_SCORE = True
    model = build_model("asymmetric_shared_online", cfg)
    spec = _dc.replace(model.spec, depth=2, embed_dim=64, num_heads=2,
                       head_dim=32, ce_loc=())
    model = type(model)(spec=spec, with_score=model.with_score,
                        dtype=model.dtype)

    B = 2
    rng = np.random.default_rng(0)
    mk = lambda s: jnp.asarray(rng.standard_normal((B, s, s, 3)), jnp.float32)
    batch = {
        "template_v": mk(32), "template_i": mk(32),
        "online_template_v": mk(32), "online_template_i": mk(32),
        "search_v": mk(64), "search_i": mk(64),
        "gt_xywh": jnp.asarray(rng.uniform(0.3, 0.4, (B, 4)), jnp.float32),
        "labels": jnp.asarray([1.0, 0.0], jnp.float32),
    }
    tmpl = jnp.zeros((2 * B, 32, 32, 3), jnp.float32)
    srch = jnp.zeros((2 * B, 64, 64, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, run_score_head=True))(
        jax.random.PRNGKey(0), tmpl, tmpl, srch)
    assert variables.get("batch_stats"), "test needs BN stats in the head"

    tx = make_optimizer(cfg, variables["params"], steps_per_epoch=10)
    state = TrainState.create(variables, tx)
    # the step donates its input state: snapshot to host first
    old_stats = jax.tree.map(np.asarray, state.batch_stats)
    old_params = jax.tree.map(np.asarray, state.params)
    step = make_train_step(model, tx, rgbt=True, train_score=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["Loss/total"]))

    # BN running stats untouched by the stage-2 step
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(old_stats)[0],
            jax.tree_util.tree_flatten_with_path(new_state.batch_stats)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # only score params move (the regime freezes everything else)
    flat_old = jax.tree_util.tree_flatten_with_path(old_params)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    moved = {jax.tree_util.keystr(pa) for (pa, a), (_, b) in
             zip(flat_old, flat_new)
             if not np.array_equal(np.asarray(a), np.asarray(b))}
    assert moved and all("score" in k for k in moved), moved


def test_stage2_score_training_runs(tmp_path, trained):
    """Stage-2 SPM regime (SURVEY §3.4): the online script must init THROUGH
    the score head (params exist), warm start from a stage-1 checkpoint with
    strict=False semantics (score branch keeps its init — the reference's
    base_trainer.py:230-272 load_state_dict path), freeze everything but
    "score", and descend a BCE loss on cls batches — the trainer bug where
    the score branch was never initialised left zero trainable tensors and a
    missing-scope crash (found by artifacts/spm_rehearsal.py)."""
    tr1, _, _ = trained
    import glob
    stage1 = sorted(glob.glob(os.path.join(tr1.ckpt_dir, "*.msgpack")))[-1]
    cfg = get_default_config("asymmetric_shared_online")
    cfg.MODEL.TRACKER_PRETRAINED_PATH = stage1
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32
    cfg.DATA.TRAIN.DATASETS_NAME = ["SyntheticRGBT"]
    cfg.DATA.TRAIN.DATASETS_RATIO = [1]
    cfg.DATA.TRAIN.SAMPLE_PER_EPOCH = 8
    cfg.DATA.VAL.DATASETS_NAME = []
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TRAIN.NUM_WORKER = 0
    cfg.TRAIN.EPOCH = 1
    cfg.TRAIN.PRINT_INTERVAL = 1
    cfg.TRAIN.TRAIN_SCORE = True
    cfg.MODEL.FUSION_LAYERS = 1
    tr = _tiny_trainer(cfg, tmp_path, script="asymmetric_shared_online")
    assert tr._n_trainable > 0, "score branch params missing/frozen"
    # the warm start must have copied the stage-1 backbone leaves exactly
    import jax.numpy as jnp
    w1 = tr1.state.params["backbone"]["blocks_0"]
    w2 = tr.state.params["backbone"]["blocks_0"]
    import jax
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), w1, w2)
    # only score params train in stage-2
    from multi_modal_tracking_tpu.train.optimizer import trainable_mask
    mask = trainable_mask(cfg, tr.state.params)
    import jax
    from flax import traverse_util
    flat = traverse_util.flatten_dict(jax.tree.map(bool, mask))
    for path, trainable in flat.items():
        assert trainable == ("score" in "/".join(str(x) for x in path)), path
    tr.train(max_epochs=1, fail_safe=False)
    import json
    metrics_file = os.path.join(str(tmp_path), "logs",
                                "asymmetric_shared_online", "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_file)]
    assert any("Loss/score" in r or "Loss/total" in r for r in rows)
