"""Optimizer, parameter-group LR regimes and schedules.

Parity target: lib/train/base_functions.py:287-533 `get_optimizer_scheduler` —
six freezing / multi-LR regimes over AdamW, selected by TRAIN flags, plus the
step / multi-step epoch schedulers and the MAE-style warmup-cosine
(lib/utils/lr_shed.py:3-17).

TPU-native realisation: torch `requires_grad=False` + param groups become an
optax.multi_transform keyed by a path->group labelling function. Frozen
groups use optax.set_to_zero(); each trainable group gets AdamW with its LR
multiplier folded into a shared epoch schedule. Global grad-norm clipping
(TRAIN.GRAD_CLIP_NORM) and gradient accumulation (TRAIN.ACCUM_ITER, via
optax.MultiSteps) match the reference trainer
(rgbt_trainer.py:83-106).

Note: the reference's `pos_embed` freeze is implicit here — sin-cos position
embeddings are trace-time constants, not parameters.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Tuple

import optax
from flax import traverse_util


def _regime_labeler(cfg) -> Tuple[Callable[[str], str], Dict[str, float]]:
    """Return (path->group fn, group->lr-multiplier; multiplier<0 = frozen)."""
    t = cfg.TRAIN
    train_score = t.get("TRAIN_SCORE", False)
    freeze_stage0 = t.get("FREEZE_STAGE0", False)
    freeze6 = t.get("FREEZE_FIRST_6LAYERS", False)
    rgbt = t.get("RGBT_TRACK", False)
    rgbt_shared = t.get("RGBT_TRACK_SHARED", False)
    rgbt_uni = t.get("RGBT_TRACK_UNIBACKBONE", False)
    bmult = t.BACKBONE_MULTIPLIER
    offsets = ("reference_points", "sampling_offsets")

    if train_score:
        def lab(p):
            return "main" if "score" in p else "frozen"
        return lab, {"main": 1.0, "frozen": -1.0}

    if freeze_stage0:
        def lab(p):
            if "stage1" in p or "stage2" in p:
                return "backbone"
            if "box_head" in p:
                return "main"
            return "frozen"
        return lab, {"main": 1.0, "backbone": bmult, "frozen": -1.0}

    if freeze6:
        frozen_blocks = tuple(f"blocks_{i}/" for i in range(6))
        def lab(p):
            if any(b in p for b in frozen_blocks) or "patch_embed" in p:
                return "frozen"
            return "backbone" if "backbone" in p else "main"
        return lab, {"main": 1.0, "backbone": bmult, "frozen": -1.0}

    if rgbt:  # two-stream (base_functions.py:351-400)
        def lab(p):
            if "backbone_i" in p:
                return "backbone_i"
            if "backbone_v" in p:
                return "backbone_v"
            if "box_head" in p:
                return "head"
            if "fusion_vi" in p:
                return "fusion_off" if any(k in p for k in offsets) else "fusion"
            return "main"
        return lab, {"backbone_i": 0.1, "backbone_v": 0.02, "head": 0.02,
                     "fusion": 1.0, "fusion_off": 0.1, "main": 1.0}

    if rgbt_shared:  # shared backbone (base_functions.py:413-470)
        def lab(p):
            if "backbone" in p:
                return "backbone"
            if "box_head" in p:
                return "head"
            if "fusion_vi" in p:
                return "fusion_off" if any(k in p for k in offsets) else "fusion"
            return "main"
        return lab, {"backbone": 0.02, "head": 0.02, "fusion": 1.0,
                     "fusion_off": 0.1, "main": 1.0}

    if rgbt_uni:  # uni-backbone (base_functions.py:471-507)
        def lab(p):
            if "backbone" in p:
                return "backbone"
            if "box_head" in p:
                return "head"
            if "fusion_vi" in p:
                return "fusion_off" if any(k in p for k in offsets) else "fusion"
            return "main"
        return lab, {"backbone": 0.1, "head": 0.02, "fusion": 1.0,
                     "fusion_off": 0.1, "main": 1.0}

    # default unimodal regime: freeze score, backbone multiplier (:513-520)
    def lab(p):
        if "score" in p:
            return "frozen"
        return "backbone" if "backbone" in p else "main"
    return lab, {"main": 1.0, "backbone": bmult, "frozen": -1.0}


def make_epoch_schedule(cfg, steps_per_epoch: int):
    """step -> lr scale factor (per-step, epoch-granular like the reference)."""
    t = cfg.TRAIN
    sched_type = t.SCHEDULER.TYPE

    def epoch_of(step):
        return step // max(steps_per_epoch, 1)

    if sched_type == "step":
        drop = t.LR_DROP_EPOCH

        def fn(step):
            return 0.1 ** (epoch_of(step) // drop)
    elif sched_type == "Mstep":
        milestones = sorted(t.LR_DROP_EPOCH)
        gamma = t.SCHEDULER.DECAY_RATE

        def fn(step):
            e = epoch_of(step)
            k = 0
            for m in milestones:
                k = k + (e >= m)
            return gamma ** k
    elif sched_type == "warmup_cosine":
        warm, total, base, mn = t.WARMUP_EPOCHS, t.EPOCH, t.LR, t.MIN_LR

        def fn(step):
            # optax calls this with the TRACED opt-state count inside the
            # jitted train step: jnp ops only (a python `if` would raise
            # TracerBoolConversionError). Fractional epoch matches the
            # reference's per-iteration MAE warmup (lr_shed.py:3-13, called
            # with epoch + i/len(loader)) — integer epochs would hold LR at
            # exactly 0 for the whole first epoch.
            import jax.numpy as jnp
            e = step / max(steps_per_epoch, 1)
            warm_f = e / max(warm, 1)
            cos = 0.5 * (1.0 + jnp.cos(
                jnp.pi * (e - warm) / max(total - warm, 1)))
            cos_f = (mn + (base - mn) * cos) / base
            return jnp.where(e < warm, warm_f, cos_f)
    else:
        raise ValueError(f"Unsupported scheduler {sched_type}")
    return fn


def make_optimizer(cfg, params, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """AdamW with regime param groups, global-norm clip and accumulation."""
    lab, mults = _regime_labeler(cfg)
    accum = cfg.TRAIN.get("ACCUM_ITER", 1) or 1
    # Under MultiSteps the inner AdamW's schedule sees the inner step count,
    # which advances once per ACCUM_ITER loader batches — convert the
    # loader-batch epoch length into applied-update units, or the epoch
    # schedule would run ACCUM_ITER x too slow vs the reference's per-epoch
    # StepLR/MultiStepLR (rgbt_trainer.py accum_iter + base_functions.py:525).
    scale = make_epoch_schedule(cfg, max(1, steps_per_epoch // accum))
    base_lr = cfg.TRAIN.LR
    wd = cfg.TRAIN.WEIGHT_DECAY

    transforms = {}
    for g, m in mults.items():
        if m < 0:
            transforms[g] = optax.set_to_zero()
        else:
            transforms[g] = optax.adamw(
                learning_rate=lambda step, _m=m: base_lr * _m * scale(step),
                weight_decay=wd)

    flat = traverse_util.flatten_dict(params, sep="/")
    labels = traverse_util.unflatten_dict(
        {k: lab(k) for k in flat}, sep="/")

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.TRAIN.GRAD_CLIP_NORM),
        optax.multi_transform(transforms, labels),
    )
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def trainable_mask(cfg, params):
    """Pytree of bools marking trainable params (for logging parity with the
    reference's per-param requires_grad dump, train_script_mixformer.py:147)."""
    lab, mults = _regime_labeler(cfg)
    flat = traverse_util.flatten_dict(params, sep="/")
    return traverse_util.unflatten_dict(
        {k: mults[lab(k)] >= 0 for k in flat}, sep="/")
