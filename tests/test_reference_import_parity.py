"""Parity against the GENUINE reference implementation, imported and executed.

Every other convert/parity test in this suite checks against a torch oracle
*transcribed* from the reference; a shared misreading would pass both sides.
This module retires that risk class for the flagship: it imports the actual
``/root/reference/lib/models/mixformer_vit_rgbt/asymmetric_shared_ce.py``
(via the minimal shims in tests/reference_oracle.py), builds the shipped
flagship with the reference's OWN config loader and experiment YAML
(``experiments/asymmetric_shared_ce/attention_lasher_newfusion_2layer.yaml``),
converts its randomly-initialised state dict through utils/torch_convert, and
requires the flax model to reproduce the reference's box outputs bit-closely
on the inference path, the training path (real ``generate_mask_cond`` CTR_POINT
mask + runtime keep rate, lib/utils/ce_utils.py:14-38), and the CE-disabled
path — at the full shipped geometry (ViT-B depth 12, 288/128, CE 3/6/9 @ 0.7,
2-layer Attention_Fusion_Bimodal_LNSpecific_2, CORNER_UP head).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict, map_torch_key

from tests import reference_oracle

B = 1
T_SZ, S_SZ = 128, 288
GT = T_SZ // 16


@pytest.fixture(scope="module")
def ref():
    mod = reference_oracle.load_flagship_module()
    cfg = reference_oracle.load_reference_config(
        "asymmetric_shared_ce", "attention_lasher_newfusion_2layer")
    # train=False skips every checkpoint load (asymmetric_shared_ce.py:516,645)
    torch.manual_seed(0)
    oracle = mod.build_asymmetric_shared_ce(cfg, train=False).eval()
    return mod, cfg, oracle


@pytest.fixture(scope="module")
def converted(ref):
    _, ref_cfg, oracle = ref
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt

    cfg = get_parameters("asymmetric_shared_ce",
                         "attention_lasher_newfusion_2layer").cfg
    # both sides must be reading the same shipped recipe
    assert cfg.DATA.SEARCH.SIZE == ref_cfg.DATA.SEARCH.SIZE == S_SZ
    assert cfg.DATA.TEMPLATE.SIZE == ref_cfg.DATA.TEMPLATE.SIZE == T_SZ
    assert tuple(cfg.MODEL.BACKBONE.CE_LOC) == tuple(ref_cfg.MODEL.BACKBONE.CE_LOC)
    assert cfg.MODEL.FUSION_CLASS == ref_cfg.MODEL.FUSION_CLASS
    assert cfg.MODEL.FUSION_LAYERS == ref_cfg.MODEL.FUSION_LAYERS
    assert cfg.MODEL.HEAD_TYPE == ref_cfg.MODEL.HEAD_TYPE

    model = build_mixformer_rgbt(cfg, dtype=jnp.float32)
    tz = jnp.zeros((2 * B, T_SZ, T_SZ, 3), jnp.float32)
    sz = jnp.zeros((2 * B, S_SZ, S_SZ, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), tz, tz, sz)

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    new_vars, report = convert_state_dict(sd, variables, verbose=False)
    return oracle, model, new_vars, report, sd


def test_every_reference_key_maps(converted):
    """The real reference state dict must convert with no unmapped / skipped /
    mismatched parameter (buffers like the fixed sincos pos embeds and corner
    coordinate grids are regenerated, not converted)."""
    _, _, _, report, sd = converted
    buffers = ("pos_embed", "cx", "cy", "coord_x", "coord_y",
               "num_batches_tracked", "indice")
    unmapped = [k for k in sd
                if map_torch_key(k) is None and not any(b in k for b in buffers)]
    assert unmapped == [], unmapped
    skipped = [k for k in report["skipped"] if not any(b in k for b in buffers)]
    assert skipped == [], skipped
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert report["missing"] == [], report["missing"]


def _inputs(seed):
    rng = np.random.default_rng(seed)
    mk = lambda sz: rng.standard_normal((B, sz, sz, 3)).astype(np.float32)
    t_v, t_i = mk(T_SZ), mk(T_SZ)
    ot_v, ot_i = mk(T_SZ), mk(T_SZ)
    s_v, s_i = mk(S_SZ), mk(S_SZ)
    as_torch = lambda a: torch.tensor(a).permute(0, 3, 1, 2)
    tpair = lambda v, i: [as_torch(v), as_torch(i)]
    jstack = lambda v, i: jnp.asarray(np.concatenate([v, i], axis=0))
    return ((tpair(t_v, t_i), tpair(ot_v, ot_i), tpair(s_v, s_i)),
            (jstack(t_v, t_i), jstack(ot_v, ot_i), jstack(s_v, s_i)))


def _ref_boxes(oracle, tt, tot, ts, **kw):
    with torch.no_grad():
        out_dict, coords = oracle(tt, tot, ts, **kw)
    return coords.numpy().reshape(B, 4)


def test_inference_path_parity(converted):
    """Test-time call: no CE mask, config keep ratios
    (lib/test/tracker/asymmetric_shared_ce.py:90-98)."""
    oracle, model, new_vars, _, _ = converted
    (tt, tot, ts), (jt, jot, js) = _inputs(1)
    want = _ref_boxes(oracle, tt, tot, ts)
    got = np.asarray(model.apply(new_vars, jt, jot, js, None,
                                 use_ce_template_mask=False)["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_training_path_parity(converted):
    """Train-time call: the reference's own generate_mask_cond CTR_POINT mask
    (ce_utils.py:14-38) + runtime ce_keep_rate (actors/mixformer_rgbt.py)."""
    reference_oracle.install()
    from lib.utils.ce_utils import generate_mask_cond
    oracle, model, new_vars, _, _ = converted
    ref_cfg = reference_oracle.load_reference_config(
        "asymmetric_shared_ce", "attention_lasher_newfusion_2layer")
    mask = generate_mask_cond(ref_cfg, B, torch.device("cpu"),
                              torch.tensor([[0.4, 0.4, 0.2, 0.2]] * B))
    (tt, tot, ts), (jt, jot, js) = _inputs(2)
    for rate in (0.55, 0.8):
        want = _ref_boxes(oracle, tt, tot, ts,
                          ce_template_mask=mask, ce_keep_rate=rate)
        got = np.asarray(model.apply(new_vars, jt, jot, js, rate,
                                     use_ce_template_mask=True)["pred_boxes"]).reshape(B, 4)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_no_ce_path_parity(converted):
    """keep rate 1.0 disables CE entirely in both implementations."""
    oracle, model, new_vars, _, _ = converted
    (tt, tot, ts), (jt, jot, js) = _inputs(3)
    want = _ref_boxes(oracle, tt, tot, ts, ce_keep_rate=1.0)
    got = np.asarray(model.apply(new_vars, jt, jot, js, 1.0,
                                 use_ce_template_mask=False)["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------- CE mask modes (dead in
# the reference: generate_mask_cond raises for anything but CTR_POINT,
# ce_utils.py:15-16, and the CTR_REC/GT_BOX branches build n_t-length masks
# the model cannot consume. We implement the branch semantics applied to all
# four template copies; the oracle is the GENUINE reference MODEL fed the
# same row mask, plus the genuine rasteriser for GT_BOX weights.)

def _mask_from_rows(rows_one_copy, n_t):
    mask = torch.zeros(B, n_t, dtype=torch.bool)
    mask[:, list(rows_one_copy)] = True
    return mask.repeat(1, 4)


def test_ctr_rec_mask_parity(converted):
    """CTR_REC (centre 2x2 for grid 8, ce_utils.py:41-48) end-to-end: our
    CTR_REC model must match the reference model given the same rows."""
    from multi_modal_tracking_tpu.models.asymmetric_shared import (
        MixFormerRGBT, _ctr_rec_span)
    oracle, model, new_vars, _, _ = converted
    F_t = GT
    lo, hi = _ctr_rec_span(F_t)
    assert (lo, hi) == (3, 5)       # reference table for grid 8
    rows = [r * F_t + c for r in range(lo, hi) for c in range(lo, hi)]
    mask = _mask_from_rows(rows, F_t * F_t)

    import dataclasses
    model_rec = MixFormerRGBT(
        spec=dataclasses.replace(model.spec, ce_template_range="CTR_REC"),
        with_score=model.with_score, dtype=model.dtype)
    (tt, tot, ts), (jt, jot, js) = _inputs(4)
    want = _ref_boxes(oracle, tt, tot, ts, ce_template_mask=mask,
                      ce_keep_rate=0.6)
    got = np.asarray(model_rec.apply(new_vars, jt, jot, js, 0.6,
                                     use_ce_template_mask=True)["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_gt_box_weights_match_reference_rasteriser():
    """ce_box_row_weights == the genuine generate_bbox_mask + F.interpolate
    glue (ce_utils.py:54-66)."""
    import torch.nn.functional as F
    reference_oracle.install()
    from lib.utils.ce_utils import generate_bbox_mask
    from multi_modal_tracking_tpu.models.asymmetric_shared import ce_box_row_weights

    T, stride = 128, 16
    boxes = np.array([[0.30, 0.25, 0.40, 0.35],
                      [0.05, 0.55, 0.30, 0.40],
                      [0.45, 0.40, 0.12, 0.09]], np.float32)
    bm = generate_bbox_mask(torch.zeros(len(boxes), T, T),
                            torch.tensor(boxes) * T).unsqueeze(1).float()
    want = (F.interpolate(bm, scale_factor=1.0 / stride, mode="bilinear",
                          align_corners=False).flatten(1) > 0).float().numpy()
    got = np.asarray(ce_box_row_weights(jnp.asarray(boxes), T, T // stride))
    np.testing.assert_array_equal(got, want)


def test_gt_box_mask_parity(converted):
    """GT_BOX end-to-end: weights from the real box -> masked-row pooling
    must match the reference model given the same boolean rows."""
    from multi_modal_tracking_tpu.models.asymmetric_shared import (
        MixFormerRGBT, ce_box_row_weights)
    oracle, model, new_vars, _, _ = converted
    boxes = np.tile(np.array([[0.3, 0.3, 0.45, 0.4]], np.float32), (B, 1))
    w1 = np.asarray(ce_box_row_weights(jnp.asarray(boxes), T_SZ, GT))
    rows = np.nonzero(w1[0])[0].tolist()
    assert len(rows) > 1            # a real rectangle, not a point
    mask = _mask_from_rows(rows, GT * GT)

    import dataclasses
    model_gb = MixFormerRGBT(
        spec=dataclasses.replace(model.spec, ce_template_range="GT_BOX"),
        with_score=model.with_score, dtype=model.dtype)
    (tt, tot, ts), (jt, jot, js) = _inputs(5)
    want = _ref_boxes(oracle, tt, tot, ts, ce_template_mask=mask,
                      ce_keep_rate=0.6)
    got = np.asarray(model_gb.apply(new_vars, jt, jot, js, 0.6,
                                    use_ce_template_mask=True,
                                    ce_gt_boxes=jnp.asarray(boxes))["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


# -------------------------------------------------- training objective parity
# The forward is parity-pinned above; these pin the OBJECTIVE against the
# genuine reference loss functions + the actor's exact glue
# (actors/mixformer_rgbt.py compute_losses:127-168: cxcywh->xyxy flatten,
# gt clamp to [0,1], CIoU+L1 weighted sum; SPM stage: BCE REPLACES box loss).

def test_box_objective_matches_reference_actor():
    reference_oracle.install()
    import torch.nn.functional as F
    from lib.utils.box_ops import (box_cxcywh_to_xyxy as r_cxcywh_to_xyxy,
                                   box_xywh_to_xyxy as r_xywh_to_xyxy,
                                   ciou_loss as r_ciou_loss)
    from multi_modal_tracking_tpu.train.losses import box_losses

    rng = np.random.default_rng(0)
    Bn, N = 16, 1
    pred = rng.uniform(0.05, 0.9, (Bn, N, 4)).astype(np.float32)
    # include out-of-range gt rows to exercise the clamp
    gt = rng.uniform(-0.1, 1.0, (Bn, 4)).astype(np.float32)
    w_iou, w_l1 = 2.0, 5.0

    tp = torch.tensor(pred)
    tg = torch.tensor(gt)
    pred_vec = r_cxcywh_to_xyxy(tp).view(-1, 4)
    gt_vec = (r_xywh_to_xyxy(tg)[:, None, :].repeat((1, N, 1))
              .view(-1, 4).clamp(min=0.0, max=1.0))
    ciou_l, iou = r_ciou_loss(pred_vec, gt_vec)
    want_total = w_iou * ciou_l + w_l1 * F.l1_loss(pred_vec, gt_vec)

    total, metrics = box_losses(jnp.asarray(pred), jnp.asarray(gt),
                                w_iou, w_l1)
    np.testing.assert_allclose(float(total), float(want_total),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(metrics["IoU"]), float(iou.mean()),
                               rtol=1e-5, atol=1e-6)


def test_score_objective_matches_reference_actor():
    reference_oracle.install()
    from multi_modal_tracking_tpu.train.losses import score_loss

    rng = np.random.default_rng(1)
    logits = rng.standard_normal(16).astype(np.float32)
    labels = (rng.random(16) > 0.5).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                        torch.tensor(labels))
    total, _ = score_loss(jnp.asarray(logits), jnp.asarray(labels), 1.0)
    np.testing.assert_allclose(float(total), float(want), rtol=1e-6)


def test_keep_rate_schedule_matches_reference():
    """adjust_keep_rate (ce_utils.py:72-88): warmup/total epochs cosine."""
    reference_oracle.install()
    from lib.utils.ce_utils import adjust_keep_rate
    from multi_modal_tracking_tpu.train.train_step import (
        adjust_keep_rate as our_adjust_keep_rate)

    for epoch in (0, 5, 20, 37, 63, 99, 100, 140):
        want = float(adjust_keep_rate(epoch, warmup_epochs=20,
                                      total_epochs=100, ITERS_PER_EPOCH=1,
                                      base_keep_rate=0.7))
        got = float(our_adjust_keep_rate(epoch, warmup_epochs=20,
                                         total_epochs=100, iters_per_epoch=1,
                                         base_keep_rate=0.7))
        np.testing.assert_allclose(got, want, rtol=1e-6,
                                   err_msg=f"epoch {epoch}")


def test_gradient_parity(converted):
    """End-to-end GRADIENT parity: d(loss)/d(params) of the full flagship
    (eval-mode forward + the actor objective) must match the imported
    reference's autograd leaf-for-leaf after converting the torch grads
    through the SAME layout mapping as the params (the transforms are
    linear — transpose/reshape — so they map gradients identically).
    Catches backward-path defects forward parity cannot: wrong
    stop_gradient placement, custom-vjp errors, non-differentiable
    reformulations of CE gather/scatter."""
    oracle, model, new_vars, _, _ = converted
    from multi_modal_tracking_tpu.train.losses import box_losses
    from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict

    (tt, tot, ts), (jt, jot, js) = _inputs(6)
    gt = np.array([[0.31, 0.27, 0.33, 0.38]] * B, np.float32)
    w_iou, w_l1 = 2.0, 5.0

    # torch side: eval-mode module, training-path call (CE keep rate), the
    # genuine actor objective (compute_losses:127-150)
    import lib.utils.box_ops as rbo
    import torch.nn.functional as F
    for p in oracle.parameters():
        p.grad = None
    out_dict, coords = oracle(tt, tot, ts, ce_keep_rate=0.8)
    pred_vec = rbo.box_cxcywh_to_xyxy(coords).view(-1, 4)
    gt_vec = (rbo.box_xywh_to_xyxy(torch.tensor(gt))[:, None, :]
              .repeat((1, 1, 1)).view(-1, 4).clamp(0.0, 1.0))
    ciou_l, _ = rbo.ciou_loss(pred_vec, gt_vec)
    loss_t = w_iou * ciou_l + w_l1 * F.l1_loss(pred_vec, gt_vec)
    loss_t.backward()
    grad_sd = {k: p.grad.numpy() for k, p in oracle.named_parameters()
               if p.grad is not None}

    # jax side: same loss of the same converted params
    def loss_fn(params):
        variables = dict(new_vars, params=params)
        out = model.apply(variables, jt, jot, js, 0.8,
                          use_ce_template_mask=False)
        total, _ = box_losses(out["pred_boxes"], jnp.asarray(gt), w_iou, w_l1)
        return total

    loss_j, grads = jax.value_and_grad(loss_fn)(new_vars["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-4, atol=1e-5)

    # route the torch grads through the param mapping into a grads pytree
    grad_tree, report = convert_state_dict(
        grad_sd, {"params": jax.tree.map(np.zeros_like, grads)},
        verbose=False)
    assert not report["shape_mismatch"], report["shape_mismatch"]

    flat_want = jax.tree_util.tree_flatten_with_path(grad_tree["params"])[0]
    flat_got = {jax.tree_util.keystr(k): v for k, v
                in jax.tree_util.tree_flatten_with_path(grads)[0]}
    checked = 0
    for key, want in flat_want:
        ks = jax.tree_util.keystr(key)
        got = np.asarray(flat_got[ks])
        want = np.asarray(want)
        if not np.any(want):           # leaves the mapping never filled
            continue
        scale = np.abs(want).max()
        if scale < 1e-6:
            # mathematically-zero gradients (e.g. the final corner-head
            # score conv bias: soft-argmax is invariant to a uniform map
            # shift) are pure fp32 noise on both sides — nothing to compare
            continue
        # pure scaled atol: rtol would flag noise on near-zero elements;
        # 2% of the leaf's max |grad| passes the measured fp32
        # reassociation noise (<= 1.7% of scale through depth 12 + the
        # deformable-sampling backward) while a misplaced stop_gradient or
        # a broken custom VJP is orders of magnitude off
        np.testing.assert_allclose(got, want, atol=2e-2 * scale, rtol=0,
                                   err_msg=ks)
        checked += 1
    assert checked > 150, f"only {checked} gradient leaves compared"
