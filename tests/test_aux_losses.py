"""Tests for the auxiliary losses / box utils kept for reference parity:
LBHinge (lib/utils/classification_loss.py:6), IOULoss / REGLoss
(lib/utils/box_ops.py:167-255), merge utils (lib/utils/merge.py), and
rect_to_rel / masks_to_bboxes (lib/train/data/bounding_box_utils.py).
Each is verified against a numpy/torch re-derivation of the reference math.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from multi_modal_tracking_tpu.ops.boxes import (masks_to_bboxes, rect_to_rel,
                                                rel_to_rect)
from multi_modal_tracking_tpu.train.losses import (iou_pred_loss, lb_hinge,
                                                   reg_loss)
from multi_modal_tracking_tpu.models.layers import (get_qkv,
                                                    merge_template_search)


def _torch_lb_hinge(prediction, label, threshold=0.05, clip=None):
    negative_mask = (label < threshold).float()
    positive_mask = 1.0 - negative_mask
    prediction = negative_mask * F.relu(prediction) + positive_mask * prediction
    loss = F.mse_loss(prediction, positive_mask * label)
    if clip is not None:
        loss = torch.min(loss, torch.tensor([clip]))
    return loss


def test_lb_hinge_matches_reference():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(4, 19, 19)).astype(np.float32)
    label = rng.uniform(-0.2, 1.0, size=(4, 19, 19)).astype(np.float32)
    ours = lb_hinge(jnp.asarray(pred), jnp.asarray(label), threshold=0.05)
    ref = _torch_lb_hinge(torch.from_numpy(pred), torch.from_numpy(label))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)
    # clip engages
    clipped = lb_hinge(jnp.asarray(pred) * 100, jnp.asarray(label), clip=0.5)
    assert float(clipped) == pytest.approx(0.5)


def _torch_iou_loss(pred, target, weight=None):
    pl, pr, pt, pb = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    tl, tr, tt, tb = target[:, 0], target[:, 1], target[:, 2], target[:, 3]
    ta = (tl + tr) * (tt + tb)
    pa = (pl + pr) * (pt + pb)
    wi = torch.min(pl, tl) + torch.min(pr, tr)
    hi = torch.min(pb, tb) + torch.min(pt, tt)
    inter = wi * hi
    losses = -torch.log((inter + 1.0) / (ta + pa - inter + 1.0))
    if weight is not None and weight.sum() > 0:
        return (losses * weight).sum() / weight.sum()
    return losses.mean()


def test_iou_pred_loss_matches_reference():
    rng = np.random.default_rng(1)
    pred = rng.uniform(0.05, 1.0, size=(16, 4)).astype(np.float32)
    target = rng.uniform(0.05, 1.0, size=(16, 4)).astype(np.float32)
    w = (rng.uniform(size=16) > 0.3).astype(np.float32)
    ours = iou_pred_loss(jnp.asarray(pred), jnp.asarray(target))
    ref = _torch_iou_loss(torch.from_numpy(pred), torch.from_numpy(target))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)
    ours_w = iou_pred_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(w))
    ref_w = _torch_iou_loss(torch.from_numpy(pred), torch.from_numpy(target),
                            torch.from_numpy(w))
    np.testing.assert_allclose(np.asarray(ours_w), ref_w.numpy(), rtol=1e-5)


def test_reg_loss_center_fallback_and_window():
    rng = np.random.default_rng(2)
    B, H, W = 3, 20, 20
    out = rng.uniform(0.1, 1.0, size=(B, H, W, 4)).astype(np.float32)
    ind = jnp.asarray([5 * W + 7, 3 * W + 3, 10 * W + 12])
    # generous targets: the full radius-1 window is valid
    target = jnp.asarray(rng.uniform(0.3, 0.9, size=(B, 4)).astype(np.float32))
    full = reg_loss(jnp.asarray(out), ind, target, radius=1)
    assert np.isfinite(float(full))
    # tiny targets: shifting by norm makes some coordinate negative for every
    # non-zero offset -> only the (0,0) offset survives in the window mean.
    tiny = jnp.full((B, 4), 0.01, jnp.float32)
    only_center = reg_loss(jnp.asarray(out), ind, tiny, radius=1, norm=0.05)
    direct = iou_pred_loss(
        jnp.take_along_axis(jnp.asarray(out).reshape(B, -1, 4),
                            ind[:, None, None], axis=1)[:, 0], tiny)
    np.testing.assert_allclose(np.asarray(only_center), np.asarray(direct),
                               rtol=1e-5)


def test_reg_loss_jits():
    B, H, W = 2, 10, 10
    f = jax.jit(lambda o, i, t: reg_loss(o, i, t))
    out = jnp.ones((B, H, W, 4)) * 0.5
    val = f(out, jnp.asarray([5, 15]), jnp.full((B, 4), 0.4))
    assert np.isfinite(float(val))


def test_rect_rel_roundtrip():
    rng = np.random.default_rng(3)
    bb = jnp.asarray(rng.uniform(1, 50, size=(7, 4)).astype(np.float32))
    back = rel_to_rect(rect_to_rel(bb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(bb), rtol=1e-5)
    sz = jnp.asarray(rng.uniform(10, 20, size=(7, 2)).astype(np.float32))
    back2 = rel_to_rect(rect_to_rel(bb, sz), sz)
    np.testing.assert_allclose(np.asarray(back2), np.asarray(bb), rtol=1e-5)


def test_masks_to_bboxes():
    m = np.zeros((2, 16, 16), np.float32)
    m[0, 3:8, 4:10] = 1.0          # y 3..7, x 4..9
    # m[1] empty
    v = masks_to_bboxes(jnp.asarray(m), fmt="v")
    np.testing.assert_allclose(np.asarray(v[0]), [4, 3, 9, 7])
    np.testing.assert_allclose(np.asarray(v[1]), [0, 0, 0, 0])
    t = masks_to_bboxes(jnp.asarray(m), fmt="t")
    np.testing.assert_allclose(np.asarray(t[0]), [4, 3, 6, 5])
    c = masks_to_bboxes(jnp.asarray(m), fmt="c")
    np.testing.assert_allclose(np.asarray(c[0]), [7, 5.5, 6, 5])


def test_merge_template_search_and_qkv():
    rng = np.random.default_rng(4)
    def mk(L, B=2, C=8):
        return {"feat": jnp.asarray(rng.normal(size=(L, B, C)).astype(np.float32)),
                "mask": jnp.zeros((B, L), bool),
                "pos": jnp.asarray(rng.normal(size=(L, B, C)).astype(np.float32))}
    z, x = mk(64), mk(324)
    seq = merge_template_search([z, x], return_search=True, return_template=True)
    assert seq["feat"].shape == (388, 2, 8)
    assert seq["mask"].shape == (2, 388)
    assert seq["feat_x"].shape == (324, 2, 8)
    assert seq["feat_z"].shape == (64, 2, 8)
    q, k, v, kpm = get_qkv([z, x])
    np.testing.assert_allclose(np.asarray(q), np.asarray(x["feat"] + x["pos"]))
    assert k.shape == (388, 2, 8) and v.shape == (388, 2, 8)
    np.testing.assert_allclose(np.asarray(v[:64]), np.asarray(z["feat"]))
