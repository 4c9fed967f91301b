import numpy as np
import jax.numpy as jnp
import pytest
import torch

from multi_modal_tracking_tpu.ops import boxes as B


def _rand_xyxy(n, rng):
    x0 = rng.uniform(0, 0.6, n)
    y0 = rng.uniform(0, 0.6, n)
    w = rng.uniform(0.05, 0.4, n)
    h = rng.uniform(0.05, 0.4, n)
    return np.stack([x0, y0, x0 + w, y0 + h], axis=1).astype(np.float32)


def torch_ciou(b1, b2):
    """Independent torch oracle for the reference CIoU loss semantics
    (trade-off alpha with S=1[iou>0.5], no-grad alpha, clip to [-1,1])."""
    b1 = torch.tensor(b1)
    b2 = torch.tensor(b2)
    w1, h1 = b1[:, 2] - b1[:, 0], b1[:, 3] - b1[:, 1]
    w2, h2 = b2[:, 2] - b2[:, 0], b2[:, 3] - b2[:, 1]
    c1 = (b1[:, :2] + b1[:, 2:]) / 2
    c2 = (b2[:, :2] + b2[:, 2:]) / 2
    lt = torch.maximum(b1[:, :2], b2[:, :2])
    rb = torch.minimum(b1[:, 2:], b2[:, 2:])
    inter = (rb - lt).clamp(min=0).prod(1)
    union = w1 * h1 + w2 * h2 - inter
    iou = inter / union
    clt = torch.minimum(b1[:, :2], b2[:, :2])
    crb = torch.maximum(b1[:, 2:], b2[:, 2:])
    c_diag = ((crb - clt).clamp(min=0) ** 2).sum(1)
    inter_diag = ((c2 - c1) ** 2).sum(1)
    u = inter_diag / c_diag
    v = (4 / np.pi ** 2) * (torch.atan(w2 / h2) - torch.atan(w1 / h1)) ** 2
    S = (iou > 0.5).float()
    alpha = S * v / (1 - iou + v)
    cious = (iou - u - alpha * v).clamp(-1.0, 1.0)
    return (1 - cious).mean().item(), iou.numpy()


def test_conversion_roundtrip():
    rng = np.random.default_rng(0)
    b = _rand_xyxy(64, rng)
    out = np.asarray(B.box_cxcywh_to_xyxy(B.box_xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-6)
    out = np.asarray(B.box_xywh_to_xyxy(B.box_xyxy_to_xywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-6)


def test_iou_giou_vs_torch():
    rng = np.random.default_rng(1)
    b1, b2 = _rand_xyxy(128, rng), _rand_xyxy(128, rng)
    iou, _ = B.box_iou(jnp.asarray(b1), jnp.asarray(b2))
    t1, t2 = torch.tensor(b1), torch.tensor(b2)
    lt = torch.maximum(t1[:, :2], t2[:, :2])
    rb = torch.minimum(t1[:, 2:], t2[:, 2:])
    inter = (rb - lt).clamp(min=0).prod(1)
    a1 = (t1[:, 2] - t1[:, 0]) * (t1[:, 3] - t1[:, 1])
    a2 = (t2[:, 2] - t2[:, 0]) * (t2[:, 3] - t2[:, 1])
    ref = inter / (a1 + a2 - inter)
    np.testing.assert_allclose(np.asarray(iou), ref.numpy(), atol=1e-5)

    giou, giou_iou = B.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2))
    clt = torch.minimum(t1[:, :2], t2[:, :2])
    crb = torch.maximum(t1[:, 2:], t2[:, 2:])
    area = (crb - clt).clamp(min=0).prod(1)
    ref_g = ref - (area - (a1 + a2 - inter)) / area
    np.testing.assert_allclose(np.asarray(giou), ref_g.numpy(), atol=1e-5)


def test_ciou_vs_torch_oracle():
    rng = np.random.default_rng(2)
    b1, b2 = _rand_xyxy(256, rng), _rand_xyxy(256, rng)
    loss, iou = B.ciou_loss(jnp.asarray(b1), jnp.asarray(b2))
    ref_loss, ref_iou = torch_ciou(b1, b2)
    assert abs(float(loss) - ref_loss) < 1e-5
    np.testing.assert_allclose(np.asarray(iou), ref_iou, atol=1e-5)


def test_clip_box():
    assert B.clip_box([-5.0, -3.0, 50.0, 40.0], H=100, W=200, margin=10) == [0, 0, 45.0, 37.0]
    out = B.clip_box_batch(jnp.asarray([[-5.0, -3.0, 50.0, 40.0]]), H=100, W=200, margin=10)
    np.testing.assert_allclose(np.asarray(out)[0], [0, 0, 45.0, 37.0])


def test_ciou_gradient_finite():
    import jax
    rng = np.random.default_rng(3)
    b1, b2 = _rand_xyxy(32, rng), _rand_xyxy(32, rng)
    g = jax.grad(lambda a: B.ciou_loss(a, jnp.asarray(b2))[0])(jnp.asarray(b1))
    assert np.all(np.isfinite(np.asarray(g)))
