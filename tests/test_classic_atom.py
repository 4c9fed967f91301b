"""ATOM-style tracker: online classifier + IoUNet refinement machinery."""
import numpy as np
import pytest

from multi_modal_tracking_tpu.classic.atom import ATOMTracker


def _frame(cx, cy, size=32, H=160, W=200, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(30, 60, (H, W, 3), np.uint8)
    x0, y0 = int(cx - size // 2), int(cy - size // 2)
    img[y0:y0 + size, x0:x0 + size] = [230, 60, 30]
    img[y0 + 8:y0 + size - 8, x0 + 8:x0 + size - 8] = [30, 60, 230]
    return img


@pytest.fixture(scope="module")
def atom_norefine():
    # crop 160 -> 10x10 feature map: coarse enough for fast CPU compiles,
    # fine enough (~13 px/cell at factor 4) to localise 5 px/frame motion
    return ATOMTracker(crop_size=160, search_factor=4.0, refine=False,
                       num_cg_iter=6, update_interval=3)


def test_atom_classifier_follows(atom_norefine):
    t = atom_norefine
    cx, cy, size = 70.0, 80.0, 32
    t.initialize(_frame(cx, cy), {"init_bbox": [cx - 16, cy - 16, size, size]})
    errs = []
    for k in range(1, 9):
        cx += 4.0
        cy += 3.0
        out = t.track(_frame(cx, cy, seed=k))
        b = out["target_bbox"]
        errs.append(np.hypot(b[0] + b[2] / 2 - cx, b[1] + b[3] / 2 - cy))
    errs = np.asarray(errs)
    assert np.isfinite(errs).all()
    # random-init backbone features still separate a high-contrast target:
    # the tracker must stay within the target extent
    assert errs.mean() < size, errs


def test_atom_refinement_runs_and_is_finite():
    t = ATOMTracker(crop_size=96, refine=True, refine_steps=3,
                    num_cg_iter=4, update_interval=100)
    t.initialize(_frame(80, 80), {"init_bbox": [64.0, 64.0, 32, 32]})
    out = t.track(_frame(83, 82, seed=1))
    b = np.asarray(out["target_bbox"])
    assert np.isfinite(b).all()
    assert b[2] > 0 and b[3] > 0


def test_atom_scale_pyramid_adapts_size():
    """No-IoUNet multi-scale config (multiscale_no_iounet.py): the best
    pyramid scale updates target_sz (atom.py:252-253)."""
    t = ATOMTracker(crop_size=160, search_factor=4.0, refine=False,
                    num_cg_iter=6, update_interval=3,
                    scale_factors=tuple(1.04 ** i for i in range(-2, 3)))
    cx, cy, size = 80.0, 80.0, 24
    t.initialize(_frame(cx, cy, size=size),
                 {"init_bbox": [cx - size / 2, cy - size / 2, size, size]})
    for k in range(1, 8):
        size += 2                        # target grows ~8%/frame
        out = t.track(_frame(cx, cy, size=size, seed=k))
    b = out["target_bbox"]
    assert np.isfinite(b).all()
    # size tracked upward (started at 24, target ended at 38)
    assert b[2] > 26 and b[3] > 26, b


def test_refine_aspect_filter_falls_back_to_input_box():
    """When every refined proposal violates the aspect-ratio limit the input
    box must come back unchanged (reference early-return, dimp.py:688)."""
    import jax
    import jax.numpy as jnp
    from multi_modal_tracking_tpu.classic.atom import refine_box_iounet
    t = ATOMTracker(crop_size=96, refine=True)
    rng = np.random.default_rng(3)
    f2 = jnp.asarray(rng.standard_normal((1, *t._l2_hw, 128)), jnp.float32)
    f3 = jnp.asarray(rng.standard_normal((1, *t._feat_hw, t._feat_c)),
                     jnp.float32)
    box = jnp.asarray([30.0, 30.0, 40.0, 20.0])    # aspect 2
    mod = t.iou_net.apply(t._iou_vars, f2, f3, box[None],
                          method="get_modulation")
    iou_feat = t.iou_net.apply(t._iou_vars, f2, f3, method="get_iou_feat")
    best, iou = refine_box_iounet(
        t.iou_net, t._iou_vars, iou_feat, mod, box, jax.random.PRNGKey(0),
        steps=2, max_aspect_ratio=1.01)            # filters every proposal
    assert np.allclose(np.asarray(best), np.asarray(box))
    assert float(iou) == 0.0


def test_iou_net_gradients_flow():
    """IoU ascent needs nonzero grads through PrRoI pooling wrt box coords
    (the AtomIoUNet modulation -> iou-feat -> predict path)."""
    import jax
    import jax.numpy as jnp
    t = ATOMTracker(crop_size=96, refine=True)
    rng = np.random.default_rng(0)
    f2 = jnp.asarray(rng.standard_normal((1, *t._l2_hw, 128)), jnp.float32)
    f3 = jnp.asarray(rng.standard_normal((1, *t._feat_hw, t._feat_c)),
                     jnp.float32)
    box = jnp.asarray([[30.0, 30.0, 40.0, 40.0]])
    mod = t.iou_net.apply(t._iou_vars, f2, f3, box, method="get_modulation")
    iou_feat = t.iou_net.apply(t._iou_vars, f2, f3, method="get_iou_feat")

    def iou_of(b):
        return t.iou_net.apply(t._iou_vars, mod, iou_feat, b[None, None],
                               method="predict_iou")[0, 0]

    g = jax.grad(iou_of)(jnp.asarray([32.0, 31.0, 42.0, 43.0]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
