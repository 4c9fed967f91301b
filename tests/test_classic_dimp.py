"""DiMP-style tracker: filter initializer + steepest-descent refinement."""
import numpy as np
import pytest

from multi_modal_tracking_tpu.classic.dimp import DiMPTracker
from tests.test_classic_atom import _frame


@pytest.fixture(scope="module")
def dimp():
    return DiMPTracker(crop_size=160, search_factor=4.0, refine=False,
                       init_opt_iter=8, update_opt_iter=2,
                       update_interval=3)


def test_dimp_follows(dimp):
    cx, cy, size = 70.0, 80.0, 32
    dimp.initialize(_frame(cx, cy), {"init_bbox": [cx - 16, cy - 16, size, size]})
    errs = []
    for k in range(1, 9):
        cx += 4.0
        cy += 3.0
        out = dimp.track(_frame(cx, cy, seed=k))
        b = out["target_bbox"]
        errs.append(np.hypot(b[0] + b[2] / 2 - cx, b[1] + b[3] / 2 - cy))
    errs = np.asarray(errs)
    assert np.isfinite(errs).all()
    assert errs.mean() < size, errs


def test_dimp_learned_initializer_seeds_nonzero_filter(dimp):
    """FilterInitializerLinear must give a nonzero filter before SD-GN."""
    import jax.numpy as jnp
    feat = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, *dimp._feat_hw, dimp._clf_c)), jnp.float32)
    bb = jnp.asarray([[60.0, 60.0, 40.0, 40.0]])
    filt = dimp.classifier.apply(
        dimp._clf_vars, feat, bb, None, 0, method="get_filter")
    assert filt.shape == (dimp.filter_size, dimp.filter_size, dimp._clf_c)
    assert np.abs(np.asarray(filt)).max() > 0


def test_dimp_sd_gn_reduces_discriminative_loss(dimp):
    """The learned optimizer's iterations must descend its own objective:
    post-SD-GN scores fit the (learned) label map better than the seed."""
    import jax.numpy as jnp
    from multi_modal_tracking_tpu.classic.dimpnet import apply_filter
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.standard_normal(
        (2, *dimp._feat_hw, dimp._clf_c)), jnp.float32)
    bb = jnp.asarray([[50.0, 60.0, 40.0, 40.0], [60.0, 50.0, 40.0, 40.0]])
    w0 = dimp.classifier.apply(dimp._clf_vars, feat, bb, None, 0,
                               method="get_filter")
    w8 = dimp.classifier.apply(dimp._clf_vars, w0, feat, bb, None, 8,
                               method="optimize_filter")

    # residual proxy: distance of the peak from the box centre, per sample
    def peak_err(w):
        s = apply_filter(feat, w)
        err = 0.0
        for i in range(2):
            p = np.unravel_index(np.asarray(s[i]).argmax(), s[i].shape)
            c = np.asarray(bb[i, :2] + bb[i, 2:] / 2)[::-1] / 16.0
            err += np.hypot(p[0] - c[0], p[1] - c[1])
        return err

    assert peak_err(w8) <= peak_err(w0) + 1e-6
