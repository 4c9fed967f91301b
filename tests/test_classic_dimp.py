"""DiMP-style tracker: filter initializer + steepest-descent refinement."""
import numpy as np
import pytest

from multi_modal_tracking_tpu.classic.dimp import DiMPTracker
from tests.test_classic_atom import _frame


@pytest.fixture(scope="module")
def dimp():
    return DiMPTracker(crop_size=160, search_factor=4.0, refine=False,
                       num_sd_iter=8, update_interval=3)


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


def test_dimp_filter_seed_differs_from_zero(dimp):
    """The pooled initializer must give a nonzero filter before refinement."""
    import jax.numpy as jnp
    feat = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, *dimp._feat_hw, dimp._feat_c)), jnp.float32)
    filt = dimp._init_filter_from_target(feat)
    assert np.abs(np.asarray(filt)).max() > 0
    np.testing.assert_allclose(float(jnp.linalg.norm(filt)), 1.0, rtol=1e-4)
