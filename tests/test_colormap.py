import cv2
import numpy as np
import jax.numpy as jnp

from multi_modal_tracking_tpu.ops.colormap import apply_jet, apply_jet_np


def test_jet_lut_matches_cv2_1ch():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    ref = cv2.applyColorMap(img, cv2.COLORMAP_JET)
    np.testing.assert_array_equal(apply_jet_np(img), ref)


def test_jet_lut_matches_cv2_3ch():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    ref = cv2.applyColorMap(img, cv2.COLORMAP_JET)
    np.testing.assert_array_equal(apply_jet_np(img), ref)


def test_jet_device_matches_host():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    host = apply_jet_np(img)
    dev = np.asarray(apply_jet(jnp.asarray(img)))
    assert np.abs(dev - host.astype(np.float32)).max() <= 4.0

    gray = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(apply_jet(jnp.asarray(gray))), apply_jet_np(gray).astype(np.float32))


def test_jet_closed_form_exact_all_256():
    """The closed-form device JET equals the cv2 LUT on every index."""
    import numpy as np
    import jax.numpy as jnp
    from multi_modal_tracking_tpu.ops.colormap import apply_jet
    from multi_modal_tracking_tpu.ops._jet_lut import JET_LUT_BGR
    idx = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = np.asarray(apply_jet(jnp.asarray(idx))).reshape(256, 3)
    np.testing.assert_array_equal(out.astype(np.int64), JET_LUT_BGR.astype(np.int64))
