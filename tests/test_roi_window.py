"""ROI-window upload mode: crop_resize_window must be BIT-identical to the
full-frame crop whenever it declares itself valid, and must flag exactly the
cases where the window misses frame pixels the full crop reads.

The mode exists because the transfer tunnel's upload leg is the eval
bottleneck (artifacts/profile_upload_r3.json: post-fetch H2D collapses to
~43 MB/s; artifacts/profile_overlap_r4.json: upload/compute pipelining is
impossible) — uploading a conservative sub-window per chunk cuts the bytes
while the validity flag + host fallback keeps trajectories exact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.ops.crop import (crop_resize,
                                               crop_resize_window)

H, W = 120, 160
OUT = 48


def _frame(seed=0):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, 255, (H, W, 3), dtype=np.uint8))


def _window(frame, ox, oy, ww, hw):
    return frame[oy:oy + hw, ox:ox + ww]


@pytest.mark.parametrize("box,off,wsz", [
    ([60.0, 50.0, 20.0, 16.0], (30, 20), (100, 80)),   # interior crop
    ([10.0, 8.0, 18.0, 14.0], (0, 0), (80, 70)),       # frame corner: crop
    ([140.0, 100.0, 24.0, 18.0], (80, 50), (80, 70)),  # pads off-frame, and
                                                       # window touches the
                                                       # right/bottom edges
                                                       # (last-col quirk)
])
def test_window_crop_bit_identical_when_valid(box, off, wsz):
    frame = _frame()
    box = jnp.asarray(box)
    ox, oy = off
    ww, hw = wsz
    want, rf_want = crop_resize(frame, box, 4.0, OUT)
    got, rf_got, ok = crop_resize_window(
        _window(frame, ox, oy, ww, hw), box,
        jnp.asarray([ox, oy], jnp.int32), (H, W), 4.0, OUT)
    assert bool(ok), "expected a valid window for this geometry"
    assert float(rf_want) == float(rf_got)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_window_crop_flags_missing_pixels():
    frame = _frame(1)
    box = jnp.asarray([60.0, 50.0, 30.0, 30.0])   # crop side ceil(30*4)=120
    # 64x64 window centred on the box cannot contain the 120-px crop
    got, _, ok = crop_resize_window(
        _window(frame, 43, 34, 64, 64), box,
        jnp.asarray([43, 34], jnp.int32), (H, W), 4.0, OUT)
    assert not bool(ok)

    # ...but the SAME window is fine for a small template-factor crop
    _, _, ok2 = crop_resize_window(
        _window(frame, 43, 34, 64, 64), box,
        jnp.asarray([43, 34], jnp.int32), (H, W), 2.0, OUT)
    assert bool(ok2)


def test_window_empty_crop_region_valid():
    """A crop entirely off-frame reads nothing -> zeros in both schemes."""
    frame = _frame(2)
    box = jnp.asarray([-300.0, -300.0, 20.0, 20.0])
    want, _ = crop_resize(frame, box, 4.0, OUT)
    got, _, ok = crop_resize_window(
        _window(frame, 0, 0, 64, 64), box,
        jnp.asarray([0, 0], jnp.int32), (H, W), 4.0, OUT)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_window_sweep_valid_vs_exact():
    """Randomised sweep: whenever valid=True the outputs are bit-identical;
    whenever the outputs differ, valid must be False."""
    rng = np.random.default_rng(7)
    frame = _frame(3)
    mismatches = 0
    for _ in range(40):
        box = jnp.asarray([float(rng.uniform(-20, W)), float(rng.uniform(-20, H)),
                           float(rng.uniform(5, 40)), float(rng.uniform(5, 40))])
        ww = int(rng.integers(32, W))
        hw = int(rng.integers(32, H))
        ox = int(rng.integers(0, W - ww + 1))
        oy = int(rng.integers(0, H - hw + 1))
        want, _ = crop_resize(frame, box, 3.5, OUT)
        got, _, ok = crop_resize_window(
            _window(frame, ox, oy, ww, hw), box,
            jnp.asarray([ox, oy], jnp.int32), (H, W), 3.5, OUT)
        same = np.array_equal(np.asarray(want), np.asarray(got))
        if bool(ok):
            assert same, "valid window produced different pixels"
        if not same:
            mismatches += 1
            assert not bool(ok)
    assert mismatches > 0, "sweep never exercised an invalid window"
