"""Advanced localisation (distractor / hard-negative / lost detection) and
sub-pixel peak refinement — parity with pytracking's localize_advanced
(external/AR/pytracking/tracker/atom/atom.py:341-404, dimp/dimp.py:239-304)."""
import numpy as np
import jax.numpy as jnp
import pytest

from multi_modal_tracking_tpu.classic.dcf import (FLAG_HARD_NEGATIVE,
                                                  FLAG_NORMAL, FLAG_NOT_FOUND,
                                                  FLAG_UNCERTAIN,
                                                  localize_advanced,
                                                  subpixel_peak)

H = W = 19


def _map(*peaks):
    """Score map with gaussian bumps at ((row, col), height) tuples."""
    s = np.zeros((H, W), np.float32)
    rr, cc = np.mgrid[:H, :W]
    for (r, c), v in peaks:
        s += v * np.exp(-0.5 * ((rr - r) ** 2 + (cc - c) ** 2) / 1.5)
    return jnp.asarray(s)


TSZ = jnp.asarray([3.0, 3.0])     # target size in score px
CENTER = np.asarray([(H - 1) / 2.0, (W - 1) / 2.0])
# displacement threshold = 0.8 * sqrt(19*19)/2 = 7.6 score px


def test_subpixel_peak_asymmetric():
    """Parabola through (0.8, 1.0, 0.4) peaks at -0.25 — the offset must go
    TOWARD the larger neighbour (regression: a positive denominator floor
    flipped the sign at every concave peak)."""
    s = np.zeros((9, 9), np.float32)
    s[4, 4] = 1.0
    s[3, 4] = 0.8
    s[5, 4] = 0.4
    s[4, 3] = 0.8
    s[4, 5] = 0.4
    p = np.asarray(subpixel_peak(jnp.asarray(s), jnp.asarray([4, 4])))
    assert np.allclose(p, [3.75, 3.75], atol=1e-5), p


def test_single_peak_normal():
    disp, flag, s1 = localize_advanced(_map(((9, 12), 1.0)), TSZ)
    assert int(flag) == FLAG_NORMAL
    assert float(s1) == pytest.approx(1.0, abs=1e-3)
    assert np.allclose(np.asarray(disp), [9 - CENTER[0], 12 - CENTER[1]],
                       atol=0.1)


def test_low_peak_not_found():
    disp, flag, s1 = localize_advanced(_map(((9, 9), 0.2)), TSZ)
    assert int(flag) == FLAG_NOT_FOUND


def test_near_primary_far_distractor_hard_negative():
    """Primary at the centre (near prev pos), comparable secondary far away:
    hard negative, keep the primary."""
    disp, flag, _ = localize_advanced(
        _map(((9, 9), 1.0), ((1, 17), 0.9)), TSZ)
    assert int(flag) == FLAG_HARD_NEGATIVE
    assert np.linalg.norm(np.asarray(disp)) < 1.0      # stayed on primary


def test_far_primary_near_distractor_switches():
    """Primary jumped far, secondary near the previous position: the tracker
    must switch to the near peak (atom.py:396)."""
    disp, flag, _ = localize_advanced(
        _map(((1, 17), 1.0), ((9, 9), 0.9)), TSZ)
    assert int(flag) == FLAG_HARD_NEGATIVE
    assert np.linalg.norm(np.asarray(disp)) < 1.0      # switched to near peak


def test_both_far_uncertain():
    disp, flag, _ = localize_advanced(
        _map(((1, 17), 1.0), ((17, 1), 0.9)), TSZ)
    assert int(flag) == FLAG_UNCERTAIN


def test_weak_secondary_hard_negative():
    """Secondary between 0.5x and 0.8x primary and above the not-found
    threshold: hard negative without switching (atom.py:403)."""
    disp, flag, _ = localize_advanced(
        _map(((9, 9), 1.0), ((2, 16), 0.6)), TSZ)
    assert int(flag) == FLAG_HARD_NEGATIVE
    assert np.linalg.norm(np.asarray(disp)) < 1.0


def test_faint_secondary_normal():
    disp, flag, _ = localize_advanced(
        _map(((9, 9), 1.0), ((2, 16), 0.3)), TSZ)
    assert int(flag) == FLAG_NORMAL


def test_atom_not_found_freezes_state():
    """Zeroed filter -> zero score -> NOT_FOUND: position, memory and ring
    pointer must not move (atom.py:247,270-274)."""
    from multi_modal_tracking_tpu.classic.atom import ATOMTracker
    t = ATOMTracker(crop_size=96, refine=True, refine_steps=1,
                    num_cg_iter=2, update_interval=100)
    img = np.random.default_rng(0).integers(0, 255, (120, 160, 3), np.uint8)
    t.initialize(img, {"init_bbox": [60.0, 50.0, 30.0, 24.0]})
    st = t._state._replace(filt=jnp.zeros_like(t._state.filt))
    new_st, conf, flag = t._track_jit(t._nets, st,
                                      jnp.asarray(img, jnp.float32), t._mod)
    assert int(flag) == FLAG_NOT_FOUND
    assert np.allclose(np.asarray(new_st.center), np.asarray(st.center))
    assert np.allclose(np.asarray(new_st.target_sz), np.asarray(st.target_sz))
    assert int(new_st.mem_ptr) == int(st.mem_ptr)
    assert np.allclose(np.asarray(new_st.weights), np.asarray(st.weights))


def test_dimp_not_found_freezes_state():
    from multi_modal_tracking_tpu.classic.dimp import DiMPTracker
    t = DiMPTracker(crop_size=96, refine=True, refine_steps=1,
                    init_opt_iter=1, update_interval=100, memory_size=8,
                    augmentation={})
    img = np.random.default_rng(1).integers(0, 255, (120, 160, 3), np.uint8)
    t.initialize(img, {"init_bbox": [60.0, 50.0, 30.0, 24.0]})
    st = t._state._replace(filt=jnp.zeros_like(t._state.filt))
    new_st, conf, flag = t._track_jit(t._nets, st,
                                      jnp.asarray(img, jnp.float32), t._mod)
    assert int(flag) == FLAG_NOT_FOUND
    assert np.allclose(np.asarray(new_st.center), np.asarray(st.center))
    assert int(new_st.mem_ptr) == int(st.mem_ptr)
    assert np.allclose(np.asarray(new_st.samples), np.asarray(st.samples))


def test_backbones_receive_imagenet_normalised_input(monkeypatch):
    """Converted-checkpoint backbones must see (x/255 - mean)/std inputs
    like pytracking's NetWithBackbone.preprocess_image — NOT raw x/255
    (regression: published weights would run off-distribution)."""
    from multi_modal_tracking_tpu.classic.atom import ATOMTracker
    t = ATOMTracker(crop_size=96, refine=False, num_cg_iter=2,
                    update_interval=100, augmentation={})
    seen = {}
    orig = type(t.backbone).apply

    def spy(self, variables, x, *a, **kw):
        seen["min"] = float(jnp.min(x))
        seen["max"] = float(jnp.max(x))
        return orig(self, variables, x, *a, **kw)

    monkeypatch.setattr(type(t.backbone), "apply", spy)
    img = jnp.asarray(np.full((120, 160, 3), 255, np.uint8), jnp.float32)
    # eager (un-jitted) call so the spy sees concrete values
    t._features(t._bb_vars, img, jnp.asarray([62.0, 75.0]),
                jnp.asarray([24.0, 30.0]))
    # white pixels normalise to (1 - mean)/std ~ [2.25, 2.64]; zero-padded
    # crop regions to -mean/std ~ [-2.12, -1.80]
    assert seen["max"] > 2.0, seen
    assert seen["min"] < -1.5, seen


def test_track_reports_flag():
    from multi_modal_tracking_tpu.classic.atom import ATOMTracker
    t = ATOMTracker(crop_size=96, refine=False, num_cg_iter=2,
                    update_interval=100)
    rng = np.random.default_rng(2)
    img = rng.integers(30, 60, (120, 160, 3), np.uint8)
    img[40:72, 50:82] = [230, 60, 30]
    t.initialize(img, {"init_bbox": [50.0, 40.0, 32.0, 32.0]})
    out = t.track(img)
    assert out["flag"] in {"normal", "not_found", "uncertain",
                           "hard_negative"}
    assert np.isfinite(out["target_bbox"]).all()
