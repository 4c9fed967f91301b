"""Init-sample augmentation for classic trackers
(external/AR/pytracking/features/augmentation.py +
atom.py:473-523 generate_init_samples)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_modal_tracking_tpu.classic.augmentation import (
    DEFAULT_AUGMENTATION, InitAugmenter, blur, feature_dropout2d, fliplr,
    flipud, rotate, scale_about_center, translate)


def test_translate_shifts_content():
    img = jnp.zeros((8, 8)).at[2, 3].set(1.0)
    out = translate(img, 2, -1)
    assert float(out[4, 2]) == 1.0
    assert float(out.sum()) == 1.0
    # content shifted off the edge disappears, zero fill
    out2 = translate(img, -3, 0)
    assert float(out2.sum()) == 0.0


def test_flips():
    img = jnp.arange(12.0).reshape(3, 4)
    np.testing.assert_allclose(np.asarray(fliplr(img)), np.asarray(img)[:, ::-1])
    np.testing.assert_allclose(np.asarray(flipud(img)), np.asarray(img)[::-1])


def test_blur_preserves_mean_and_smooths():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    out = blur(img, (2, 2))
    assert out.shape == img.shape
    # interior mean preserved (normalised kernel), variance reduced
    assert float(jnp.abs(out[8:-8, 8:-8].mean() - img[8:-8, 8:-8].mean())) < 0.02
    assert float(out.var()) < float(img.var())


def test_rotate_90_matches_transpose():
    img = jnp.zeros((9, 9)).at[1, 4].set(1.0)    # above centre
    out = rotate(img, 90.0)
    # rotating by 90 deg moves the peak onto the horizontal axis
    peak = jnp.unravel_index(jnp.argmax(out), out.shape)
    assert int(peak[0]) == 4 and int(peak[1]) in (1, 7)
    assert float(out.max()) > 0.9


def test_scale_keeps_shape():
    img = jnp.ones((16, 16, 3))
    up = scale_about_center(img, 1.5)
    dn = scale_about_center(img, 0.5)
    assert up.shape == img.shape and dn.shape == img.shape
    assert float(dn[0, 0, 0]) == 0.0        # zero pad ring
    assert float(dn[8, 8, 0]) == pytest.approx(1.0)


def test_feature_dropout_channels():
    feat = jnp.ones((4, 4, 64))
    out = feature_dropout2d(feat, 3, 0.5, jax.random.PRNGKey(0))
    assert out.shape == (3, 4, 4, 64)
    per_chan = np.asarray(out[0, 0, 0])     # each channel all-0 or 1/(1-p)
    assert set(np.round(np.unique(per_chan), 4)) <= {0.0, 2.0}
    # spatially constant per channel
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.asarray(out[0, 3, 3]))


def test_augmenter_batch_and_shifts():
    aug = InitAugmenter(64, seed=0)
    # default recipe: 1 identity + 4 relshift + 1 flip + 3 blur + 4 rotate = 13
    assert aug.num_image_samples == 13
    assert aug.num_samples == 15            # + 2 dropout feature copies
    crop = jnp.asarray(np.random.default_rng(1).uniform(
        size=(64, 64, 3)).astype(np.float32))
    batch = jax.jit(aug)(crop)
    assert batch.shape == (13, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(batch[0]), np.asarray(crop))
    sh = aug.shifts
    assert sh.shape == (15, 2)
    np.testing.assert_allclose(sh[0], [0, 0])
    np.testing.assert_allclose(sh[1], [int(0.6 * 32), int(0.6 * 32)])  # relativeshift


def test_augmenter_empty_spec_is_identity_only():
    aug = InitAugmenter(32, spec={})
    assert aug.num_samples == 1
    crop = jnp.ones((32, 32, 3))
    np.testing.assert_allclose(np.asarray(aug(crop)[0]), 1.0)


def test_atom_init_fills_memory_with_augmented_batch():
    from multi_modal_tracking_tpu.classic.atom import ATOMTracker
    trk = ATOMTracker(crop_size=64, memory_size=16, refine=False,
                      num_gn_iter=1, num_cg_iter=2)
    img = np.zeros((120, 160, 3), np.float32)
    img[40:70, 60:100] = 200.0
    trk.initialize(img, {"init_bbox": [60, 40, 40, 30]})
    st = trk._state
    A = trk.augmenter.num_samples
    assert int(st.mem_ptr) == A == 15
    w = np.asarray(st.weights)
    np.testing.assert_allclose(w[:A], 1.0 / A)
    assert w[A:].sum() == 0.0
    # augmented samples differ from the identity sample
    s = np.asarray(st.samples)
    assert np.abs(s[1] - s[0]).max() > 0
    # label centres moved for the shifted samples
    lbl = np.asarray(st.labels)
    c0 = np.unravel_index(lbl[0].argmax(), lbl[0].shape)
    c1 = np.unravel_index(lbl[1].argmax(), lbl[1].shape)
    assert c0 != c1
    out = trk.track(img)
    assert len(out["target_bbox"]) == 4


def test_memory_ring_protects_slot0():
    from multi_modal_tracking_tpu.classic.atom import ATOMTracker
    trk = ATOMTracker(crop_size=64, memory_size=16, refine=False,
                      num_gn_iter=1, num_cg_iter=2, augmentation={})
    img = np.zeros((120, 160, 3), np.float32)
    img[40:70, 60:100] = 200.0
    trk.initialize(img, {"init_bbox": [60, 40, 40, 30]})
    sample0 = np.asarray(trk._state.samples[0])
    for _ in range(20):                      # > memory_size frames
        trk.track(img)
    np.testing.assert_allclose(np.asarray(trk._state.samples[0]), sample0)
