"""Alpha-Refine training path: loss drops on a synthetic box->mask task."""
import numpy as np
import pytest
import jax.numpy as jnp

from multi_modal_tracking_tpu.train.refine import (batch_from_box_dataset,
                                                   box_to_mask,
                                                   build_refine_trainer,
                                                   mask_losses)


def test_box_to_mask_and_losses():
    m = box_to_mask(np.asarray([2.0, 3.0, 4.0, 5.0]), 12, 16)
    assert m.sum() == 4 * 5
    logits = jnp.full((2, 12, 16, 1), 8.0)       # predict all-ones
    target = jnp.ones((2, 12, 16, 1))
    loss, metrics = mask_losses(logits, target)
    assert float(loss) < 0.01
    loss_bad, _ = mask_losses(-logits, target)
    assert float(loss_bad) > 1.0


def _synthetic_samples(n, rng, size=24):
    samples = []
    for _ in range(n):
        img = rng.integers(30, 60, (120, 160, 3), np.uint8)
        x, y = rng.integers(20, 100), rng.integers(20, 70)
        img[y:y + size, x:x + size] = [220, 40, 40]
        box = np.asarray([x, y, size, size], np.float32)
        samples.append((img, box, img, box))
    return samples


def test_refine_train_step_reduces_loss():
    pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    net, spec, state, step = build_refine_trainer(input_sz=64, lr=3e-4)
    batch = batch_from_box_dataset(_synthetic_samples(4, rng), 64, rng)
    assert batch["test_masks"].shape == (4, 64, 64, 1)
    assert 0.0 < batch["test_masks"].mean() < 1.0
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_real_mask_target_path():
    pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.integers(30, 60, (120, 160, 3), np.uint8)
    mask = np.zeros((120, 160), np.float32)
    mask[40:70, 50:90] = 1.0
    batch = batch_from_box_dataset(
        [(img, np.asarray([50.0, 40, 40, 30]), img, mask)], 64, rng)
    m = batch["test_masks"][0, :, :, 0]
    # mask occupies ~ (1/2)^2 of the 2x crop
    assert 0.1 < m.mean() < 0.5


def test_training_crops_match_inference_geometry():
    """The training batch must use the ANISOTROPIC sample_target_se window —
    the same crop ARcmSeg feeds the net at inference (ARcm_seg.py). For a
    wide box the in-crop box must fill ~the whole crop width and ~half its
    height (2x factor per axis), not the square-crop geometry."""
    pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    img = rng.integers(30, 60, (240, 320, 3), np.uint8)
    box = np.asarray([60.0, 100.0, 120.0, 30.0])      # 4:1 aspect
    batch = batch_from_box_dataset([(img, box, img, box)], 64, rng)
    x, y, w, h = batch["ref_boxes"][0]
    assert w == pytest.approx(32, abs=2)              # 120 / (2*120) * 64
    assert h == pytest.approx(32, abs=2)              # 30 / (2*30) * 64
    # and the rasterised target mask is ~square for the same reason
    m = batch["test_masks"][0, :, :, 0]
    ys, xs = np.nonzero(m)
    assert (xs.max() - xs.min() + 1) == pytest.approx(32, abs=2)
    assert (ys.max() - ys.min() + 1) == pytest.approx(32, abs=2)

    # cross-check against the inference wrapper's own crop box
    from multi_modal_tracking_tpu.models.alpha_refine import (
        sample_target_se, transform_box_to_crop_se)
    _, hf, wf = sample_target_se(img, box, 2.0, 64)
    np.testing.assert_allclose(batch["ref_boxes"][0],
                               transform_box_to_crop_se(box, hf, wf, 64))
