"""Device crop vs the cv2 pipeline the reference uses (sample_target)."""
import math

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_modal_tracking_tpu.ops.crop import crop_resize


def cv2_sample_target(im, target_bb, search_area_factor, output_sz):
    """cv2 oracle reproducing reference lib/train/data/processing_utils.py:15."""
    x, y, w, h = target_bb
    crop_sz = math.ceil(math.sqrt(w * h) * search_area_factor)
    assert crop_sz >= 1
    x1 = int(round(x + 0.5 * w - crop_sz * 0.5))
    x2 = int(x1 + crop_sz)
    y1 = int(round(y + 0.5 * h - crop_sz * 0.5))
    y2 = int(y1 + crop_sz)
    x1_pad = int(max(0, -x1))
    x2_pad = int(max(x2 - im.shape[1] + 1, 0))
    y1_pad = int(max(0, -y1))
    y2_pad = int(max(y2 - im.shape[0] + 1, 0))
    im_crop = im[y1 + y1_pad:y2 - y2_pad, x1 + x1_pad:x2 - x2_pad, :]
    im_crop_padded = cv2.copyMakeBorder(im_crop, y1_pad, y2_pad, x1_pad, x2_pad, cv2.BORDER_CONSTANT)
    resize_factor = output_sz / crop_sz
    return cv2.resize(im_crop_padded, (output_sz, output_sz)), resize_factor


CASES = [
    # (H, W, box, factor, out_sz)
    (240, 320, (100.0, 80.0, 60.0, 40.0), 2.0, 128),       # fully inside
    (240, 320, (10.0, 10.0, 30.0, 30.0), 5.0, 288),        # pads top-left
    (240, 320, (280.0, 200.0, 60.0, 60.0), 4.5, 288),      # pads bottom-right
    (240, 320, (-20.0, -10.0, 50.0, 40.0), 2.0, 128),      # box partially outside
    (100, 100, (5.0, 5.0, 90.0, 90.0), 2.0, 128),          # crop bigger than image
    (480, 640, (300.0, 200.0, 11.0, 17.0), 5.0, 288),      # small odd box
]


@pytest.mark.parametrize("H,W,box,factor,out_sz", CASES)
def test_crop_matches_cv2(H, W, box, factor, out_sz):
    rng = np.random.default_rng(hash((H, W, box)) % 2**32)
    im = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    ref, ref_rf = cv2_sample_target(im, box, factor, out_sz)
    out, rf = jax.jit(
        lambda img, b: crop_resize(img, b, factor, out_sz)
    )(jnp.asarray(im), jnp.asarray(box, dtype=jnp.float32))
    out = np.asarray(out)
    assert abs(float(rf) - ref_rf) < 1e-6
    # cv2 resize uses fixed-point (11-bit) coefficients + uint8 rounding:
    # worst case ~2 on the 0..255 scale (~0.008 sigma post-normalisation).
    diff = np.abs(out - ref.astype(np.float32))
    assert diff.max() <= 2.0, f"max diff {diff.max()}"
    assert diff.mean() < 0.5


def test_crop_zero_padding_region():
    """Padding region must be exactly zero (BORDER_CONSTANT parity)."""
    im = np.full((50, 50, 3), 255, dtype=np.uint8)
    box = (-100.0, -100.0, 30.0, 30.0)  # window entirely above/left of image
    out, _ = crop_resize(jnp.asarray(im), jnp.asarray(box, dtype=jnp.float32), 2.0, 64)
    assert float(jnp.abs(out).max()) == 0.0
