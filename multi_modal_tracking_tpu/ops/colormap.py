"""JET pseudo-color mapping for TIR / depth frames, host (numpy) and device
(jnp gather) variants.

Parity target: cv2.applyColorMap(img, cv2.COLORMAP_JET) as used by the
reference at lib/train/data/transforms_rgbt.py:228 (train) and
lib/test/tracker/tracker_utils.py:43 (inference). cv2 converts 3-channel
inputs to grayscale with BGR weights before the LUT; TIR frames are
stored/loaded as equal-channel grayscale so this reduces to the identity
channel pick, but we reproduce the BGR weighting exactly for bit parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_tracking_tpu.ops._jet_lut import JET_LUT_BGR


def _gray_index_np(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img
    assert img.shape[-1] == 3
    # cv2 BGR2GRAY 15-bit fixed point: (9798 R + 19235 G + 3735 B + 16384) >> 15.
    x = img.astype(np.int64)
    g = (9798 * x[..., 2] + 19235 * x[..., 1] + 3735 * x[..., 0] + 16384) >> 15
    return np.clip(g, 0, 255).astype(np.uint8)


def apply_jet_np(img: np.ndarray) -> np.ndarray:
    """uint8 (H,W) or (H,W,3) -> (H,W,3) JET-mapped uint8 (cv2 byte layout)."""
    idx = _gray_index_np(np.asarray(img, dtype=np.uint8))
    return JET_LUT_BGR[idx]


def apply_jet(img: jax.Array) -> jax.Array:
    """Device variant: float/uint8 (..., H, W) or (..., H, W, 3) in 0..255 ->
    (..., H, W, 3) float32 JET-mapped (still 0..255 scale).

    Bit-exact closed form instead of a 256-entry gather: each cv2 JET channel
    is a clamped tent function with slope +/-4 per index,

        B = clamp(min(4 i + 128, -4 i + 638), 0, 255) - [i == 159]
        G = clamp(min(4 i - 128, -4 i + 892), 0, 255)
        R = clamp(min(4 i - 382, -4 i + 1148), 0, 255)

    (verified equal to cv2's LUT on all 256 entries, incl. the single
    off-by-one cv2 rounding artefact at B[159]). Pure elementwise VPU
    arithmetic — XLA fuses it straight into the following normalisation,
    where the gather lowering could not fuse and serialised on TPU.
    """
    if img.ndim >= 3 and img.shape[-1] == 3:
        # Round float channels to the nearest integer BEFORE cv2's BGR2GRAY
        # fixed-point combine (the uint8 frame the reference feeds holds
        # rounded values; truncation here would disagree with the 1-channel
        # branch by a full JET step on interpolated inputs like 100.7).
        xi = jnp.round(img.astype(jnp.float32)).astype(jnp.int32)
        idx = (9798 * xi[..., 2] + 19235 * xi[..., 1] + 3735 * xi[..., 0] + 16384) >> 15
    else:
        idx = jnp.round(img.astype(jnp.float32)).astype(jnp.int32)
    i = jnp.clip(idx, 0, 255).astype(jnp.float32)
    b = jnp.clip(jnp.minimum(4.0 * i + 128.0, -4.0 * i + 638.0), 0.0, 255.0) \
        - (i == 159.0)
    g = jnp.clip(jnp.minimum(4.0 * i - 128.0, -4.0 * i + 892.0), 0.0, 255.0)
    r = jnp.clip(jnp.minimum(4.0 * i - 382.0, -4.0 * i + 1148.0), 0.0, 255.0)
    return jnp.stack([b, g, r], axis=-1)
