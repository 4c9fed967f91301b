"""Init-time augmentation for the classic (ATOM/DiMP/ECO) trackers.

Parity targets: external/AR/pytracking/features/augmentation.py and
lib/test/utils/augmentation.py (Transform/Blur/FlipHorizontal/FlipVertical),
used by generate_init_samples (external/AR/pytracking/tracker/atom/atom.py:473-
523, dimp equivalent): the first-frame sample memory is filled with an
augmented batch — identity, relative shifts, horizontal flip, separable
gaussian blurs, rotations — plus channel-dropout copies of the identity
FEATURES (atom.py:517-521 applies F.dropout2d to the extracted features,
not the image).

TPU-first redesign: every transform is a pure jnp function with static
parameters (shift offsets, blur kernels, rotation grids are compile-time
constants), so the whole augmented batch is built inside the tracker's
jitted init — one batched backbone forward over (A, H, W, 3) instead of the
reference's per-transform python loop.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# pytracking's default DiMP/ATOM augmentation recipe
# (external/AR/pytracking/parameter/dimp/dimp50.py-style params.augmentation)
DEFAULT_AUGMENTATION = {
    "fliplr": True,
    "rotate": [10, -10, 45, -45],
    "blur": [(3, 1), (1, 3), (2, 2)],
    "relativeshift": [(0.6, 0.6), (-0.6, 0.6), (0.6, -0.6), (-0.6, -0.6)],
    "dropout": (2, 0.2),
}

# ECO's own init-augmentation zoo (parameter/eco/default.py:53-57), verbatim:
# 4 absolute shifts, flip, 12 rotations, 5 blurs, 7 dropout feature copies
ECO_AUGMENTATION = {
    "fliplr": True,
    "rotate": [5, -5, 10, -10, 20, -20, 30, -30, 45, -45, -60, 60],
    "blur": [(2, 0.2), (0.2, 2), (3, 1), (1, 3), (2, 2)],
    "shift": [(6, 6), (-6, 6), (6, -6), (-6, -6)],
    "dropout": (7, 0.2),
}


def translate(img: jax.Array, ty: int, tx: int) -> jax.Array:
    """Shift content by (+ty, +tx) px with zero fill (augmentation.py
    Translation): the target centred in the crop appears displaced by the
    shift. Static shift -> plain pad + slice."""
    H, W = img.shape[0], img.shape[1]
    py0, py1 = max(ty, 0), max(-ty, 0)
    px0, px1 = max(tx, 0), max(-tx, 0)
    pad = [(py0, py1), (px0, px1)] + [(0, 0)] * (img.ndim - 2)
    out = jnp.pad(img, pad)
    return out[py1:py1 + H, px1:px1 + W]


def fliplr(img: jax.Array) -> jax.Array:
    """augmentation.py FlipHorizontal."""
    return img[:, ::-1]


def flipud(img: jax.Array) -> jax.Array:
    """lib/test/utils/augmentation.py:68 FlipVertical."""
    return img[::-1]


def _gauss_kernel(sigma: float) -> np.ndarray:
    sigma = max(float(sigma), 1e-3)
    r = int(np.ceil(2 * sigma))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-x * x / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def blur(img: jax.Array, sigma: Tuple[float, float]) -> jax.Array:
    """Separable gaussian blur, 'same' padding (augmentation.py Blur: two 1-D
    conv2d passes). sigma = (sigma_y, sigma_x); static -> kernels are
    compile-time constants."""
    sy, sx = (sigma, sigma) if np.isscalar(sigma) else sigma
    ky = jnp.asarray(_gauss_kernel(sy))
    kx = jnp.asarray(_gauss_kernel(sx))
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    x = jnp.moveaxis(x, -1, 0)[:, None]                 # (C, 1, H, W)
    x = jax.lax.conv_general_dilated(x, ky[None, None, :, None], (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, kx[None, None, None, :], (1, 1), "SAME")
    x = jnp.moveaxis(x[:, 0], 0, -1)
    return x[..., 0] if squeeze else x


def rotate(img: jax.Array, angle_deg: float) -> jax.Array:
    """Bilinear rotation about the crop centre, zero fill (augmentation.py
    Rotate). The sample grid is a static constant; the gather is one
    map_coordinates call."""
    H, W = img.shape[0], img.shape[1]
    a = np.deg2rad(float(angle_deg))
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    ys, xs = yy - cy, xx - cx
    src_y = np.cos(a) * ys - np.sin(a) * xs + cy
    src_x = np.sin(a) * ys + np.cos(a) * xs + cx
    coords = [jnp.asarray(src_y), jnp.asarray(src_x)]

    def one_channel(c):
        return jax.scipy.ndimage.map_coordinates(c, coords, order=1, cval=0.0)

    if img.ndim == 2:
        return one_channel(img.astype(jnp.float32))
    return jnp.stack([one_channel(img[..., c].astype(jnp.float32))
                      for c in range(img.shape[-1])], axis=-1)


def scale_about_center(img: jax.Array, factor: float) -> jax.Array:
    """Zoom about the centre keeping the output size (augmentation.py Scale):
    resize by `factor` then centre-crop / zero-pad back."""
    H, W = img.shape[0], img.shape[1]
    nh, nw = max(int(round(H * factor)), 1), max(int(round(W * factor)), 1)
    shape = (nh, nw) + img.shape[2:]
    z = jax.image.resize(img.astype(jnp.float32), shape, method="bilinear")
    if nh >= H:
        y0, x0 = (nh - H) // 2, (nw - W) // 2
        return z[y0:y0 + H, x0:x0 + W]
    py, px = (H - nh) // 2, (W - nw) // 2
    pad = [(py, H - nh - py), (px, W - nw - px)] + [(0, 0)] * (img.ndim - 2)
    return jnp.pad(z, pad)


def feature_dropout2d(feat: jax.Array, num: int, prob: float,
                      key: jax.Array) -> jax.Array:
    """Channel dropout copies of one feature map (atom.py:517-521
    F.dropout2d(..., training=True) on the identity init sample): zero whole
    channels with prob and rescale survivors by 1/(1-prob).
    feat (h, w, C) -> (num, h, w, C)."""
    keep = jax.random.bernoulli(key, 1.0 - prob, (num, 1, 1, feat.shape[-1]))
    return feat[None] * keep.astype(feat.dtype) / (1.0 - prob)


class InitAugmenter:
    """Static transform list -> one batched augmented crop tensor.

    Mirrors generate_init_samples' transform assembly (atom.py:493-513):
    identity first, then shift / relativeshift / fliplr / blur / scale /
    rotate, each optionally offset by a random shift drawn once at
    construction (random_shift_factor). `shifts[i]` is the target-centre
    displacement of sample i in crop px, used to move the classifier label.
    """

    def __init__(self, crop_size: int, spec: Optional[dict] = None,
                 random_shift_factor: float = 1.0 / 3.0, seed: int = 0):
        spec = DEFAULT_AUGMENTATION if spec is None else spec
        self.crop_size = int(crop_size)
        rng = np.random.default_rng(seed)
        sz = float(crop_size)

        def rand_shift():
            if random_shift_factor <= 0:
                return (0, 0)
            s = (rng.random(2) - 0.5) * sz * random_shift_factor
            return (int(s[0]), int(s[1]))

        ops: List[Tuple] = [("identity", None, (0, 0))]
        for sh in spec.get("shift", []):
            ops.append(("shift", None, (int(sh[0]), int(sh[1]))))
        for sh in spec.get("relativeshift", []):
            ops.append(("shift", None,
                        (int(sh[0] * sz / 2), int(sh[1] * sz / 2))))
        if spec.get("fliplr", False):
            ops.append(("fliplr", None, rand_shift()))
        for sigma in spec.get("blur", []):
            ops.append(("blur", sigma, rand_shift()))
        for factor in spec.get("scale", []):
            ops.append(("scale", float(factor), rand_shift()))
        for angle in spec.get("rotate", []):
            ops.append(("rotate", float(angle), rand_shift()))
        self.ops = ops
        self.dropout = spec.get("dropout", None)        # (num, prob) on feats

    @property
    def num_image_samples(self) -> int:
        return len(self.ops)

    @property
    def num_samples(self) -> int:
        return len(self.ops) + (self.dropout[0] if self.dropout else 0)

    @property
    def shifts(self) -> np.ndarray:
        """(A, 2) label-centre displacement (dy, dx) per sample, crop px.
        fliplr mirrors a centred target onto itself, so only the explicit
        shift offsets move the label."""
        base = np.asarray([op[2] for op in self.ops], np.float32)
        if self.dropout:
            base = np.concatenate([base, np.zeros((self.dropout[0], 2),
                                                  np.float32)])
        return base

    def __call__(self, crop: jax.Array) -> jax.Array:
        """crop (H, W, C) -> (num_image_samples, H, W, C)."""
        out = []
        for kind, arg, shift in self.ops:
            x = crop
            if kind == "fliplr":
                x = fliplr(x)
            elif kind == "blur":
                x = blur(x, arg)
            elif kind == "scale":
                x = scale_about_center(x, arg)
            elif kind == "rotate":
                x = rotate(x, arg)
            if shift != (0, 0):
                x = translate(x, shift[0], shift[1])
            out.append(x.astype(jnp.float32))
        return jnp.stack(out)

    def augment_features(self, feats: jax.Array, key: jax.Array) -> jax.Array:
        """Append feature-dropout copies of the identity sample:
        feats (A_img, h, w, C) -> (num_samples, h, w, C)."""
        if not self.dropout:
            return feats
        num, prob = self.dropout
        extra = feature_dropout2d(feats[0], int(num), float(prob), key)
        return jnp.concatenate([feats, extra.astype(feats.dtype)], axis=0)
