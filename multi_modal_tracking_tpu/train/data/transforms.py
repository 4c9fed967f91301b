"""Numpy augmentation transforms for the data workers.

Parity targets: lib/train/data/transforms_rgbt.py —
  ToGrayscale (:277-300, RGB modality only, p=0.05 in the joint transform),
  RandomHorizontalFlip (p=0.5, joint; template & search share the roll —
  base_functions.py:177 + processing_rgbt.py:153-159 new_roll=False),
  ToTensorAndJitter (:207-244): RGB brightness jitter (factor U[1-b, 1+b]),
  TIR draws an independent factor from the same full-strength distribution
  (the reference's half-strength roll_tir is dead code) then the JET colormap,
  Normalize (ImageNet mean/std, both modalities).

Outputs float32 HWC (normalised); channel-first conversion is not needed —
the models are NHWC.
"""
from __future__ import annotations

import random
from typing import Optional

import numpy as np

from multi_modal_tracking_tpu.ops.colormap import apply_jet_np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


class JointAugment:
    """Per-sample joint augmentation state: grayscale + horizontal flip,
    rolled once per training sample and applied to template AND search."""

    def __init__(self, p_gray: float = 0.05, p_flip: float = 0.5,
                 rng: Optional[random.Random] = None):
        self.p_gray = p_gray
        self.p_flip = p_flip
        self.rng = rng or random

    def roll(self):
        return {"gray": self.rng.random() < self.p_gray,
                "flip": self.rng.random() < self.p_flip}

    @staticmethod
    def apply_image_pair(img_v: np.ndarray, img_i: np.ndarray, state: dict):
        if state["gray"]:
            # RGB modality only (transforms_rgbt.py ToGrayscale). cv2's
            # cvtColor(RGB2GRAY) is fixed point — (9798 R + 19235 G + 3735 B
            # + 16384) >> 15 — i.e. rounds to nearest; a float astype would
            # truncate ~half of all pixels one level darker
            # (bit-exactness verified in tests/test_data_pipeline.py).
            if np.issubdtype(img_v.dtype, np.integer):
                r, gg, b = (img_v[..., c].astype(np.int32) for c in range(3))
                g = (9798 * r + 19235 * gg + 3735 * b + (1 << 14)) >> 15
                g = g.astype(img_v.dtype)
            else:
                g = (0.299 * img_v[..., 0] + 0.587 * img_v[..., 1]
                     + 0.114 * img_v[..., 2]).astype(img_v.dtype)
            img_v = np.stack([g, g, g], axis=-1)
        if state["flip"]:
            img_v = img_v[:, ::-1].copy()
            img_i = img_i[:, ::-1].copy()
        return img_v, img_i

    @staticmethod
    def apply_box(box_xywh: np.ndarray, img_w: int, state: dict) -> np.ndarray:
        if state["flip"]:
            b = np.asarray(box_xywh, dtype=np.float32).copy()
            b[0] = img_w - b[0] - b[2] - 1
            return b
        return np.asarray(box_xywh, dtype=np.float32)


def tensor_and_jitter_rgbt(img_v: np.ndarray, img_i: np.ndarray,
                           brightness_jitter: float = 0.2,
                           rng: Optional[random.Random] = None):
    """uint8 crops -> normalised float32 (HWC) pair with brightness jitter and
    the TIR JET pseudo-colour mapping.

    TIR draws an INDEPENDENT factor from the same full-strength distribution:
    the reference defines a half-strength roll_tir but its transform_image
    calls self.roll() (transforms_rgbt.py:219-228 — roll_tir is dead code)."""
    rnd = rng or random
    bf = rnd.uniform(max(0, 1 - brightness_jitter), 1 + brightness_jitter)
    tir_f = rnd.uniform(max(0, 1 - brightness_jitter), 1 + brightness_jitter)

    v = np.clip(img_v.astype(np.float32) * (bf / 255.0), 0.0, 1.0)
    i8 = np.clip(img_i.astype(np.float32) * tir_f, 0.0, 255.0).astype(np.uint8)
    i = apply_jet_np(i8).astype(np.float32) / 255.0

    v = (v - IMAGENET_MEAN) / IMAGENET_STD
    i = (i - IMAGENET_MEAN) / IMAGENET_STD
    return v, i


def flip_norm(img: np.ndarray, box_norm: np.ndarray):
    """Horizontal flip of a processed crop + its [0,1]-normalised xywh box
    (transforms_rgbt.py:351-365 RandomHorizontalFlip_Norm: corner x -> 1-x,
    so the box becomes (1-x-w, y, w, h))."""
    flipped = np.ascontiguousarray(img[:, ::-1])
    b = np.asarray(box_norm, np.float32).copy()
    b[0] = 1.0 - b[0] - b[2]
    return flipped, b


def tensor_and_jitter(img: np.ndarray, brightness_jitter: float = 0.2,
                      rng: Optional[random.Random] = None) -> np.ndarray:
    """Unimodal: uint8 crop -> normalised float32 with brightness jitter."""
    rnd = rng or random
    bf = rnd.uniform(max(0, 1 - brightness_jitter), 1 + brightness_jitter)
    v = np.clip(img.astype(np.float32) * (bf / 255.0), 0.0, 1.0)
    return (v - IMAGENET_MEAN) / IMAGENET_STD
