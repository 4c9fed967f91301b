"""Host-side (numpy + cv2) crop utilities for the training data pipeline.

Parity target: lib/train/data/processing_utils.py — `sample_target`
(:15-83, square crop with BORDER_CONSTANT zero padding + attention mask),
`transform_image_to_crop` (:86-109), `jittered_center_crop` (:112+),
`perturb_box` (SPM negative proposals).

The tracking inference path uses the fused on-device equivalent
(multi_modal_tracking_tpu/ops/crop.py); this module feeds the data workers.
"""
from __future__ import annotations

import math
import random
from typing import List, Optional

import cv2
import numpy as np


def sample_target(im: np.ndarray, target_bb, search_area_factor: float,
                  output_sz: Optional[int] = None):
    """Square crop of area search_area_factor^2 * box area around the box.

    Returns (crop, resize_factor, att_mask) with att_mask True on padded
    pixels (resized to output_sz).
    """
    x, y, w, h = [float(v) for v in target_bb]
    crop_sz = math.ceil(math.sqrt(w * h) * search_area_factor)
    if crop_sz < 1:
        raise ValueError("Too small bounding box.")

    x1 = int(round(x + 0.5 * w - crop_sz * 0.5))
    x2 = int(x1 + crop_sz)
    y1 = int(round(y + 0.5 * h - crop_sz * 0.5))
    y2 = int(y1 + crop_sz)

    x1_pad = int(max(0, -x1))
    x2_pad = int(max(x2 - im.shape[1] + 1, 0))
    y1_pad = int(max(0, -y1))
    y2_pad = int(max(y2 - im.shape[0] + 1, 0))

    im_crop = im[y1 + y1_pad:y2 - y2_pad, x1 + x1_pad:x2 - x2_pad, :]
    im_crop_padded = cv2.copyMakeBorder(im_crop, y1_pad, y2_pad, x1_pad, x2_pad,
                                        cv2.BORDER_CONSTANT)
    H, W = im_crop_padded.shape[:2]
    att_mask = np.ones((H, W))
    end_x = -x2_pad if x2_pad else None
    end_y = -y2_pad if y2_pad else None
    att_mask[y1_pad:end_y, x1_pad:end_x] = 0

    if output_sz is not None:
        resize_factor = output_sz / crop_sz
        im_crop_padded = cv2.resize(im_crop_padded, (output_sz, output_sz))
        att_mask = cv2.resize(att_mask, (output_sz, output_sz)).astype(np.bool_)
        return im_crop_padded, resize_factor, att_mask
    return im_crop_padded, 1.0, att_mask.astype(np.bool_)


def transform_image_to_crop(box_in: np.ndarray, box_extract: np.ndarray,
                            resize_factor: float, crop_sz: int,
                            normalize: bool = False) -> np.ndarray:
    """Map a box from image coords into the crop's coordinate frame."""
    box_in = np.asarray(box_in, dtype=np.float32)
    box_extract = np.asarray(box_extract, dtype=np.float32)
    box_extract_center = box_extract[0:2] + 0.5 * box_extract[2:4]
    box_in_center = box_in[0:2] + 0.5 * box_in[2:4]
    box_out_center = (crop_sz - 1) / 2 + (box_in_center - box_extract_center) * resize_factor
    box_out_wh = box_in[2:4] * resize_factor
    box_out = np.concatenate([box_out_center - 0.5 * box_out_wh, box_out_wh])
    return box_out / crop_sz if normalize else box_out


def jittered_center_crop(frames: List[np.ndarray], box_extract: List[np.ndarray],
                         box_gt: List[np.ndarray], search_area_factor: float,
                         output_sz: int):
    """Crop each frame around box_extract; transform box_gt into crop coords
    (normalised). Returns (crops, boxes, att_masks)."""
    out = [sample_target(f, bx, search_area_factor, output_sz)
           for f, bx in zip(frames, box_extract)]
    crops, resize_factors, att_masks = zip(*out)
    boxes = [transform_image_to_crop(bg, bx, rf, output_sz, normalize=True)
             for bg, bx, rf in zip(box_gt, box_extract, resize_factors)]
    return list(crops), boxes, list(att_masks)


def rect_iou(a: np.ndarray, b: np.ndarray) -> float:
    ax2, ay2 = a[0] + a[2], a[1] + a[3]
    bx2, by2 = b[0] + b[2], b[1] + b[3]
    ix = max(0.0, min(ax2, bx2) - max(a[0], b[0]))
    iy = max(0.0, min(ay2, by2) - max(a[1], b[1]))
    inter = ix * iy
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def perturb_box(box: np.ndarray, min_iou: float = 0.5, max_iou: float = 1.0,
                sigma_factor: float = 0.1, rng: Optional[random.Random] = None):
    """Randomly perturb a box to a target IoU range (SPM proposal generation,
    reference processing_utils.perturb_box semantics)."""
    rnd = rng or random
    box = np.asarray(box, dtype=np.float32)
    for _ in range(100):
        c_x = box[0] + 0.5 * box[2]
        c_y = box[1] + 0.5 * box[3]
        c_x_per = rnd.gauss(c_x, sigma_factor * box[2])
        c_y_per = rnd.gauss(c_y, sigma_factor * box[3])
        w_per = max(1.0, rnd.gauss(box[2], sigma_factor * box[2]))
        h_per = max(1.0, rnd.gauss(box[3], sigma_factor * box[3]))
        box_per = np.asarray([c_x_per - 0.5 * w_per, c_y_per - 0.5 * h_per,
                              w_per, h_per], dtype=np.float32)
        iou = rect_iou(box, box_per)
        if min_iou <= iou <= max_iou:
            return box_per, iou
    return box.copy(), 1.0
