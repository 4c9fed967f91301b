"""Training-sample processing: box jitter -> paired crops -> transforms ->
validity checks.

Parity target: lib/train/data/processing_rgbt.py MixformerProcessing
(:43-228): per-frame box jitter with the SAME scale/offset roll for both
modalities (:87-113); crop-size validity (crop_sz >= 1); both modal crops
taken around the jittered RGB box (:181-194); attention-mask validity at
full and stride-16 resolution (:204-220). Unimodal twin: processing.py.
"""
from __future__ import annotations

import random
from typing import Dict, Optional

import cv2
import numpy as np

from multi_modal_tracking_tpu.train.data import processing_utils as prutils
from multi_modal_tracking_tpu.train.data.transforms import (JointAugment,
                                                            flip_norm,
                                                            tensor_and_jitter,
                                                            tensor_and_jitter_rgbt)


def _jittered_box(bbox: np.ndarray, scale_jitter: float, center_jitter: float,
                  rng: random.Random, roll=None) -> np.ndarray:
    """Jitter one xywh box. `roll` shares the jitter across modalities."""
    if roll is None:
        roll = (np.exp(np.asarray([rng.gauss(0, 1), rng.gauss(0, 1)]) * scale_jitter),
                np.asarray([rng.random() - 0.5, rng.random() - 0.5]))
    scale, offset_factor = roll
    bbox = np.asarray(bbox, dtype=np.float32)
    jittered_size = bbox[2:4] * scale
    max_offset = np.sqrt(jittered_size.prod()) * center_jitter
    jittered_center = bbox[0:2] + 0.5 * bbox[2:4] + max_offset * offset_factor
    return np.concatenate([jittered_center - 0.5 * jittered_size, jittered_size]).astype(np.float32)


def _att_mask_valid(att: np.ndarray, output_sz: int) -> bool:
    """False if the (padding) mask is all-True at full or /16 resolution."""
    if att.all():
        return False
    feat = output_sz // 16
    small = cv2.resize(att.astype(np.float32), (feat, feat),
                       interpolation=cv2.INTER_NEAREST) > 0.5
    return not small.all()


class RGBTProcessing:
    """Processes one raw RGBT sample dict into normalised crop tensors."""

    def __init__(self, search_area_factor: Dict[str, float], output_sz: Dict[str, int],
                 center_jitter_factor: Dict[str, float], scale_jitter_factor: Dict[str, float],
                 p_gray: float = 0.05, p_flip: float = 0.5, brightness_jitter: float = 0.2,
                 rng: Optional[random.Random] = None, train: bool = True):
        self.search_area_factor = search_area_factor
        self.output_sz = output_sz
        self.center_jitter_factor = center_jitter_factor
        self.scale_jitter_factor = scale_jitter_factor
        self.brightness_jitter = brightness_jitter
        self.rng = rng or random.Random()
        self.joint = JointAugment(p_gray, p_flip, self.rng)
        # train: per-crop transform chain = ToTensorAndJitter + per-crop
        # RandomHorizontalFlip_Norm(0.5) (base_functions.py:180, applied with
        # joint=False -> an independent roll per frame). val: plain ToTensor
        # (no brightness jitter, no per-crop flip — base_functions.py:184).
        self.train = train

    def __call__(self, data: dict, rng=None) -> dict:
        """data: template_images/search_images [N][2](H,W,3) uint8,
        template_anno/search_anno [N](2,4). Returns processed dict with
        'valid' flag; on False the caller resamples. `rng` (a random.Random)
        makes the sample deterministic per index under threaded loading."""
        rng = rng or self.rng
        state = JointAugment(self.joint.p_gray, self.joint.p_flip, rng).roll()

        for s in ("template", "search"):
            imgs, annos = [], []
            for img_vi, anno_vi in zip(data[s + "_images"], data[s + "_anno"]):
                v, i = self.joint.apply_image_pair(np.asarray(img_vi[0]), np.asarray(img_vi[1]), state)
                a_v = self.joint.apply_box(anno_vi[0], v.shape[1], state)
                a_i = self.joint.apply_box(anno_vi[1], v.shape[1], state)
                imgs.append((v, i))
                annos.append((a_v, a_i))

            # Same jitter roll for both modalities (processing_rgbt.py:87).
            jit = []
            for a_v, a_i in annos:
                roll = (np.exp(np.asarray([rng.gauss(0, 1), rng.gauss(0, 1)])
                               * self.scale_jitter_factor[s]),
                        np.asarray([rng.random() - 0.5, rng.random() - 0.5]))
                jit.append((_jittered_box(a_v, 0, self.center_jitter_factor[s], rng, roll),
                            _jittered_box(a_i, 0, self.center_jitter_factor[s], rng, roll)))

            # Validity: crop size from the (RGB) jittered box.
            for jv, _ in jit:
                if np.ceil(np.sqrt(jv[2] * jv[3]) * self.search_area_factor[s]) < 1:
                    data["valid"] = False
                    return data

            out_v, out_i, boxes_v, boxes_i = [], [], [], []
            for (v, i), (a_v, a_i), (jv, _) in zip(imgs, annos, jit):
                try:
                    # Crop box always from the jittered RGB box (:181-194).
                    crop_v, rf_v, att_v = prutils.sample_target(v, jv, self.search_area_factor[s],
                                                                self.output_sz[s])
                    crop_i, rf_i, att_i = prutils.sample_target(i, jv, self.search_area_factor[s],
                                                                self.output_sz[s])
                except ValueError:
                    data["valid"] = False
                    return data
                if not (_att_mask_valid(att_v, self.output_sz[s])
                        and _att_mask_valid(att_i, self.output_sz[s])):
                    data["valid"] = False
                    return data
                b_v = prutils.transform_image_to_crop(a_v, jv, rf_v,
                                                      self.output_sz[s], normalize=True)
                b_i = prutils.transform_image_to_crop(a_i, jv, rf_i,
                                                      self.output_sz[s], normalize=True)
                cv_, ci_ = tensor_and_jitter_rgbt(
                    crop_v, crop_i, self.brightness_jitter if self.train else 0.0,
                    rng)
                # per-crop flip, one roll per frame shared by both modalities
                # (the reference zips (crop_v, crop_i) into one tuple before
                # the joint=False transform, processing_rgbt.py:197-202)
                if self.train and rng.random() < 0.5:
                    cv_, b_v = flip_norm(cv_, b_v)
                    ci_, b_i = flip_norm(ci_, b_i)
                boxes_v.append(b_v)
                boxes_i.append(b_i)
                out_v.append(cv_)
                out_i.append(ci_)

            data[s + "_images_v"] = out_v
            data[s + "_images_i"] = out_i
            data[s + "_anno_v"] = boxes_v
            data[s + "_anno_i"] = boxes_i
            del data[s + "_images"], data[s + "_anno"]

        data["valid"] = True
        return data


class UnimodalProcessing:
    """Unimodal twin (lib/train/data/processing.py semantics)."""

    def __init__(self, search_area_factor, output_sz, center_jitter_factor,
                 scale_jitter_factor, p_gray: float = 0.05, p_flip: float = 0.5,
                 brightness_jitter: float = 0.2, rng: Optional[random.Random] = None,
                 train: bool = True):
        self.search_area_factor = search_area_factor
        self.output_sz = output_sz
        self.center_jitter_factor = center_jitter_factor
        self.scale_jitter_factor = scale_jitter_factor
        self.brightness_jitter = brightness_jitter
        self.rng = rng or random.Random()
        self.joint = JointAugment(p_gray, p_flip, self.rng)
        self.train = train          # see RGBTProcessing.train

    def __call__(self, data: dict, rng=None) -> dict:
        rng = rng or self.rng
        state = JointAugment(self.joint.p_gray, self.joint.p_flip, rng).roll()
        for s in ("template", "search"):
            imgs, annos = [], []
            for img, anno in zip(data[s + "_images"], data[s + "_anno"]):
                v, _ = self.joint.apply_image_pair(np.asarray(img), np.asarray(img), state)
                imgs.append(v)
                annos.append(self.joint.apply_box(anno, v.shape[1], state))
            out, boxes = [], []
            for v, a in zip(imgs, annos):
                jv = _jittered_box(a, self.scale_jitter_factor[s],
                                   self.center_jitter_factor[s], rng)
                if np.ceil(np.sqrt(max(jv[2], 0) * max(jv[3], 0))
                           * self.search_area_factor[s]) < 1:
                    data["valid"] = False
                    return data
                try:
                    crop, rf, att = prutils.sample_target(v, jv, self.search_area_factor[s],
                                                          self.output_sz[s])
                except ValueError:
                    data["valid"] = False
                    return data
                if not _att_mask_valid(att, self.output_sz[s]):
                    data["valid"] = False
                    return data
                b = prutils.transform_image_to_crop(a, jv, rf,
                                                    self.output_sz[s], normalize=True)
                c = tensor_and_jitter(
                    crop, self.brightness_jitter if self.train else 0.0, rng)
                if self.train and rng.random() < 0.5:   # per-crop flip (:180)
                    c, b = flip_norm(c, b)
                boxes.append(b)
                out.append(c)
            data[s + "_images"] = out
            data[s + "_anno"] = boxes
        data["valid"] = True
        return data
