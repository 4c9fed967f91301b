"""Dataset adapter base classes.

Parity target: lib/train/dataset/base_video_dataset.py:6-109 — the adapter
API the sampler consumes:
  get_num_sequences() -> int
  get_sequence_info(seq_id) -> {'bbox': (N,[2,]4), 'valid': (N,), 'visible': (N,)}
  get_frames(seq_id, ids, info) -> (frames, {'bbox': [..], ...}, meta)
RGBT adapters return frames as [img_v, img_i] pairs and bbox rows (2, 4).
"""
from __future__ import annotations

from typing import List, Optional

import cv2
import numpy as np


def opencv_loader(path: str) -> np.ndarray:
    """Read image as RGB uint8 (image_loader.py opencv_loader semantics);
    JPEGs go through the native libjpeg runtime when built (the default
    loader in the reference is jpeg4py/libturbojpeg, image_loader.py:15-36),
    with cv2 as the failsafe — mirroring opencv_seg_loader's fallback."""
    if path.lower().endswith((".jpg", ".jpeg")):
        from multi_modal_tracking_tpu import native
        if native.available():
            img = native.decode_jpeg(path)
            if img is not None:
                return img
    im = cv2.imread(path, cv2.IMREAD_COLOR)
    if im is None:
        raise IOError(f"Could not read image {path}")
    return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)


class BaseVideoDataset:
    def __init__(self, name: str, root: str, image_loader=opencv_loader):
        self.name = name
        self.root = root
        self.image_loader = image_loader

    def get_name(self) -> str:
        return self.name

    def is_video_sequence(self) -> bool:
        return True

    def __len__(self) -> int:
        return self.get_num_sequences()

    def get_num_sequences(self) -> int:
        raise NotImplementedError

    def get_sequence_info(self, seq_id: int) -> dict:
        raise NotImplementedError

    def get_frames(self, seq_id: int, frame_ids: List[int], anno: Optional[dict] = None):
        raise NotImplementedError

    @staticmethod
    def _anno_frames(anno: dict, frame_ids: List[int]) -> dict:
        return {k: [np.asarray(v[f]) for f in frame_ids] for k, v in anno.items()}


class BaseImageDataset(BaseVideoDataset):
    def is_video_sequence(self) -> bool:
        return False
