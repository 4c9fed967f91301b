"""Sequence containers for evaluation.

Parity target: lib/test/evaluation/data.py — Sequence (:22-159),
RGBT_Sequence (:162-257), SequenceList (:260-280). RGBT sequences hold
frames as (visible_path, infrared_path) pairs and ground truth as
(rect_v, rect_i) pairs, exactly the shapes the RGBT metric
(analysis/extract_results.py:106) consumes.
"""
from __future__ import annotations

import numpy as np
from typing import List, Optional, Sequence as Seq


class BaseDataset:
    """Base class for evaluation datasets (lib/test/evaluation/data.py:7)."""

    def __init__(self):
        from multi_modal_tracking_tpu.train.admin import env_settings
        self.env_settings = env_settings()

    def __len__(self):
        return len(self.get_sequence_list())

    def get_sequence_list(self):
        raise NotImplementedError


class Sequence:
    """A single unimodal test sequence (lib/test/evaluation/data.py:22)."""

    def __init__(self, name: str, frames: List[str], dataset: str,
                 ground_truth_rect, object_class: Optional[str] = None,
                 target_visible=None):
        self.name = name
        self.frames = frames
        self.dataset = dataset
        self.ground_truth_rect = np.asarray(ground_truth_rect, dtype=np.float64)
        self.object_class = object_class
        self.target_visible = (np.asarray(target_visible)
                               if target_visible is not None else None)
        self.multimodal = False

    def init_info(self) -> dict:
        return {"init_bbox": list(map(float, self.ground_truth_rect[0]))}

    def __repr__(self):
        return f"{self.__class__.__name__}({self.name}, {len(self.frames)} frames)"


class RGBTSequence(Sequence):
    """A paired RGB-T (or RGB-D rendered) sequence.

    frames: list of (path_v, path_i); ground_truth_rect: (N, 2, 4)
    [RGB gt; TIR gt] — metric takes max-IoU / min-center-err over the pair
    (lib/test/evaluation/data.py:162, analysis/extract_results.py:169-173).
    """

    def __init__(self, name: str, frames: List[tuple], dataset: str,
                 ground_truth_rect, object_class: Optional[str] = None,
                 target_visible=None, depth_input: bool = False):
        gt = np.asarray(ground_truth_rect, dtype=np.float64)
        assert gt.ndim == 3 and gt.shape[1] == 2 and gt.shape[2] == 4, gt.shape
        self.name = name
        self.frames = frames
        self.dataset = dataset
        self.ground_truth_rect = gt
        self.object_class = object_class
        self.target_visible = (np.asarray(target_visible)
                               if target_visible is not None else None)
        self.multimodal = True
        self.depth_input = depth_input   # frames_i are raw depth maps

    def init_info(self) -> dict:
        # The [RGB gt; TIR gt] PAIR, like the reference's data.py init_info:
        # trackers select by mode — RGBT/RGB/Prompt take row 0, TIR mode
        # takes row 1 (lib/test/evaluation/tracker.py:119-122,
        # lib/test/tracker/asymmetric_shared_ce.py:54-67).
        return {"init_bbox": [list(map(float, r))
                              for r in self.ground_truth_rect[0]]}


class SequenceList(list):
    """List of sequences with name lookup (lib/test/evaluation/data.py:260)."""

    def __getitem__(self, item):
        if isinstance(item, str):
            for seq in self:
                if seq.name == item:
                    return seq
            raise IndexError(f"Sequence name not in the dataset: {item}")
        if isinstance(item, (int, np.integer)):
            return super().__getitem__(item)
        return SequenceList(super().__getitem__(item))

    def __add__(self, other):
        return SequenceList(super().__add__(other))


def load_text(path: str, delimiter=(",", "\t", " ", None), dtype=np.float64) -> np.ndarray:
    """Robust gt/result text loader (lib/test/utils/load_text.py semantics):
    try each delimiter until parsing succeeds."""
    if isinstance(delimiter, (str, type(None))):
        delimiter = (delimiter,)
    last_err = None
    for d in delimiter:
        try:
            arr = np.loadtxt(path, delimiter=d, dtype=dtype, ndmin=2)
            if arr.size:
                return arr
        except Exception as e:           # noqa: BLE001 — try next delimiter
            last_err = e
    raise ValueError(f"could not parse {path}: {last_err}")
