"""Evaluation stack: sequence datasets, runner, metrics, analysis.

Parity target: lib/test/ of the reference (evaluation/, analysis/,
parameter/, utils/) — re-designed so the per-frame hot path is a single
jitted device call (multi_modal_tracking_tpu.tracking.tracker) and the
metric/analysis layer is pure numpy.
"""
from multi_modal_tracking_tpu.eval.data import Sequence, RGBTSequence, SequenceList
from multi_modal_tracking_tpu.eval.datasets import get_dataset
from multi_modal_tracking_tpu.eval.running import run_dataset

__all__ = ["Sequence", "RGBTSequence", "SequenceList", "get_dataset", "run_dataset"]
