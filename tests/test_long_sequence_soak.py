"""Long-sequence soak (VERDICT r4 #7): a LaSOT-length (~2500-frame)
synthetic sequence through run_sequence(roi_margin=1.5).

Asserts the three things that can only break at length:
  * the ROI trajectory equals the plain chunked path (which equals per-frame
    stepping — tests/test_tracker.py) over the whole sequence;
  * the jit program count stays BOUNDED by the window-size hysteresis (every
    distinct window shape is its own compiled program — unbounded growth
    would OOM a real eval);
  * host memory stays flat across the run (no per-chunk leak).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


N_FRAMES = 2500
H, W = 240, 320


@pytest.fixture(scope="module")
def tracker():
    from multi_modal_tracking_tpu.models.asymmetric_shared import (
        MixFormerRGBT, RGBTSpec)
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit
    spec = RGBTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                    num_heads=2, head_dim=64, fusion_layers=1,
                    ce_loc=None, ce_keep_ratio=None, nlayer_head=2)
    model = MixFormerRGBT(spec=spec)
    t = jnp.zeros((2, 32, 32, 3), jnp.float32)
    s = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    return RGBTCachedTrackerJit(
        model=model, variables=variables, template_factor=2.0,
        template_size=32, search_factor=4.5, search_size=64,
        update_interval=25, scan_chunk=32)


def _rss_mb():
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def test_lasot_length_roi_soak(tracker, tmp_path):
    from multi_modal_tracking_tpu.eval.data import RGBTSequence
    from multi_modal_tracking_tpu.eval.running import run_sequence
    from multi_modal_tracking_tpu.train.data.datasets.synthetic import _render

    frames_v, boxes = _render(4, N_FRAMES, H, W)
    frames = [(f, np.stack([255 - f[..., 0]] * 3, axis=-1)) for f in frames_v]
    gt = np.stack([boxes, boxes], axis=1).astype(np.float64)
    seq = RGBTSequence("soak", frames, "LasHeR", gt)

    run_sequence(seq, tracker, str(tmp_path / "plain"), chunk=32,
                 report_fps=False)
    rss_mid = _rss_mb()
    stats = run_sequence(seq, tracker, str(tmp_path / "roi"), chunk=32,
                         report_fps=False, roi_margin=1.5, roi_min_size=64,
                         roi_align=32)
    rss_end = _rss_mb()

    # exact trajectory equality over all 2500 frames
    with open(tmp_path / "plain" / "soak.txt", "rb") as f1, open(
            tmp_path / "roi" / "soak.txt", "rb") as f2:
        assert f1.read() == f2.read()

    # hysteresis bounds the compiled-program zoo: the target keeps one size,
    # so a handful of window shapes (growth steps) at most
    assert stats["n_chunks"] == (N_FRAMES - 1 + 31) // 32
    n_programs = len(tracker._scan_roi_jit)
    assert n_programs <= 6, f"{n_programs} ROI programs for one sequence"

    # flat memory: the second (ROI) pass must not grow the host RSS by more
    # than transient slack — a per-chunk leak over 78 chunks would dwarf this
    assert rss_end - rss_mid < 500, (rss_mid, rss_end)

    # sanity: ROI mode actually windowed (the tiny target in a 240x320 frame
    # gives real byte savings, no degenerate full-frame windows)
    assert stats["n_windowed"] > 0
