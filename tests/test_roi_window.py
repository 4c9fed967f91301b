"""ROI-window upload mode: crop_resize_window must be BIT-identical to the
full-frame crop whenever it declares itself valid, and must flag exactly the
cases where the window misses frame pixels the full crop reads.

The mode exists because the transfer tunnel's upload leg is the eval
bottleneck (artifacts/profile_upload_r3.json: post-fetch H2D collapses to
~43 MB/s; artifacts/profile_overlap_r4.json: upload/compute pipelining is
impossible) — uploading a conservative sub-window per chunk cuts the bytes
while the validity flag + host fallback keeps trajectories exact.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.ops.crop import (crop_resize,
                                               crop_resize_window)

H, W = 120, 160
OUT = 48


def _frame(seed=0):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, 255, (H, W, 3), dtype=np.uint8))


def _window(frame, ox, oy, ww, hw):
    return frame[oy:oy + hw, ox:ox + ww]


@pytest.mark.parametrize("box,off,wsz", [
    ([60.0, 50.0, 20.0, 16.0], (30, 20), (100, 80)),   # interior crop
    ([10.0, 8.0, 18.0, 14.0], (0, 0), (80, 70)),       # frame corner: crop
    ([140.0, 100.0, 24.0, 18.0], (80, 50), (80, 70)),  # pads off-frame, and
                                                       # window touches the
                                                       # right/bottom edges
                                                       # (last-col quirk)
])
def test_window_crop_bit_identical_when_valid(box, off, wsz):
    frame = _frame()
    box = jnp.asarray(box)
    ox, oy = off
    ww, hw = wsz
    want, rf_want = crop_resize(frame, box, 4.0, OUT)
    got, rf_got, ok = crop_resize_window(
        _window(frame, ox, oy, ww, hw), box,
        jnp.asarray([ox, oy], jnp.int32), (H, W), 4.0, OUT)
    assert bool(ok), "expected a valid window for this geometry"
    assert float(rf_want) == float(rf_got)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_window_crop_flags_missing_pixels():
    frame = _frame(1)
    box = jnp.asarray([60.0, 50.0, 30.0, 30.0])   # crop side ceil(30*4)=120
    # 64x64 window centred on the box cannot contain the 120-px crop
    got, _, ok = crop_resize_window(
        _window(frame, 43, 34, 64, 64), box,
        jnp.asarray([43, 34], jnp.int32), (H, W), 4.0, OUT)
    assert not bool(ok)

    # ...but the SAME window is fine for a small template-factor crop
    _, _, ok2 = crop_resize_window(
        _window(frame, 43, 34, 64, 64), box,
        jnp.asarray([43, 34], jnp.int32), (H, W), 2.0, OUT)
    assert bool(ok2)


def test_window_empty_crop_region_valid():
    """A crop entirely off-frame reads nothing -> zeros in both schemes."""
    frame = _frame(2)
    box = jnp.asarray([-300.0, -300.0, 20.0, 20.0])
    want, _ = crop_resize(frame, box, 4.0, OUT)
    got, _, ok = crop_resize_window(
        _window(frame, 0, 0, 64, 64), box,
        jnp.asarray([0, 0], jnp.int32), (H, W), 4.0, OUT)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_window_sweep_valid_vs_exact():
    """Randomised sweep: whenever valid=True the outputs are bit-identical;
    whenever the outputs differ, valid must be False."""
    rng = np.random.default_rng(7)
    frame = _frame(3)
    mismatches = 0
    for _ in range(40):
        box = jnp.asarray([float(rng.uniform(-20, W)), float(rng.uniform(-20, H)),
                           float(rng.uniform(5, 40)), float(rng.uniform(5, 40))])
        ww = int(rng.integers(32, W))
        hw = int(rng.integers(32, H))
        ox = int(rng.integers(0, W - ww + 1))
        oy = int(rng.integers(0, H - hw + 1))
        want, _ = crop_resize(frame, box, 3.5, OUT)
        got, _, ok = crop_resize_window(
            _window(frame, ox, oy, ww, hw), box,
            jnp.asarray([ox, oy], jnp.int32), (H, W), 3.5, OUT)
        same = np.array_equal(np.asarray(want), np.asarray(got))
        if bool(ok):
            assert same, "valid window produced different pixels"
        if not same:
            mismatches += 1
            assert not bool(ok)
    assert mismatches > 0, "sweep never exercised an invalid window"


# ---------------------------------------------------- tracker-level ROI mode

@pytest.fixture(scope="module")
def tiny_cached_tracker():
    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.models.asymmetric_shared import \
        build_mixformer_rgbt
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit
    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.SEARCH.SIZE = 96
    cfg.DATA.TEMPLATE.SIZE = 64
    cfg.MODEL.FUSION_LAYERS = 1
    cfg.MODEL.BACKBONE.CE_LOC = [1]
    model = build_mixformer_rgbt(cfg)
    t = jnp.zeros((2, 64, 64, 3))
    s = jnp.zeros((2, 96, 96, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    return RGBTCachedTrackerJit(
        model=model, variables=variables, template_factor=2.0,
        template_size=64, search_factor=4.5, search_size=96,
        update_interval=3, ce_keep_rate=None, scan_chunk=4)


def _rgbt_frames(n, seed, h=120, w=160):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8),
            rng.integers(0, 255, (n, h, w), dtype=np.uint8))


INIT = {"init_bbox": [70.0, 50.0, 16.0, 14.0]}


def _coverage_window(boxes, factor, frame_hw, pad=4):
    """Smallest window covering every frame's crop read region (+pad)."""
    import math
    H, W = frame_hw
    los, his = [], []
    for b in boxes:
        side = math.ceil(math.sqrt(b[2] * b[3]) * factor)
        x1 = round(b[0] + 0.5 * b[2] - side * 0.5)
        y1 = round(b[1] + 0.5 * b[3] - side * 0.5)
        los.append((max(x1, 0), max(y1, 0)))
        his.append((min(x1 + side, W - 1), min(y1 + side, H - 1)))
    ox = max(min(l[0] for l in los) - pad, 0)
    oy = max(min(l[1] for l in los) - pad, 0)
    hx = min(max(h[0] for h in his) + pad, W)
    hy = min(max(h[1] for h in his) + pad, H)
    return (ox, oy), (hy - oy, hx - ox)


def test_track_chunk_roi_bit_exact(tiny_cached_tracker):
    """ROI chunk == full-frame chunk bit-for-bit when the window covers the
    trajectory's crop reads (incl. a mid-chunk cache rebuild)."""
    tr = tiny_cached_tracker
    fv, fi = _rgbt_frames(7, 11)

    tr.initialize([fv[0], fi[0]], INIT)
    want = np.asarray(tr.track_chunk(fv[1:], fi[1:], fetch=True))

    # window covering every crop the full-frame run performed (prev-state
    # crops: include the init box as frame 1's crop centre)
    states = np.concatenate([[INIT["init_bbox"]], want], axis=0)
    (ox, oy), (hw, ww) = _coverage_window(states, tr.search_factor,
                                          fv.shape[1:3])
    assert (hw, ww) != fv.shape[1:3], "window degenerated to the full frame"

    tr.initialize([fv[0], fi[0]], INIT)
    wv = np.ascontiguousarray(fv[1:, oy:oy + hw, ox:ox + ww])
    wi = np.ascontiguousarray(fi[1:, oy:oy + hw, ox:ox + ww])
    got, oks = tr.track_chunk_roi(wv, wi, (ox, oy), fetch=True)
    assert oks.all(), f"validity flags {oks} for a covering window"
    np.testing.assert_array_equal(want, got)


def test_track_chunk_roi_flags_escape_and_fallback(tiny_cached_tracker):
    """A too-small window must flag invalid frames; snapshot/restore + the
    full-frame redo reproduces the exact full-frame trajectory."""
    tr = tiny_cached_tracker
    fv, fi = _rgbt_frames(7, 12)

    tr.initialize([fv[0], fi[0]], INIT)
    want = np.asarray(tr.track_chunk(fv[1:], fi[1:], fetch=True))

    tr.initialize([fv[0], fi[0]], INIT)
    snap = tr.snapshot()
    ox, oy, ww, hw = 64, 40, 48, 48       # far smaller than the crop reads
    wv = np.ascontiguousarray(fv[1:, oy:oy + hw, ox:ox + ww])
    wi = np.ascontiguousarray(fi[1:, oy:oy + hw, ox:ox + ww])
    _, oks = tr.track_chunk_roi(wv, wi, (ox, oy), fetch=True)
    assert not oks.all()

    tr.restore(snap)
    redo = np.asarray(tr.track_chunk(fv[1:], fi[1:], fetch=True))
    np.testing.assert_array_equal(want, redo)


def test_run_sequence_roi_mode_exact_results(tiny_cached_tracker, tmp_path):
    """run_sequence(roi_margin=...) writes byte-identical result files to the
    plain path, whether chunks stay in-window or hit the fallback."""
    from multi_modal_tracking_tpu.eval.data import RGBTSequence
    from multi_modal_tracking_tpu.eval.running import run_sequence
    tr = tiny_cached_tracker
    fv, fi = _rgbt_frames(10, 13)
    frames = [(fv[k], np.repeat(fi[k][..., None], 3, axis=-1))
              for k in range(10)]
    gt = np.tile(np.asarray(INIT["init_bbox"]), (10, 2, 1))
    seq = RGBTSequence("roiseq", frames, "LasHeR", gt)

    run_sequence(seq, tr, str(tmp_path / "plain"), chunk=4, report_fps=False)
    # generous margin (ROI fast path) and a deliberately tight one (frequent
    # validity fallbacks): both must reproduce the plain file byte-for-byte
    for tag, margin in (("roi", 2.0), ("roi_tight", 1.05)):
        run_sequence(seq, tr, str(tmp_path / tag), chunk=4, report_fps=False,
                     roi_margin=margin, roi_min_size=64, roi_align=16)
        with open(tmp_path / "plain" / "roiseq.txt", "rb") as f1, open(
                tmp_path / tag / "roiseq.txt", "rb") as f2:
            assert f1.read() == f2.read(), tag


# --------------------------------------------------- unimodal ROI chunk mode

@pytest.fixture(scope="module")
def tiny_uni_tracker():
    from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec
    from multi_modal_tracking_tpu.tracking.tracker import RGBCachedTrackerJit
    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64, nlayer_head=2)
    model = MixFormer(spec=spec)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    return RGBCachedTrackerJit(model=model, variables=variables,
                               template_factor=2.0, template_size=32,
                               search_factor=4.5, search_size=64,
                               update_interval=3, mode="TIR", scan_chunk=4)


def test_unimodal_roi_chunk_matches_and_falls_back(tiny_uni_tracker):
    """Unimodal (TIR mode: frame-level JET inside the scan) ROI chunks match
    the full-frame path bit-for-bit with a covering window, and the
    too-small-window fallback reproduces it exactly."""
    import math
    tr = tiny_uni_tracker
    rng = np.random.default_rng(21)
    H, W = 120, 160
    fv = rng.integers(0, 255, (7, H, W, 3), dtype=np.uint8)
    fi = rng.integers(0, 255, (7, H, W, 3), dtype=np.uint8)
    init = {"init_bbox": [70.0, 50.0, 14.0, 12.0]}

    tr.initialize([fv[0], fi[0]], init)
    want = np.asarray(tr.track_chunk(fv[1:], fi[1:], fetch=True))

    states = np.concatenate([[init["init_bbox"]], want], axis=0)
    (ox, oy), (hw, ww) = _coverage_window(states, tr.search_factor, (H, W))
    assert (hw, ww) != (H, W)
    tr.initialize([fv[0], fi[0]], init)
    got, oks = tr.track_chunk_roi(
        np.ascontiguousarray(fv[1:, oy:oy + hw, ox:ox + ww]),
        np.ascontiguousarray(fi[1:, oy:oy + hw, ox:ox + ww]),
        (ox, oy), fetch=True)
    assert oks.all()
    np.testing.assert_array_equal(want, got)

    # deliberately too small -> flagged; restore + full redo is exact
    tr.initialize([fv[0], fi[0]], init)
    snap = tr.snapshot()
    _, oks2 = tr.track_chunk_roi(
        np.ascontiguousarray(fv[1:, 45:45 + 40, 62:62 + 40]),
        np.ascontiguousarray(fi[1:, 45:45 + 40, 62:62 + 40]),
        (62, 45), fetch=True)
    assert not oks2.all()
    tr.restore(snap)
    redo = np.asarray(tr.track_chunk(fv[1:], fi[1:], fetch=True))
    np.testing.assert_array_equal(want, redo)


def test_run_sequence_roi_unimodal_exact(tiny_uni_tracker, tmp_path):
    from multi_modal_tracking_tpu.eval.data import Sequence
    from multi_modal_tracking_tpu.eval.running import run_sequence
    tr = tiny_uni_tracker
    rng = np.random.default_rng(22)
    frames = [rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
              for _ in range(9)]
    gt = np.tile(np.asarray([70.0, 50.0, 14.0, 12.0]), (9, 1))
    seq = Sequence("uniroi", frames, "lasot", gt)
    run_sequence(seq, tr, str(tmp_path / "plain"), chunk=4, report_fps=False)
    run_sequence(seq, tr, str(tmp_path / "roi"), chunk=4, report_fps=False,
                 roi_margin=2.0, roi_min_size=64, roi_align=16)
    with open(tmp_path / "plain" / "uniroi.txt", "rb") as f1, open(
            tmp_path / "roi" / "uniroi.txt", "rb") as f2:
        assert f1.read() == f2.read()


# ------------------------------------------------ online-family ROI chunk mode

@pytest.fixture(scope="module")
def tiny_rgbt_online_tracker():
    from multi_modal_tracking_tpu.models.asymmetric_shared import (
        MixFormerRGBT, RGBTSpec)
    from multi_modal_tracking_tpu.tracking.tracker import RGBTOnlineTrackerJit
    spec = RGBTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                    num_heads=2, head_dim=64, fusion_layers=1,
                    ce_loc=None, ce_keep_ratio=None, nlayer_head=2)
    model = MixFormerRGBT(spec=spec, with_score=True)
    t = jnp.zeros((2, 32, 32, 3), jnp.float32)
    s = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), t, t, s)
    return RGBTOnlineTrackerJit(model=model, variables=variables,
                                template_factor=2.0, template_size=32,
                                search_factor=4.5, search_size=64,
                                update_interval=3, max_score_decay=0.98,
                                scan_chunk=4)


ONLINE_INIT = {"init_bbox": [70.0, 50.0, 14.0, 12.0]}


def test_rgbt_online_track_chunk_roi_bit_exact(tiny_rgbt_online_tracker):
    """The score (SPM) family's ROI chunks reproduce boxes AND scores
    bit-for-bit (advice r4: online families previously fell back to full
    uploads silently)."""
    tr = tiny_rgbt_online_tracker
    fv, fi = _rgbt_frames(7, 31)
    tr.initialize([fv[0], fi[0]], ONLINE_INIT)
    want_b, want_s = tr.track_chunk(fv[1:], fi[1:], fetch=True)

    states = np.concatenate([[ONLINE_INIT["init_bbox"]], want_b], axis=0)
    (ox, oy), (hw, ww) = _coverage_window(states, tr.search_factor,
                                          fv.shape[1:3])
    assert (hw, ww) != fv.shape[1:3]
    tr.initialize([fv[0], fi[0]], ONLINE_INIT)
    (got_b, got_s), oks = tr.track_chunk_roi(
        np.ascontiguousarray(fv[1:, oy:oy + hw, ox:ox + ww]),
        np.ascontiguousarray(fi[1:, oy:oy + hw, ox:ox + ww]),
        (ox, oy), fetch=True)
    assert oks.all()
    np.testing.assert_array_equal(want_b, got_b)
    np.testing.assert_array_equal(want_s, got_s)

    # too-small window -> flagged; restore + full-frame redo is exact
    tr.initialize([fv[0], fi[0]], ONLINE_INIT)
    snap = tr.snapshot()
    _, oks2 = tr.track_chunk_roi(
        np.ascontiguousarray(fv[1:, 45:45 + 40, 62:62 + 40]),
        np.ascontiguousarray(fi[1:, 45:45 + 40, 62:62 + 40]),
        (62, 45), fetch=True)
    assert not oks2.all()
    tr.restore(snap)
    redo_b, redo_s = tr.track_chunk(fv[1:], fi[1:], fetch=True)
    np.testing.assert_array_equal(want_b, redo_b)
    np.testing.assert_array_equal(want_s, redo_s)


def test_unimodal_online_track_chunk_roi_bit_exact():
    """OnlineTrackerJit (ring buffer + external k/v cache carry) ROI chunks
    match full-frame boxes and scores; the (state, cache) snapshot/restore
    protocol survives the fallback."""
    from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec
    from multi_modal_tracking_tpu.tracking.tracker import OnlineTrackerJit
    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64, nlayer_head=2)
    model = MixFormer(spec=spec, with_score=True)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), t, t, s)
    tr = OnlineTrackerJit(model=model, variables=variables,
                          template_factor=2.0, template_size=32,
                          search_factor=4.5, search_size=64,
                          update_interval=2, online_size=2, mode="RGB",
                          scan_chunk=4)
    rng = np.random.default_rng(33)
    H, W = 120, 160
    fv = rng.integers(0, 255, (7, H, W, 3), dtype=np.uint8)
    tr.initialize(fv[0], ONLINE_INIT)
    want_b, want_s = tr.track_chunk(fv[1:], fv[1:], fetch=True)

    states = np.concatenate([[ONLINE_INIT["init_bbox"]], want_b], axis=0)
    (ox, oy), (hw, ww) = _coverage_window(states, tr.search_factor, (H, W))
    assert (hw, ww) != (H, W)
    tr.initialize(fv[0], ONLINE_INIT)
    wv = np.ascontiguousarray(fv[1:, oy:oy + hw, ox:ox + ww])
    (got_b, got_s), oks = tr.track_chunk_roi(wv, wv, (ox, oy), fetch=True)
    assert oks.all()
    np.testing.assert_array_equal(want_b, got_b)
    np.testing.assert_array_equal(want_s, got_s)

    # fallback path through the tuple carry
    tr.initialize(fv[0], ONLINE_INIT)
    snap = tr.snapshot()
    wv2 = np.ascontiguousarray(fv[1:, 45:45 + 40, 62:62 + 40])
    _, oks2 = tr.track_chunk_roi(wv2, wv2, (62, 45), fetch=True)
    assert not oks2.all()
    tr.restore(snap)
    redo_b, redo_s = tr.track_chunk(fv[1:], fv[1:], fetch=True)
    np.testing.assert_array_equal(want_b, redo_b)
    np.testing.assert_array_equal(want_s, redo_s)


def test_run_sequence_roi_online_writes_scores(tiny_rgbt_online_tracker,
                                               tmp_path):
    """run_sequence ROI mode on a score family writes byte-identical bbox AND
    score files to the plain chunked path (scores previously unhandled in
    ROI mode)."""
    from multi_modal_tracking_tpu.eval.data import RGBTSequence
    from multi_modal_tracking_tpu.eval.running import run_sequence
    tr = tiny_rgbt_online_tracker
    fv, fi = _rgbt_frames(9, 34)
    frames = [(fv[k], np.repeat(fi[k][..., None], 3, axis=-1))
              for k in range(9)]
    gt = np.tile(np.asarray(ONLINE_INIT["init_bbox"]), (9, 2, 1))
    seq = RGBTSequence("roionline", frames, "LasHeR", gt)
    s1 = run_sequence(seq, tr, str(tmp_path / "plain"), chunk=4,
                      report_fps=False)
    s2 = run_sequence(seq, tr, str(tmp_path / "roi"), chunk=4,
                      report_fps=False, roi_margin=2.0, roi_min_size=64,
                      roi_align=16)
    assert "n_fallback" in s2 and "n_chunks" in s2   # advice r4: tunability
    assert "n_fallback" not in s1
    for fname in ("roionline.txt", "roionline_score.txt"):
        with open(tmp_path / "plain" / fname, "rb") as f1, open(
                tmp_path / "roi" / fname, "rb") as f2:
            assert f1.read() == f2.read(), fname
