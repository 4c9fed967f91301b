"""ROI-window upload measurements (VERDICT r3 next-round #2).

Companion to artifacts/profile_overlap.py (which recorded the NEGATIVE
result: upload/compute pipelining is impossible — pre-first-fetch
executions stall, and the first D2H fetch costs 26-84 s once per process).
Given that, the only upload lever is BYTES; this measures the ROI-window
mode (tracking/tracker.py track_chunk_roi) in the transport's two regimes:

  pristine — the bench construction: all uploads before the first fetch
    (1.4 GB/s), one untimed flip, then timed scans. ROI uses ONE static
    window from the init box for the whole clip (no per-chunk fetch is
    possible pristine); device validity flags checked at the end.
  steady — the production eval regime: after the first fetch uploads run at
    ~43 MB/s, so per-chunk box fetches are affordable and the window follows
    the target. Measured at bench geometry (512x640) and at VTUAV-like
    1080p, where the byte cut is largest.

Fidelity is asserted, not assumed: ROI trajectories must equal full-frame
trajectories bit-for-bit (or the validity flags must say why not).

Run (one mode per process):
  env PYTHONPATH=/root/repo:/root/.axon_site python artifacts/profile_roi.py pristine
  env PYTHONPATH=/root/repo:/root/.axon_site python artifacts/profile_roi.py steady
"""
import json
import sys
import time

import numpy as np

N_FRAMES = 384          # pristine leg (bench methodology)
N_STEADY = 96           # steady-state legs
CHUNK_STEADY = 16


def _build_tracker(scan_chunk):
    import jax
    import jax.numpy as jnp
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit
    from multi_modal_tracking_tpu.utils.checkpoint import cast_floating

    cfg = get_parameters("asymmetric_shared_ce",
                         "attention_lasher_newfusion_2layer").cfg
    model = build_mixformer_rgbt(cfg, dtype=jnp.bfloat16)
    t = jnp.zeros((2, 128, 128, 3), jnp.float32)
    s = jnp.zeros((2, 288, 288, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    variables = cast_floating(variables, jnp.bfloat16)
    return RGBTCachedTrackerJit(
        model=model, variables=variables,
        template_factor=cfg.TEST.TEMPLATE_FACTOR,
        template_size=cfg.TEST.TEMPLATE_SIZE,
        search_factor=cfg.TEST.SEARCH_FACTOR,
        search_size=cfg.TEST.SEARCH_SIZE,
        update_interval=25, ce_keep_rate=None, scan_chunk=scan_chunk)


def _clip(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8),
            rng.integers(0, 255, (n, h, w), dtype=np.uint8))


def pristine():
    import jax
    from multi_modal_tracking_tpu.tracking.tracker import _put, roi_window
    tracker = _build_tracker(N_FRAMES)
    H, W = 512, 640
    fv, fi = _clip(N_FRAMES, H, W)
    init_box = [280.0, 220.0, 80.0, 60.0]
    tracker.initialize([fv[0], fi[0]], {"init_bbox": init_box})

    win = roi_window(init_box, (H, W), tracker.search_factor, margin=1.2)
    (ox, oy), (hw, ww) = win
    wv = np.ascontiguousarray(fv[:, oy:oy + hw, ox:ox + ww])
    wi = np.ascontiguousarray(fi[:, oy:oy + hw, ox:ox + ww])

    def timed_put(*arrs):
        t0 = time.perf_counter()
        out = [_put(a) for a in arrs]
        jax.block_until_ready(out)
        return out, time.perf_counter() - t0

    # all uploads first (pristine), min-of-2 per payload
    (dv, di), up_full_a = timed_put(fv, fi)
    (_, _), up_full_b = timed_put(fv.copy(), fi.copy())
    (dwv, dwi), up_roi_a = timed_put(wv, wi)
    (_, _), up_roi_b = timed_put(wv.copy(), wi.copy())
    t_up_full, t_up_roi = min(up_full_a, up_full_b), min(up_roi_a, up_roi_b)

    # warm both programs, flip the proxy ONCE (untimed, 26-84 s)
    warm = tracker.track_chunk(dv, di, fetch=False)
    t0 = time.perf_counter()
    np.asarray(warm[-1])
    t_flip = time.perf_counter() - t0
    tracker.initialize([fv[0], fi[0]], {"init_bbox": init_box})
    np.asarray(tracker.track_chunk_roi(dwv, dwi, (ox, oy), fetch=False)[0][-1])

    # timed scans (post-flip = full speed)
    tracker.initialize([fv[0], fi[0]], {"init_bbox": init_box})
    t0 = time.perf_counter()
    pend = tracker.track_chunk(dv, di, fetch=False)
    np.asarray(pend[-1])
    t_scan_full = time.perf_counter() - t0
    boxes_full = np.asarray(pend)

    tracker.initialize([fv[0], fi[0]], {"init_bbox": init_box})
    t0 = time.perf_counter()
    pend_b, pend_ok = tracker.track_chunk_roi(dwv, dwi, (ox, oy), fetch=False)
    np.asarray(pend_b[-1])
    t_scan_roi = time.perf_counter() - t0
    boxes_roi, oks = np.asarray(pend_b), np.asarray(pend_ok)

    fidelity_exact = bool(np.array_equal(boxes_full, boxes_roi))
    bytes_full = fv.nbytes + fi.nbytes
    bytes_roi = wv.nbytes + wi.nbytes
    out = {
        "mode": "pristine",
        "window": [hw, ww], "offset": [ox, oy],
        "bytes_full_mb": round(bytes_full / 1e6, 1),
        "bytes_roi_mb": round(bytes_roi / 1e6, 1),
        "byte_cut_x": round(bytes_full / bytes_roi, 2),
        "upload_full_s": round(t_up_full, 3),
        "upload_roi_s": round(t_up_roi, 3),
        "scan_full_s": round(t_scan_full, 3),
        "scan_roi_s": round(t_scan_roi, 3),
        "flip_s": round(t_flip, 1),
        "fps_full": round(N_FRAMES / (t_up_full + t_scan_full), 1),
        "fps_roi": round(N_FRAMES / (t_up_roi + t_scan_roi), 1),
        "all_frames_window_valid": bool(oks.all()),
        "fidelity_bit_exact": fidelity_exact,
    }
    print(json.dumps(out))


def steady():
    """Production-path measurement: eval/running.py run_sequence over
    in-memory sequences, plain vs roi_margin, in the post-flip regime
    (uploads ~43 MB/s). Warm passes compile every program shape untimed."""
    import tempfile

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    from multi_modal_tracking_tpu.eval.data import RGBTSequence
    from multi_modal_tracking_tpu.eval.running import run_sequence
    from multi_modal_tracking_tpu.tracking.tracker import _put

    tracker = _build_tracker(CHUNK_STEADY)
    np.asarray(_put(np.zeros(16, np.float32)))     # flip immediately

    results = {"mode": "steady"}
    tmp = tempfile.mkdtemp(prefix="roi_steady_")
    for tag, (H, W), box in (("512x640", (512, 640), [280.0, 220.0, 80.0, 60.0]),
                             ("1080p", (1088, 1920), [900.0, 500.0, 120.0, 90.0])):
        fv, fi = _clip(N_STEADY, H, W, seed=3)
        frames = [(fv[k], fi[k]) for k in range(N_STEADY)]
        gt = np.tile(np.asarray(box, np.float64), (N_STEADY, 2, 1))
        seq = RGBTSequence(f"clip_{tag}", frames, "LasHeR", gt)

        legs = {}
        for leg, kwargs in (("full", {}), ("roi", {"roi_margin": 1.5})):
            # warm pass: compiles + window shapes, untimed
            run_sequence(seq, tracker, f"{tmp}/{tag}_{leg}_warm", chunk=CHUNK_STEADY,
                         report_fps=False, **kwargs)
            t0 = time.perf_counter()
            run_sequence(seq, tracker, f"{tmp}/{tag}_{leg}", chunk=CHUNK_STEADY,
                         report_fps=False, **kwargs)
            legs[leg] = time.perf_counter() - t0

        with open(f"{tmp}/{tag}_full/clip_{tag}.txt", "rb") as f1, open(
                f"{tmp}/{tag}_roi/clip_{tag}.txt", "rb") as f2:
            identical = f1.read() == f2.read()

        n = N_STEADY - 1
        results[tag] = {
            "bytes_full_mb": round((fv.nbytes + fi.nbytes) / 1e6, 1),
            "fps_full": round(n / legs["full"], 1),
            "fps_roi": round(n / legs["roi"], 1),
            "speedup_x": round(legs["full"] / legs["roi"], 2),
            "n_roi_programs": len(tracker._scan_roi_jit),
            "result_files_identical": bool(identical),
        }
        print(f"{tag}: full {legs['full']:.2f}s, roi {legs['roi']:.2f}s",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "steady"
    {"pristine": pristine, "steady": steady}[mode]()
