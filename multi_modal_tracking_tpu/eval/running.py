"""Sequence runner: drive a tracker over evaluation sequences, save results.

Parity target: lib/test/evaluation/running.py — run_dataset (:200-238),
run_sequence skip-if-done (:157-171), _save_tracker_output (:16-128: bbox /
time / score txt via np.savetxt), per-sequence FPS print (:191-194);
lib/test/evaluation/tracker_rgbt.py _track_sequence (:124-184: background
frame prefetch, init on frame 0, per-frame timing).

TPU-first redesign: the reference parallelises with a process pool pinned to
N GPUs; here a single chip tracks sequences with a *chunked lax.scan* device
loop (tracking/tracker.py track_chunk) while a background thread prefetches
and decodes the next frame chunk — IO and compute overlap, and device
dispatch overhead is amortised over the chunk. A thread pool maps sequences
over multiple local devices when present.
"""
from __future__ import annotations

import math
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import List, Optional

import numpy as np

from multi_modal_tracking_tpu.eval.data import RGBTSequence, Sequence


def _imread(path):
    """RGB uint8 frame loader: native libjpeg runtime when built (the C
    threaded decoder in native/, replacing the reference's
    jpeg4py/DataLoader workers — image_loader.py:15-100), else cv2/PIL."""
    if path.lower().endswith((".jpg", ".jpeg")):
        from multi_modal_tracking_tpu import native
        img = native.decode_jpeg(path) if native.available() else None
        if img is not None:
            return img
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"could not read {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))


def _read_depth_as_rgb(path):
    """uint16 depth png -> median*3-clipped, min-max-normalised REPLICATED
    GRAYSCALE (depth_utils.py get_rgbd_frame dtype='rgb3d' + depth_clip=True
    — the exact mode the reference's DepthTrack eval and VOT-RGBD loop use,
    tracker_rgbt.py:218 / vot_rgbd_test/tracker_class.py:169). The JET
    pseudo-colouring then happens downstream in the tracker's TIR pipeline,
    exactly like replicated-grayscale TIR frames (the reference comments
    this in get_rgbd_frame: the colormap is applied 'in the transformer').
    Same semantics as train.data.datasets.rgbt.normalized_depth_pair."""
    import cv2
    dp = cv2.imread(path, -1)
    max_depth = min(np.median(dp) * 3, 10000)
    dp = np.minimum(dp, max_depth)
    dp = cv2.normalize(dp, None, alpha=0, beta=255, norm_type=cv2.NORM_MINMAX)
    dp = np.asarray(dp, dtype=np.uint8)
    return cv2.merge((dp, dp, dp))


def _load_frame(seq, k):
    fr = seq.frames[k]
    if isinstance(seq, RGBTSequence):
        fv, fi = fr
        if isinstance(fv, np.ndarray):
            return [fv, fi]
        img_v = _imread(fv)
        img_i = _read_depth_as_rgb(fi) if seq.depth_input else _imread(fi)
        return [img_v, img_i]
    if isinstance(fr, np.ndarray):
        return fr
    if isinstance(fr, (tuple, list)):
        # lmdb-packed frame: (db_path, key) pair (lasot_lmdbdataset.py:56)
        from multi_modal_tracking_tpu.utils.lmdb_utils import decode_img
        return decode_img(*fr)
    return _imread(fr)


class _Prefetcher:
    """Background frame loader: keeps `depth` chunks of decoded frames ahead
    of the device (replaces the reference's 2-worker DataLoader prefetch,
    tracker_rgbt.py:144-159)."""

    def __init__(self, seq, start: int, chunk: int, depth: int = 2):
        self.seq, self.chunk = seq, chunk
        self.q: Queue = Queue(maxsize=depth)
        self.n = len(seq.frames)
        self.start = start
        self.t = threading.Thread(target=self._work, daemon=True)
        self.t.start()

    def _work(self):
        try:
            for lo in range(self.start, self.n, self.chunk):
                hi = min(lo + self.chunk, self.n)
                frames = [_load_frame(self.seq, k) for k in range(lo, hi)]
                if isinstance(self.seq, RGBTSequence):
                    fv = np.stack([f[0] for f in frames])
                    fi = np.stack([f[1] for f in frames])
                    self.q.put((lo, hi, fv, fi))
                else:
                    self.q.put((lo, hi, np.stack(frames), None))
        except BaseException as e:      # surface decode/IO errors to the
            self.q.put(e)               # consumer instead of hanging it on
            return                      # a sentinel that never arrives
        self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


def _write_vis_video(path: str, frames) -> str:
    """mp4 writer + optional ffmpeg h264 re-encode (the reference writes a
    temp mp4v file then re-encodes, running.py:26-80)."""
    import shutil
    import subprocess
    import cv2
    tmp = os.path.join(os.path.dirname(path), "temp_" + os.path.basename(path))
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
    if shutil.which("ffmpeg"):
        subprocess.run(["ffmpeg", "-nostdin", "-y", "-loglevel", "quiet",
                        "-i", tmp, "-vcodec", "h264", path], check=True)
        os.remove(tmp)
    else:
        os.replace(tmp, path)
    return path


def _vis_frame(frame, pred_box, prev_box, search_factor: float):
    """Raw frame + predicted box (green) + search region (yellow)."""
    import cv2
    img = np.ascontiguousarray(frame if frame.ndim == 3 else frame[0])
    x, y, w, h = [float(v) for v in pred_box]
    cv2.rectangle(img, (int(x), int(y)), (int(x + w), int(y + h)), (0, 255, 0), 2)
    px, py, pw, ph = [float(v) for v in prev_box]
    crop_sz = math.ceil(math.sqrt(max(pw * ph, 1.0)) * search_factor)
    cx, cy = px + pw / 2, py + ph / 2
    cv2.rectangle(img, (int(cx - crop_sz / 2), int(cy - crop_sz / 2)),
                  (int(cx + crop_sz / 2), int(cy + crop_sz / 2)), (0, 255, 255), 1)
    return img


def run_sequence(seq: Sequence, tracker, results_dir: str,
                 skip_if_done: bool = True, chunk: int = 16,
                 report_fps: bool = True, save_vis: bool = False,
                 roi_margin: float = 0.0, roi_min_size: int = 192,
                 roi_align: int = 64) -> Optional[dict]:
    """Track one sequence; write <results_dir>/<seq>.txt (+ _time.txt).

    save_vis renders a per-frame search-region visualisation video to
    <results_dir>/vis_video/<seq>.mp4 (reference params.vis_search,
    running.py:26-80); it forces the per-frame (non-chunked) path.

    roi_margin > 0 enables ROI-window uploads (tracker.track_chunk_roi):
    per chunk the host fetches the current box, uploads only a conservative
    margin*search-sized window, and re-runs the chunk on full frames if the
    device's validity flags report the window missed needed pixels —
    trajectories are exactly the full-frame ones either way. This trades one
    tiny D2H per chunk for a multi-x cut of the H2D bytes (the transport
    bottleneck: artifacts/profile_upload_r3.json, profile_overlap_r4.json);
    the win grows with frame size (VTUAV 1080p ~10x)."""
    os.makedirs(results_dir, exist_ok=True)
    bbox_file = os.path.join(results_dir, f"{seq.name}.txt")
    if skip_if_done and os.path.isfile(bbox_file):
        return None

    n = len(seq.frames)
    boxes = np.zeros((n, 4), dtype=np.float64)
    times = np.zeros((n,), dtype=np.float64)

    frame0 = _load_frame(seq, 0)
    t0 = time.time()
    tracker.initialize(frame0, seq.init_info())
    # frame-0 output box = the init box the tracker's mode selected (the
    # reference stores init_info["init_bbox"] after mode selection,
    # tracker.py:119-122 + _track_sequence init_default)
    from multi_modal_tracking_tpu.tracking.tracker import _select_init_box
    boxes[0] = np.asarray(_select_init_box(seq.init_info()["init_bbox"],
                                           getattr(tracker, "mode", "RGB")))
    times[0] = time.time() - t0

    scores = None
    vis_frames = [] if save_vis else None
    use_roi = (roi_margin > 0 and not save_vis
               and hasattr(tracker, "track_chunk_roi")
               and not getattr(seq, "depth_input", False))
    use_chunks = hasattr(tracker, "track_chunk") and not save_vis
    roi_stats = None
    if use_roi and n > 1:
        from multi_modal_tracking_tpu.tracking.tracker import (place_window,
                                                               roi_window)
        t_seq = time.time()
        collected = []
        n_fallback = n_windowed = n_chunks = 0
        prev_sz = None    # window-size hysteresis: every distinct window
        #                   shape is its own jit program, so keep reusing the
        #                   last (re-centred) size while it still covers the
        #                   newly needed one — shapes then change only when
        #                   the target genuinely grows, not on size jitter
        for lo, hi, fv, fi in _Prefetcher(seq, 1, chunk):
            n_chunks += 1
            if fi is None:          # unimodal sequence: single frame stream
                fi = fv             # (same object: uploads dedupe downstream)
            box = tracker.current_box()
            win = roi_window(box, fv.shape[1:3],
                             getattr(tracker, "search_factor", 4.5),
                             margin=roi_margin, align=roi_align,
                             min_size=roi_min_size)
            if win is None:                      # window ~ frame: no saving
                collected.append(tracker.track_chunk(fv, fi, fetch=True))
                continue
            if (prev_sz is not None and win[1][0] <= prev_sz[0]
                    and win[1][1] <= prev_sz[1]):
                win = place_window(box, fv.shape[1:3], prev_sz)
            prev_sz = win[1]
            (ox, oy), (hw, ww) = win
            wv = np.ascontiguousarray(fv[:, oy:oy + hw, ox:ox + ww])
            wi = wv if fi is fv else \
                np.ascontiguousarray(fi[:, oy:oy + hw, ox:ox + ww])
            snap = tracker.snapshot()
            out, oks = tracker.track_chunk_roi(wv, wi, (ox, oy), fetch=True)
            if bool(np.all(oks)):
                n_windowed += 1
                collected.append(out)
            else:                                # window escaped: exact redo
                n_fallback += 1
                tracker.restore(snap)
                collected.append(tracker.track_chunk(fv, fi, fetch=True))
        # online families emit (boxes, scores) pytrees; plain ones bare boxes
        with_scores = isinstance(collected[0], tuple)
        if with_scores:
            all_boxes = np.concatenate([np.asarray(c[0]) for c in collected])
            scores = np.concatenate(
                [np.ones((1,))] + [np.asarray(c[1]) for c in collected])[:n]
        else:
            all_boxes = np.concatenate([np.asarray(c) for c in collected])
        t_end = time.time()
        boxes[1:] = all_boxes[: n - 1]
        times[1:] = (t_end - t_seq) / max(n - 1, 1)
        roi_stats = {"n_chunks": n_chunks, "n_windowed": n_windowed,
                     "n_fallback": n_fallback}
    elif use_chunks and n > 1:
        # Dispatch every chunk asynchronously (device arrays only) and fetch
        # all boxes in ONE D2H at sequence end — per-frame trajectories are
        # identical, and the single deferred fetch avoids this environment's
        # irreversible post-fetch upload slowdown (tracker.py track_chunk).
        pending = []
        t_seq = time.time()
        for lo, hi, fv, fi in _Prefetcher(seq, 1, chunk):
            pending.append(tracker.track_chunk(fv, fi if fi is not None else fv,
                                               fetch=False))
        with_scores = isinstance(pending[0], tuple)
        if with_scores:
            all_boxes = np.concatenate([np.asarray(p[0]) for p in pending], axis=0)
            scores = np.concatenate(
                [np.ones((1,))] + [np.asarray(p[1]) for p in pending])[:n]
        else:
            all_boxes = np.concatenate([np.asarray(p) for p in pending], axis=0)
        t_end = time.time()
        boxes[1:] = all_boxes[: n - 1]
        times[1:] = (t_end - t_seq) / max(n - 1, 1)   # amortised per-frame time
    else:
        for k in range(1, n):
            frame = _load_frame(seq, k)
            t0 = time.time()
            out = tracker.track(frame)
            boxes[k] = np.asarray(out["target_bbox"])
            times[k] = time.time() - t0
            if "pred_score" in out:
                if scores is None:
                    scores = np.ones((n,), dtype=np.float64)
                scores[k] = out["pred_score"]
            if vis_frames is not None:
                fv = frame[0] if isinstance(frame, (list, tuple)) else frame
                vis_frames.append(_vis_frame(
                    fv.copy(), boxes[k], boxes[k - 1],
                    getattr(tracker, "search_factor", 4.5)))

    if vis_frames:
        vis_dir = os.path.join(results_dir, "vis_video")
        os.makedirs(vis_dir, exist_ok=True)
        _write_vis_video(os.path.join(vis_dir, f"{seq.name}.mp4"), vis_frames)

    np.savetxt(bbox_file, boxes, delimiter="\t", fmt="%d")
    if scores is not None:
        # per-frame confidence (running.py:42 _save_tracker_output, fmt %.2f)
        np.savetxt(os.path.join(results_dir, f"{seq.name}_score.txt"),
                   scores, delimiter="\t", fmt="%.2f")
    np.savetxt(os.path.join(results_dir, f"{seq.name}_time.txt"), times, fmt="%f")
    fps = n / max(times.sum(), 1e-9)
    stats = {"seq": seq.name, "n_frames": n, "fps": fps}
    if roi_stats is not None:
        # expose the fallback rate so roi_margin is tunable from eval output
        # (each fallback costs a full-frame upload + the wasted window chunk)
        stats.update(roi_stats)
    if report_fps:
        roi_msg = ""
        if roi_stats is not None:
            roi_msg = (f" | roi: {roi_stats['n_windowed']}/"
                       f"{roi_stats['n_chunks']} chunks windowed, "
                       f"{roi_stats['n_fallback']} fallbacks")
        print(f"{seq.name}: {n} frames, {fps:.1f} FPS{roi_msg}")
    return stats


def run_dataset(dataset, tracker, results_dir: str, skip_if_done: bool = True,
                chunk: int = 16, threads: int = 0,
                tracker_factory=None, devices=None,
                save_vis: bool = False,
                roi_margin: float = 0.0) -> List[dict]:
    """Run a tracker over every sequence (lib/test/evaluation/running.py:200).

    threads>0 with tracker_factory maps sequences over a thread pool, one
    tracker per worker — the TPU analogue of the reference's per-GPU process
    pool (running.py:134-141 pins device_id = proc_idx % num_gpus). With
    `devices` (e.g. jax.devices()), workers are pinned round-robin: each
    worker's uploads commit to its device and its jit executions follow the
    argument placement, so sequences evaluate on all chips concurrently.
    Without `devices`, workers share device 0 (host IO still overlaps)."""
    stats = []
    if threads and tracker_factory is not None:
        import itertools

        from multi_modal_tracking_tpu.tracking.tracker import set_put_device

        local = threading.local()
        worker_ids = itertools.count()

        def work(seq):
            if not hasattr(local, "tracker"):
                if devices:
                    set_put_device(devices[next(worker_ids) % len(devices)])
                local.tracker = tracker_factory()
            return run_sequence(seq, local.tracker, results_dir,
                                skip_if_done=skip_if_done, chunk=chunk,
                                save_vis=save_vis, roi_margin=roi_margin)
        with ThreadPoolExecutor(max_workers=threads) as ex:
            stats = [s for s in ex.map(work, dataset) if s is not None]
    else:
        for seq in dataset:
            s = run_sequence(seq, tracker, results_dir,
                             skip_if_done=skip_if_done, chunk=chunk,
                             save_vis=save_vis, roi_margin=roi_margin)
            if s is not None:
                stats.append(s)
    if stats:
        total = sum(s["n_frames"] for s in stats)
        tfps = total / max(sum(s["n_frames"] / s["fps"] for s in stats), 1e-9)
        print(f"ran {len(stats)} sequences, {total} frames, mean {tfps:.1f} FPS")
    return stats
