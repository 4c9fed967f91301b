"""Jitted tracking loops (the inference hot path).

Parity targets:
  lib/test/tracker/asymmetric_shared_ce.py (:49-148) — per-frame flow:
  square-crop search around previous state -> JET(TIR) -> normalise ->
  network(template, online_template, search) -> mean pred box -> scale by
  search_size / resize_factor -> map_box_back -> clip(margin=10); template
  crops from the RGB init box; online template refreshed every
  update_interval frames from the current state.
  lib/test/tracker/tracker_utils.py Preprocessor_Multimodal (:36-48).
  lib/test/tracker/mixformer_vit_online.py — score-gated online template
  update (pred_score > 0.5 and > max_score, decayed).

TPU-first design: the ENTIRE per-frame computation — both modal crops
(fused matmul resampler), JET LUT, normalisation, backbone+fusion+head, box
decode, clipping and the conditional template refresh — is one jitted
function over a TrackState pytree. Per frame the host does exactly one H2D
copy of the two raw uint8 frames and one D2H copy of 4 floats. Template
update uses lax.cond on the frame counter, so there is a single compiled
graph per frame resolution.
"""
from __future__ import annotations

import dataclasses
import threading
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from multi_modal_tracking_tpu.ops.boxes import clip_box
from multi_modal_tracking_tpu.ops.colormap import apply_jet
from multi_modal_tracking_tpu.ops.crop import (crop_resize,
                                               crop_resize_window,
                                               normalize_imagenet)


@struct.dataclass
class TrackState:
    """Explicit functional tracker state threaded through jitted steps."""
    template_v: jax.Array       # (1, Ht, Wt, 3) normalised
    template_i: jax.Array
    online_template_v: jax.Array
    online_template_i: jax.Array
    state: jax.Array            # (4,) xywh in image coords, f32
    frame_id: jax.Array         # () int32


@struct.dataclass
class CachedTrackState:
    """State for the cached-template fast path: the per-block template k/v
    cache replaces the online-template images; the raw first-frame template
    crops are kept only to rebuild the cache at update time."""
    template_v: jax.Array       # (1, Ht, Wt, 3) normalised first-frame crop
    template_i: jax.Array
    cache: Any                  # pytree from MixFormerRGBT.set_online
    state: jax.Array            # (4,) xywh image coords
    frame_id: jax.Array         # () int32


@struct.dataclass
class OnlineTrackState:
    """State for score-gated online tracking (SPM models).

    Adds the reference's max-score template candidacy machinery
    (lib/test/tracker/mixformer_cvt_online.py:75-168) as explicit arrays:
    the best-scoring template crop since the last refresh and its score.
    For multi-template models the candidate is committed into a FIXED-size
    ring buffer; `n_filled` counts the slots the reference's dynamically
    GROWING buffer would hold (:158-162: append until online_size, then
    replace at forget_id), and unfilled slots are masked out of every
    attention via set_online's slot_mask — growth-exact with static shapes.
    """
    template_v: jax.Array        # (1, Ht, Wt, 3) normalised
    template_i: jax.Array
    online_template_v: jax.Array  # (n_online, Ht, Wt, 3) ring buffer
    online_template_i: jax.Array
    max_template_v: jax.Array    # (1, Ht, Wt, 3) best candidate since refresh
    max_template_i: jax.Array
    max_pred_score: jax.Array    # () f32
    forget_id: jax.Array         # () int32 ring-buffer cursor
    state: jax.Array             # (4,) xywh image coords
    frame_id: jax.Array          # () int32
    n_filled: jax.Array          # () int32 live ring slots (reference growth)


def _select_init_box(box, mode: str = "RGB"):
    """RGBT GT pairs -> the tracked mode's box: the bimodal trackers and
    RGB/Prompt unimodal modes take the RGB row, TIR mode the TIR row
    (lib/test/evaluation/tracker.py:119-122; the bimodal trackers init from
    the RGB gt, asymmetric_shared_ce.py:54-67). Flat boxes pass through."""
    if isinstance(box, (list, tuple)) and isinstance(box[0], (list, tuple, np.ndarray)):
        return box[1] if mode == "TIR" else box[0]
    return box


def _prep_rgb(img, box, factor, out_sz):
    crop, rf = crop_resize(img, box, factor, out_sz)
    return normalize_imagenet(crop)[None], rf


def _prep_rgb_w(img, box, factor, out_sz, offset=None, frame_hw=None):
    """_prep_rgb with the optional ROI-window mode (see _prep_rgbt)."""
    if offset is None:
        crop, rf = crop_resize(img, box, factor, out_sz)
        return normalize_imagenet(crop)[None], rf, jnp.bool_(True)
    crop, rf, ok = crop_resize_window(img, box, offset, frame_hw,
                                      factor, out_sz)
    return normalize_imagenet(crop)[None], rf, ok


def _prep_tir(img, box, factor, out_sz):
    """Crop raw TIR frame, then JET colormap on the (rounded uint8) crop —
    same op order as the reference (crop -> applyColorMap -> normalise).

    Accepts (H, W, 3) replicated-grayscale frames (the reference's storage
    format) or true single-channel (H, W) frames; cv2's BGR2GRAY inside
    applyColorMap makes the two identical, and 1-channel upload cuts the
    per-frame H2D bytes by a third."""
    crop, rf = crop_resize(img, box, factor, out_sz)
    crop = jnp.clip(jnp.round(crop), 0, 255)
    return normalize_imagenet(apply_jet(crop))[None], rf


def _prep_rgbt(img_v, img_i, box, factor, out_sz, offset=None, frame_hw=None):
    """Joint bimodal crop: both modalities share the SAME box, so the two
    resampling-matrix pairs are identical — stack the channels, build the
    matrices once, crop in one (wider) matmul pair, then run each modality's
    own post-crop path. Bit-identical to _prep_rgb + _prep_tir (the crop
    einsum is channel-independent).

    With `offset` (int32 (2,) [ox, oy]) the images are ROI sub-windows of a
    `frame_hw` frame (the upload-byte-saving eval mode): the crop runs in
    window coordinates and `ok` reports whether it is bit-identical to the
    full-frame crop (ops/crop.py crop_resize_window). Returns
    (v, i, resize_factor, ok); ok is constant True in full-frame mode."""
    ir = img_i[..., None] if img_i.ndim == 2 else img_i
    stacked = jnp.concatenate([img_v.astype(jnp.float32),
                               ir.astype(jnp.float32)], axis=-1)
    if offset is None:
        crop, rf = crop_resize(stacked, box, factor, out_sz)
        ok = jnp.bool_(True)
    else:
        crop, rf, ok = crop_resize_window(stacked, box, offset, frame_hw,
                                          factor, out_sz)
    cv = crop[..., :3]
    ci = crop[..., 3:]
    if ci.shape[-1] == 1:
        ci = ci[..., 0]
    ci = jnp.clip(jnp.round(ci), 0, 255)
    return (normalize_imagenet(cv)[None],
            normalize_imagenet(apply_jet(ci))[None], rf, ok)


def place_window(box, frame_hw, size_hw):
    """Centre a (Hw, Ww) window on `box` and clip it inside the frame."""
    H, W = int(frame_hw[0]), int(frame_hw[1])
    Hw, Ww = int(size_hw[0]), int(size_hw[1])
    x, y, w, h = [float(v) for v in box]
    cx, cy = x + 0.5 * w, y + 0.5 * h
    ox = int(np.clip(round(cx - Ww / 2), 0, W - Ww))
    oy = int(np.clip(round(cy - Hw / 2), 0, H - Hw))
    return (ox, oy), (Hw, Ww)


def roi_window(box, frame_hw, search_factor: float, margin: float = 1.5,
               align: int = 64, min_size: int = 192):
    """Host-side conservative ROI placement for track_chunk_roi.

    Side = search_factor * sqrt(w*h) * margin, rounded UP to a multiple of
    `align` (buckets the jit-compiled window shapes), centred on the box and
    clipped inside the frame. The margin covers the box drifting/growing
    over the chunk; if the tracker escapes anyway, the per-frame validity
    flag catches it and the caller re-runs the chunk on full frames — ROI
    mode is a pure upload-byte optimisation, never an accuracy trade.

    Returns ((ox, oy), (Hw, Ww)), or None when the window would cover the
    whole frame anyway (no byte saving)."""
    import math
    H, W = int(frame_hw[0]), int(frame_hw[1])
    x, y, w, h = [float(v) for v in box]
    side = search_factor * math.sqrt(max(w * h, 1.0)) * margin
    side = max(min_size, int(math.ceil(side / align) * align))
    Hw, Ww = min(side, H), min(side, W)
    if Hw >= H and Ww >= W:
        return None
    return place_window(box, frame_hw, (Hw, Ww))


_put_device = threading.local()


def set_put_device(device) -> None:
    """Pin this thread's committed uploads (and hence its jit executions,
    which follow argument placement) to `device` — the unit of the eval
    runner's device round-robin (eval/running.py run_dataset)."""
    _put_device.dev = device


def _put(x, dtype=None):
    """Committed device_put to this thread's device (default: first device).
    jnp.asarray would create an UNCOMMITTED array, which this environment's
    IFRT proxy keeps host-held and lazily materialises with a slow per-exec
    round-trip; a committed put streams the bytes once at full bandwidth.
    Already-device arrays pass through untouched (np.asarray on one would be
    a full D2H fetch)."""
    if isinstance(x, jax.Array):
        if dtype is None or x.dtype == dtype:
            return x
        # dtype mismatch: cast ON DEVICE — np.asarray here would be the
        # exact D2H fetch this helper exists to prevent (first fetch
        # permanently degrades uploads ~20x on this transport)
        return x.astype(dtype)
    arr = np.asarray(x, dtype) if dtype is not None else np.asarray(x)
    dev = getattr(_put_device, "dev", None)
    return jax.device_put(arr, dev if dev is not None else jax.devices()[0])


def _run_chunked(run_block, carry, frames_v, frames_i, K: int):
    """Host-side block driver for the scan'd track paths: split N frames into
    K-sized blocks (tail padded + masked invalid), one committed upload + one
    scan dispatch per block. run_block(carry, blk_v, blk_i, ok) ->
    (carry, per-frame outputs pytree); returns (carry, [outputs per block]).

    When frames_i IS frames_v (unimodal sequences routed through a bimodal
    signature) the block is uploaded ONCE and the same device buffer is
    passed for both arguments — halving H2D bytes on the upload-bound
    transport."""
    N = frames_v.shape[0]
    same = frames_i is frames_v
    outs = []
    for lo in range(0, N, K):
        hi = min(lo + K, N)
        whole = lo == 0 and hi == N     # skip the identity slice: on a
        blk_v = frames_v if whole else frames_v[lo:hi]   # device array it
        blk_i = blk_v if same else (frames_i if whole else frames_i[lo:hi])
        n = hi - lo                                      # is an eager RPC
        ok = np.ones((K,), np.bool_)
        if n < K:
            pad = K - n
            xp = jnp if isinstance(frames_v, jax.Array) else np
            blk_v = xp.concatenate([blk_v, xp.repeat(blk_v[-1:], pad, axis=0)])
            blk_i = blk_v if same else xp.concatenate(
                [blk_i, xp.repeat(blk_i[-1:], pad, axis=0)])
            ok[n:] = False
        d_v = _put(blk_v)
        d_i = d_v if same else _put(blk_i)
        carry, out = run_block(carry, d_v, d_i, _put(ok))
        if n < K:
            out = jax.tree_util.tree_map(lambda a: a[:n], out)
        outs.append(out)
    return carry, outs


def _map_box_back(pred_cxcywh, prev_state, search_size, resize_factor):
    """Crop-relative (cx,cy,w,h) in pixels -> image-coord xywh."""
    cx_prev = prev_state[0] + 0.5 * prev_state[2]
    cy_prev = prev_state[1] + 0.5 * prev_state[3]
    half_side = 0.5 * search_size / resize_factor
    cx = pred_cxcywh[0] + (cx_prev - half_side)
    cy = pred_cxcywh[1] + (cy_prev - half_side)
    w, h = pred_cxcywh[2], pred_cxcywh[3]
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h, w, h])


class RoiChunkMixin:
    """ROI-window upload mode shared by the chunked tracker families.

    Requires the host class to provide `_step_w(shape, variables, carry,
    img_v, img_i, offset)` -> (new_carry, out, ok) plus the standard chunk
    attributes (`scan_chunk`, `_shape`, `variables`, `_scan_roi_jit`). `out`
    is the per-frame output pytree — a (4,) box for the plain families, a
    (box, score) pair for the score (online) families. The carry defaults to
    `self._state`; families that thread extra device state (the unimodal
    online cache) override `_carry`/`_set_carry`. See eval/running.py
    run_sequence(roi_margin=...) for the host-side protocol (window
    placement, validity fallback)."""

    def _make_track_scan_roi(self, shape, chunk: int):
        """ROI-window variant of _make_track_scan: the frames are sub-windows
        at a chunk-constant integer offset; emits a per-frame `ok` flag that
        is True iff the frame's crops were bit-identical to full-frame crops
        (the host discards the chunk and falls back to full frames on any
        False — eval/running.py run_sequence roi_margin mode)."""

        def track_fn(variables, carry, frames_v, frames_i, valid, offset):
            def body(carry, fr):
                img_v, img_i, pad_ok = fr
                new_carry, out, ok = self._step_w(shape, variables, carry,
                                                  img_v, img_i, offset)
                new_carry = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(pad_ok, a, b), new_carry, carry)
                # padded tail frames never count as window violations
                return new_carry, (out, ok | ~pad_ok)

            carry, (outs, oks) = jax.lax.scan(body, carry,
                                              (frames_v, frames_i, valid))
            return carry, outs, oks
        return jax.jit(track_fn)

    # ------------------------------------------------- ROI-window upload mode
    def _carry(self):
        return self._state

    def _set_carry(self, carry) -> None:
        self._state = carry

    def current_box(self) -> np.ndarray:
        """Fetch the current frame-coord box estimate (4 floats D2H)."""
        return np.asarray(self._state.state)

    def snapshot(self):
        """Immutable state handle for the ROI fallback path."""
        return self._carry()

    def restore(self, carry) -> None:
        self._set_carry(carry)

    def track_chunk_roi(self, win_v: np.ndarray, win_i: np.ndarray,
                        offset_xy, fetch: bool = True):
        """track_chunk over ROI sub-windows (upload-byte reduction).

        win_v: (N, Hw, Ww, 3), win_i: (N, Hw, Ww[, 3]) uint8 windows cut from
        the full frames at frame coords offset_xy = (ox, oy) (one shared
        window per chunk). Returns (out, oks) where out matches track_chunk's
        output pytree (boxes, or (boxes, scores) for the online families);
        oks[k] False means frame k's crop needed pixels outside the window —
        the caller must `restore` the pre-chunk `snapshot` and re-run the
        chunk with full frames (trajectories are then exactly the full-frame
        ones; when all oks are True the outputs already are, bit-for-bit)."""
        K = self.scan_chunk
        win_shape = win_v.shape[1:3]
        key = (self._shape, win_shape, K)
        if key not in self._scan_roi_jit:
            self._scan_roi_jit[key] = self._make_track_scan_roi(self._shape, K)
        fn = self._scan_roi_jit[key]
        offset = _put(np.asarray(offset_xy, np.int32))

        def run_block(carry, blk_v, blk_i, ok):
            carry, outs, oks = fn(self.variables, carry, blk_v, blk_i, ok,
                                  offset)
            return carry, (outs, oks)

        carry, outs = _run_chunked(run_block, self._carry(), win_v, win_i, K)
        self._set_carry(carry)
        out = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *[o[0] for o in outs])
        oks = jnp.concatenate([o[1] for o in outs], axis=0)
        if fetch:
            return jax.tree_util.tree_map(np.asarray, out), np.asarray(oks)
        return out, oks


@dataclasses.dataclass
class RGBTTrackerJit(RoiChunkMixin):
    """Device tracking loop for the bimodal (asymmetric-shared) models.

    model: a MixFormerRGBT flax module; variables: its params (+batch_stats).
    """
    model: Any
    variables: Any
    template_factor: float = 2.0
    template_size: int = 128
    search_factor: float = 5.0
    search_size: int = 288
    update_interval: int = 200
    ce_keep_rate: Optional[float] = None     # None -> config CE_KEEP_RATIO
    scan_chunk: int = 32                     # frames per scan dispatch

    def __post_init__(self):
        self._init_jit = {}
        self._track_jit = {}
        self._scan_jit = {}
        self._scan_roi_jit = {}

    # ------------------------------------------------------------- device fns
    def _init_state(self, variables, img_v, img_i, box):
        """Traceable first-frame state builder (jitted by _make_init, vmapped
        by the batched lockstep tracker)."""
        tv, ti, _, _ = _prep_rgbt(img_v, img_i, box, self.template_factor,
                                self.template_size)
        return TrackState(template_v=tv, template_i=ti,
                          online_template_v=tv, online_template_i=ti,
                          state=box.astype(jnp.float32),
                          frame_id=jnp.int32(0))

    def _make_init(self, shape):
        return jax.jit(self._init_state)

    def _step_w(self, shape, variables, st: TrackState, img_v, img_i,
                offset=None):
        """One track step (the reference's per-frame track(), :74-114).

        With `offset`, img_v/img_i are ROI sub-windows of a `shape` frame
        (track_chunk_roi); the returned `ok` is True iff every crop this step
        took was bit-identical to the full-frame crop. Box math stays in
        FRAME coordinates throughout — only the pixel reads move."""
        H, W = shape
        frame_id = st.frame_id + 1
        sv, si, rf, ok_s = _prep_rgbt(img_v, img_i, st.state, self.search_factor,
                                      self.search_size, offset, shape)

        t_vi = jnp.concatenate([st.template_v, st.template_i], axis=0)
        ot_vi = jnp.concatenate([st.online_template_v, st.online_template_i], axis=0)
        s_vi = jnp.concatenate([sv, si], axis=0)
        # test-time CE pools over ALL template rows: the reference tracker
        # calls the network with ce_template_mask=None
        # (asymmetric_shared_ce.py tracker :90-98, candidate_elimination :81-93)
        out = self.model.apply(variables, t_vi, ot_vi, s_vi, self.ce_keep_rate,
                               use_ce_template_mask=False)
        pred = out["pred_boxes"].reshape(-1, 4).mean(axis=0)      # cxcywh in [0,1]
        pred = pred * (self.search_size / rf)
        new_state = clip_box(_map_box_back(pred, st.state, self.search_size, rf),
                             H, W, margin=10)

        def updated():
            otv, oti, _, ok_t = _prep_rgbt(img_v, img_i, new_state,
                                           self.template_factor,
                                           self.template_size, offset, shape)
            return otv, oti, ok_t

        do_update = (frame_id % self.update_interval) == 0
        otv, oti, ok_t = jax.lax.cond(
            do_update, updated,
            lambda: (st.online_template_v, st.online_template_i,
                     jnp.bool_(True)))
        new_st = TrackState(template_v=st.template_v, template_i=st.template_i,
                            online_template_v=otv, online_template_i=oti,
                            state=new_state, frame_id=frame_id)
        return new_st, new_state, ok_s & ok_t

    def _step(self, shape, variables, st: TrackState, img_v, img_i):
        new_st, new_state, _ = self._step_w(shape, variables, st, img_v, img_i)
        return new_st, new_state

    def _make_track(self, shape):
        def track_fn(variables, st, img_v, img_i):
            return self._step(shape, variables, st, img_v, img_i)
        return jax.jit(track_fn)   # no donation: ~130ms/exec via IFRT proxy

    def _make_track_scan(self, shape, chunk: int):
        """lax.scan of the track step over a chunk of frames: ONE dispatch
        per chunk instead of one per frame. This amortises host->device
        dispatch latency to ~zero and is the offline-eval fast path; the
        produced boxes are identical to per-frame stepping. A per-frame
        `valid` mask makes tail padding a state no-op, so a partial final
        chunk leaves the tracker state exactly as per-frame stepping would."""

        def track_fn(variables, st: TrackState, frames_v, frames_i, valid):
            def body(st, fr):
                img_v, img_i, ok = fr
                new_st, new_state = self._step(shape, variables, st, img_v, img_i)
                # padded tail frames must not move the state
                new_st = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), new_st, st)
                return new_st, new_state

            st, boxes = jax.lax.scan(body, st, (frames_v, frames_i, valid))
            return st, boxes
        return jax.jit(track_fn)   # no donation: ~130ms/exec via IFRT proxy

    # --------------------------------------------------------------- host API
    def initialize(self, image, info: dict):
        """image: [img_v, img_i] uint8 HWC numpy arrays; info['init_bbox']."""
        img_v, img_i = image
        shape = img_v.shape[:2]
        if shape not in self._init_jit:
            self._init_jit[shape] = self._make_init(shape)
            self._track_jit[shape] = self._make_track(shape)
        box = _select_init_box(info["init_bbox"])   # RGBT pair -> RGB row
        self._state = self._init_jit[shape](
            self.variables, _put(img_v), _put(img_i), _put(box, np.float32))
        self._shape = shape

    def track(self, image, info: Optional[dict] = None):
        img_v, img_i = image
        self._state, box = self._track_jit[self._shape](
            self.variables, self._state, _put(img_v), _put(img_i))
        return {"target_bbox": [float(b) for b in np.asarray(box)]}

    def track_chunk(self, frames_v: np.ndarray, frames_i: np.ndarray,
                    fetch: bool = True):
        """Track a (N, H, W, 3) uint8 frame chunk with ONE host round-trip.

        The N frames run through a lax.scan'd track step in blocks of
        `scan_chunk`: one H2D upload + one dispatch per block, boxes fetched
        in a single D2H at the end. The box dependency chains entirely on
        device, so trajectories are identical to per-frame track(); only the
        host round-trips are amortised (measured on v5e-1 via the RPC proxy:
        per-frame dispatch 18-270 ms/frame vs scan 8.4 ms/frame).
        """
        K = self.scan_chunk
        key = (self._shape, K)
        if key not in self._scan_jit:
            self._scan_jit[key] = self._make_track_scan(self._shape, K)
        fn = self._scan_jit[key]

        def run_block(st, blk_v, blk_i, ok):
            return fn(self.variables, st, blk_v, blk_i, ok)

        self._state, boxes = _run_chunked(run_block, self._state,
                                          frames_v, frames_i, K)
        stacked = jnp.concatenate(boxes, axis=0)
        # fetch=False defers the D2H: this environment's transfer proxy
        # permanently degrades upload bandwidth ~50x after the FIRST host
        # fetch, so offline eval dispatches every chunk async and fetches all
        # boxes once at sequence end (identical trajectories either way).
        return np.asarray(stacked) if fetch else stacked



@dataclasses.dataclass
class RGBTCachedTrackerJit(RGBTTrackerJit):
    """RGBTTrackerJit with the cached-template fast path.

    Per frame only the SEARCH tokens run through the backbone
    (MixFormerRGBT.forward_track); the per-block template q/k/v come from a
    cache built at init and rebuilt inside the jitted step at every template
    update (lax.cond). Outputs are bit-identical to RGBTTrackerJit — the
    asymmetric attention guarantees template activations are search-
    independent — at ~40% fewer backbone FLOPs per frame. The RGBT analogue
    of the reference's set_online/forward_test
    (lib/models/mixformer_vit/mixformer.py:79-109), which the reference never
    applied to its RGBT models."""

    def _init_state(self, variables, img_v, img_i, box):
        tv, ti, _, _ = _prep_rgbt(img_v, img_i, box, self.template_factor,
                                self.template_size)
        t_vi = jnp.concatenate([tv, ti], axis=0)
        cache = self.model.apply(variables, t_vi, t_vi,
                                 method=type(self.model).set_online)
        return CachedTrackState(template_v=tv, template_i=ti, cache=cache,
                                state=box.astype(jnp.float32),
                                frame_id=jnp.int32(0))

    def _step_search_w(self, shape, variables, st: CachedTrackState, img_v,
                       img_i, offset=None):
        """Search-only track step against the frozen template cache (no
        template update — the interval-gated cache rebuild is composed on
        top by _step, and hoisted OUT of the vmap by the batched lockstep
        tracker so set_online does not run every frame as a vmapped select)."""
        H, W = shape
        frame_id = st.frame_id + 1
        sv, si, rf, ok = _prep_rgbt(img_v, img_i, st.state, self.search_factor,
                                    self.search_size, offset, shape)
        s_vi = jnp.concatenate([sv, si], axis=0)
        out = self.model.apply(variables, st.cache, s_vi,
                               method=type(self.model).forward_track,
                               ce_keep_rate=self.ce_keep_rate,
                               use_ce_template_mask=False)
        pred = out["pred_boxes"].reshape(-1, 4).mean(axis=0)
        pred = pred * (self.search_size / rf)
        new_state = clip_box(_map_box_back(pred, st.state, self.search_size, rf),
                             H, W, margin=10)
        new_st = CachedTrackState(template_v=st.template_v,
                                  template_i=st.template_i, cache=st.cache,
                                  state=new_state, frame_id=frame_id)
        return new_st, new_state, ok

    def _step_search(self, shape, variables, st: CachedTrackState, img_v, img_i):
        new_st, new_state, _ = self._step_search_w(shape, variables, st,
                                                   img_v, img_i)
        return new_st, new_state

    def _rebuild_cache_w(self, variables, st: CachedTrackState, img_v, img_i,
                         offset=None, shape=None):
        """set_online against the current frame cropped at st.state — the
        template-update body of the reference's online loop."""
        otv, oti, _, ok = _prep_rgbt(img_v, img_i, st.state,
                                     self.template_factor, self.template_size,
                                     offset, shape)
        t_vi = jnp.concatenate([st.template_v, st.template_i], axis=0)
        ot_vi = jnp.concatenate([otv, oti], axis=0)
        return self.model.apply(variables, t_vi, ot_vi,
                                method=type(self.model).set_online), ok

    def _rebuild_cache(self, variables, st: CachedTrackState, img_v, img_i):
        return self._rebuild_cache_w(variables, st, img_v, img_i)[0]

    def _step_w(self, shape, variables, st: CachedTrackState, img_v, img_i,
                offset=None):
        new_st, new_state, ok_s = self._step_search_w(shape, variables, st,
                                                      img_v, img_i, offset)
        do_update = (new_st.frame_id % self.update_interval) == 0
        cache, ok_t = jax.lax.cond(
            do_update,
            lambda: self._rebuild_cache_w(variables, new_st, img_v, img_i,
                                          offset, shape),
            lambda: (new_st.cache, jnp.bool_(True)))
        return new_st.replace(cache=cache), new_state, ok_s & ok_t

    def _step(self, shape, variables, st: CachedTrackState, img_v, img_i):
        new_st, new_state, _ = self._step_w(shape, variables, st, img_v, img_i)
        return new_st, new_state


@dataclasses.dataclass
class RGBTOnlineTrackerJit(RoiChunkMixin):
    """Score-gated online tracking for the bimodal SPM models
    (asymmetric_shared_online).

    Parity: lib/test/tracker/asymmetric_shared_online.py /
    mixformer_cvt_online.py:142-168 — every frame runs the score head;
    the best-scoring state since the last refresh becomes the template
    candidate; every update_interval frames the candidate is committed as
    the online template, gated on pred_score > 0.5; max_pred_score decays
    by max_score_decay per frame.

    TPU-first: candidate selection, decay and the interval-gated commit are
    all lax.cond/jnp.where inside ONE jitted step — the host never sees the
    score.
    """
    model: Any
    variables: Any
    template_factor: float = 2.0
    template_size: int = 128
    search_factor: float = 5.0
    search_size: int = 288
    update_interval: int = 25
    max_score_decay: float = 1.0
    ce_keep_rate: Optional[float] = None

    scan_chunk: int = 32

    def __post_init__(self):
        self._init_jit = {}
        self._track_jit = {}
        self._scan_jit = {}
        self._scan_roi_jit = {}

    def _init_state(self, variables, img_v, img_i, box):
        tv, ti, _, _ = _prep_rgbt(img_v, img_i, box, self.template_factor,
                                self.template_size)
        return OnlineTrackState(
            template_v=tv, template_i=ti,
            online_template_v=tv, online_template_i=ti,
            max_template_v=tv, max_template_i=ti,
            max_pred_score=jnp.float32(-1.0),
            forget_id=jnp.int32(0),
            state=box.astype(jnp.float32), frame_id=jnp.int32(0),
            n_filled=jnp.int32(1))

    def _make_init(self, shape):
        return jax.jit(self._init_state)

    def _step_w(self, shape, variables, st: OnlineTrackState, img_v, img_i,
                offset=None):
        """One score-gated step; with `offset` the images are ROI sub-windows
        (RoiChunkMixin). `ok` is conservative-exact: the search crop must be
        window-exact, and the candidate crop too whenever it is actually
        SELECTED (an unselected candidate's pixels are discarded, so its
        validity cannot affect the trajectory)."""
        H, W = shape
        frame_id = st.frame_id + 1
        sv, si, rf, ok_s = _prep_rgbt(img_v, img_i, st.state,
                                      self.search_factor, self.search_size,
                                      offset, shape)

        t_vi = jnp.concatenate([st.template_v, st.template_i], axis=0)
        ot_vi = jnp.concatenate([st.online_template_v, st.online_template_i], axis=0)
        s_vi = jnp.concatenate([sv, si], axis=0)
        out = self.model.apply(variables, t_vi, ot_vi, s_vi, self.ce_keep_rate,
                               use_ce_template_mask=False, run_score_head=True)
        pred = out["pred_boxes"].reshape(-1, 4).mean(axis=0)
        pred_score = jax.nn.sigmoid(
            out["pred_scores"].reshape(-1)[0].astype(jnp.float32))
        pred = pred * (self.search_size / rf)
        new_state = clip_box(_map_box_back(pred, st.state, self.search_size, rf),
                             H, W, margin=10)

        # --- max-score candidate (decayed) -----------------------------------
        max_score = st.max_pred_score * self.max_score_decay
        is_better = (pred_score > 0.5) & (pred_score > max_score)
        cand_v, cand_i, _, ok_c = _prep_rgbt(img_v, img_i, new_state,
                                             self.template_factor,
                                             self.template_size, offset, shape)
        max_tv = jnp.where(is_better, cand_v, st.max_template_v)
        max_ti = jnp.where(is_better, cand_i, st.max_template_i)
        max_score = jnp.where(is_better, pred_score, max_score)

        # --- interval-gated commit of the candidate --------------------------
        do_update = (frame_id % self.update_interval) == 0
        otv = jnp.where(do_update, max_tv, st.online_template_v)
        oti = jnp.where(do_update, max_ti, st.online_template_i)
        # after a commit, reset candidacy to the base template
        max_tv = jnp.where(do_update, st.template_v, max_tv)
        max_ti = jnp.where(do_update, st.template_i, max_ti)
        max_score = jnp.where(do_update, jnp.float32(-1.0), max_score)

        new_st = OnlineTrackState(
            template_v=st.template_v, template_i=st.template_i,
            online_template_v=otv, online_template_i=oti,
            max_template_v=max_tv, max_template_i=max_ti,
            max_pred_score=max_score, forget_id=st.forget_id,
            state=new_state, frame_id=frame_id, n_filled=st.n_filled)
        return new_st, (new_state, pred_score), ok_s & (~is_better | ok_c)

    def _step(self, shape, variables, st: OnlineTrackState, img_v, img_i):
        new_st, (new_state, pred_score), _ = self._step_w(
            shape, variables, st, img_v, img_i)
        return new_st, new_state, pred_score

    def _make_track(self, shape):
        def track_fn(variables, st, img_v, img_i):
            return self._step(shape, variables, st, img_v, img_i)
        return jax.jit(track_fn)   # no donation: ~130ms/exec via IFRT proxy

    def _make_track_scan(self, shape, chunk: int):
        def track_fn(variables, st, frames_v, frames_i, valid):
            def body(st, fr):
                img_v, img_i, ok = fr
                new_st, new_state, score = self._step(shape, variables, st,
                                                      img_v, img_i)
                new_st = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), new_st, st)
                return new_st, (new_state, score)

            st, outs = jax.lax.scan(body, st, (frames_v, frames_i, valid))
            return st, outs
        return jax.jit(track_fn)


    def track_chunk(self, frames_v, frames_i, fetch: bool = True):
        """Scan'd chunk path (see RGBTTrackerJit.track_chunk). Returns
        (boxes (N,4), scores (N,)) — the eval runner saves both
        (running.py _save_tracker_output score txt)."""
        K = self.scan_chunk
        key = (self._shape, K)
        if key not in self._scan_jit:
            self._scan_jit[key] = self._make_track_scan(self._shape, K)
        fn = self._scan_jit[key]

        def run_block(st, blk_v, blk_i, ok):
            return fn(self.variables, st, blk_v, blk_i, ok)

        self._state, outs = _run_chunked(run_block, self._state,
                                         frames_v, frames_i, K)
        boxes = jnp.concatenate([o[0] for o in outs], axis=0)
        scores = jnp.concatenate([o[1] for o in outs], axis=0)
        if fetch:
            return np.asarray(boxes), np.asarray(scores)
        return boxes, scores

    def initialize(self, image, info: dict):
        img_v, img_i = image
        shape = img_v.shape[:2]
        if shape not in self._init_jit:
            self._init_jit[shape] = self._make_init(shape)
            self._track_jit[shape] = self._make_track(shape)
        box = _select_init_box(info["init_bbox"])   # RGBT pair -> RGB row
        self._state = self._init_jit[shape](
            self.variables, _put(img_v), _put(img_i), _put(box, np.float32))
        self._shape = shape

    def track(self, image, info: Optional[dict] = None):
        img_v, img_i = image
        self._state, box, score = self._track_jit[self._shape](
            self.variables, self._state, _put(img_v), _put(img_i))
        return {"target_bbox": [float(b) for b in np.asarray(box)],
                "pred_score": float(score)}


@struct.dataclass
class OnlineCachedTrackState:
    """OnlineTrackState + the template k/v cache (cached-template SPM path).
    online_template crops are retained to rebuild the cache at commits."""
    template_v: jax.Array
    template_i: jax.Array
    online_template_v: jax.Array
    online_template_i: jax.Array
    cache: Any
    max_template_v: jax.Array
    max_template_i: jax.Array
    max_pred_score: jax.Array
    state: jax.Array
    frame_id: jax.Array


@dataclasses.dataclass
class RGBTOnlineCachedTrackerJit(RGBTOnlineTrackerJit):
    """RGBTOnlineTrackerJit with the cached-template fast path: the score
    head reads cached final template features, the backbone runs search
    tokens only, and the cache is rebuilt inside the jitted step exactly at
    the interval-gated commits (bit-identical score/box outputs)."""

    def _init_state(self, variables, img_v, img_i, box):
        tv, ti, _, _ = _prep_rgbt(img_v, img_i, box, self.template_factor,
                                self.template_size)
        t_vi = jnp.concatenate([tv, ti], axis=0)
        cache = self.model.apply(variables, t_vi, t_vi,
                                 method=type(self.model).set_online)
        return OnlineCachedTrackState(
            template_v=tv, template_i=ti,
            online_template_v=tv, online_template_i=ti, cache=cache,
            max_template_v=tv, max_template_i=ti,
            max_pred_score=jnp.float32(-1.0),
            state=box.astype(jnp.float32), frame_id=jnp.int32(0))

    def _step_search_w(self, shape, variables, st: OnlineCachedTrackState,
                       img_v, img_i, offset=None):
        """Everything except the set_online cache rebuild: search-only
        forward + score head, candidate selection, the interval-gated
        template COMMIT (elementwise where — vmap-safe), and the candidacy
        reset. The rebuild cond is composed on top by _step and hoisted out
        of the vmap by the batched lockstep tracker. `offset` = ROI-window
        mode (RoiChunkMixin); validity as in RGBTOnlineTrackerJit._step_w."""
        H, W = shape
        frame_id = st.frame_id + 1
        sv, si, rf, ok_s = _prep_rgbt(img_v, img_i, st.state,
                                      self.search_factor, self.search_size,
                                      offset, shape)
        s_vi = jnp.concatenate([sv, si], axis=0)
        out = self.model.apply(variables, st.cache, s_vi,
                               method=type(self.model).forward_track,
                               ce_keep_rate=self.ce_keep_rate,
                               use_ce_template_mask=False,
                               run_score_head=True)
        pred = out["pred_boxes"].reshape(-1, 4).mean(axis=0)
        pred_score = jax.nn.sigmoid(
            out["pred_scores"].reshape(-1)[0].astype(jnp.float32))
        pred = pred * (self.search_size / rf)
        new_state = clip_box(_map_box_back(pred, st.state, self.search_size, rf),
                             H, W, margin=10)

        max_score = st.max_pred_score * self.max_score_decay
        is_better = (pred_score > 0.5) & (pred_score > max_score)
        cand_v, cand_i, _, ok_c = _prep_rgbt(img_v, img_i, new_state,
                                             self.template_factor,
                                             self.template_size, offset, shape)
        max_tv = jnp.where(is_better, cand_v, st.max_template_v)
        max_ti = jnp.where(is_better, cand_i, st.max_template_i)
        max_score = jnp.where(is_better, pred_score, max_score)

        do_update = (frame_id % self.update_interval) == 0
        otv = jnp.where(do_update, max_tv, st.online_template_v)
        oti = jnp.where(do_update, max_ti, st.online_template_i)
        max_tv = jnp.where(do_update, st.template_v, max_tv)
        max_ti = jnp.where(do_update, st.template_i, max_ti)
        max_score = jnp.where(do_update, jnp.float32(-1.0), max_score)

        new_st = OnlineCachedTrackState(
            template_v=st.template_v, template_i=st.template_i,
            online_template_v=otv, online_template_i=oti, cache=st.cache,
            max_template_v=max_tv, max_template_i=max_ti,
            max_pred_score=max_score, state=new_state, frame_id=frame_id)
        return new_st, new_state, pred_score, ok_s & (~is_better | ok_c)

    def _step_search(self, shape, variables, st: OnlineCachedTrackState,
                     img_v, img_i):
        new_st, new_state, pred_score, _ = self._step_search_w(
            shape, variables, st, img_v, img_i)
        return new_st, new_state, pred_score

    def _step_w(self, shape, variables, st: OnlineCachedTrackState, img_v,
                img_i, offset=None):
        """RoiChunkMixin entry: search/candidate crops read the window; the
        cache rebuild reads only template crops already in the state, so it
        needs no window pixels."""
        new_st, new_state, pred_score, ok = self._step_search_w(
            shape, variables, st, img_v, img_i, offset)
        do_update = (new_st.frame_id % self.update_interval) == 0
        cache = jax.lax.cond(do_update,
                             lambda: self._rebuild_cache(variables, new_st),
                             lambda: new_st.cache)
        return new_st.replace(cache=cache), (new_state, pred_score), ok

    def _rebuild_cache(self, variables, st: OnlineCachedTrackState):
        """set_online over the base template + the already-committed online
        template crops carried in the state."""
        t_vi = jnp.concatenate([st.template_v, st.template_i], axis=0)
        ot_vi = jnp.concatenate([st.online_template_v, st.online_template_i],
                                axis=0)
        return self.model.apply(variables, t_vi, ot_vi,
                                method=type(self.model).set_online)

    def _step(self, shape, variables, st: OnlineCachedTrackState, img_v, img_i):
        new_st, new_state, pred_score = self._step_search(shape, variables,
                                                          st, img_v, img_i)
        do_update = (new_st.frame_id % self.update_interval) == 0
        cache = jax.lax.cond(do_update,
                             lambda: self._rebuild_cache(variables, new_st),
                             lambda: new_st.cache)
        return new_st.replace(cache=cache), new_state, pred_score



@dataclasses.dataclass
class OnlineTrackerJit(RoiChunkMixin):
    """Unimodal online tracking with a multi-template ring buffer over the
    set_online / forward_test cached-k/v path (CvT/ViT/ConvMAE online).

    Parity: lib/test/tracker/mixformer_cvt_online.py — online_size>1 keeps a
    template ring buffer; per-frame forward_test reuses the cached template
    k/v; every update_interval the max-score candidate replaces the slot at
    forget_id and set_online recomputes the cache (:152-168).

    TPU-first (static shapes): the ring buffer always holds `online_size`
    slots, but `n_filled` + set_online's slot_mask make unfilled slots
    invisible to every attention — growth-EXACT vs the reference's buffer
    that grows one commit at a time (:158-162).
    """
    model: Any
    variables: Any
    template_factor: float = 2.0
    template_size: int = 128
    search_factor: float = 4.5
    search_size: int = 288
    update_interval: int = 200
    online_size: int = 3
    max_score_decay: float = 1.0
    mode: str = "RGB"            # RGB | TIR | Prompt
    #: reference Prompt blend is hardcoded 0.95*RGB + 0.05*JET(TIR)
    #: (lib/test/evaluation/tracker.py:160)
    prompt_lambda: float = 0.05
    scan_chunk: int = 32

    def __post_init__(self):
        if self.mode not in ("RGB", "TIR", "Prompt"):
            raise ValueError(f"unimodal tracker mode {self.mode!r} "
                             "(expected RGB | TIR | Prompt)")
        self._init_jit = {}
        self._track_jit = {}
        self._scan_jit = {}
        self._scan_roi_jit = {}

    def _frame(self, img_v, img_i):
        if self.mode == "RGB":
            return img_v
        if self.mode == "TIR":
            return apply_jet(img_i)
        return (1 - self.prompt_lambda) * img_v.astype(jnp.float32) + \
            self.prompt_lambda * apply_jet(img_i)

    def _slot_mask(self, n_filled):
        return (jnp.arange(self.online_size) < n_filled).astype(jnp.float32)

    def _set_online(self, variables, template, ring, n_filled):
        return self.model.apply(variables, template, ring,
                                self._slot_mask(n_filled),
                                method=self.model.set_online)

    def _init_step(self, variables, frame, box):
        t, _ = _prep_rgb(frame, box, self.template_factor, self.template_size)
        ring = jnp.concatenate([t] * self.online_size, axis=0)
        # reference init: online buffer = [template] (1 live slot)
        n_filled = jnp.int32(1)
        cache = self._set_online(variables, t, ring, n_filled)
        st = OnlineTrackState(
            template_v=t, template_i=t,
            online_template_v=ring, online_template_i=ring,
            max_template_v=t, max_template_i=t,
            max_pred_score=jnp.float32(-1.0), forget_id=jnp.int32(0),
            state=box.astype(jnp.float32), frame_id=jnp.int32(0),
            n_filled=n_filled)
        return st, cache

    def _init_state(self, variables, img_v, img_i, box):
        """Uniform (img_v, img_i) entry (returns the (state, cache) pair);
        used by _make_init and vmapped by the batched lockstep tracker."""
        return self._init_step(variables, self._frame(img_v, img_i), box)

    def _make_init(self, shape):
        # mode transform inside the jit (one device program per frame)
        return jax.jit(self._init_state)

    def _step_search_w(self, shape, variables, st: OnlineTrackState, cache,
                       img, offset=None):
        """Everything except the set_online cache refresh: cached forward +
        score head, candidate selection, the interval-gated ring COMMIT
        (elementwise selects — vmap-safe) and candidacy reset. The refresh
        cond is composed on top by _step and hoisted out of the vmap by the
        batched lockstep tracker. `offset` = ROI-window mode."""
        H, W = shape
        frame_id = st.frame_id + 1
        s, rf, ok_s = _prep_rgb_w(img, st.state, self.search_factor,
                                  self.search_size, offset, shape)
        out = self.model.apply(variables, s, cache, run_score_head=True,
                               method=self.model.forward_test)
        pred = out["pred_boxes"].reshape(-1, 4).mean(axis=0)
        has_score = "pred_scores" in out
        pred_score = jax.nn.sigmoid(
            out["pred_scores"].reshape(-1)[0].astype(jnp.float32)
        ) if has_score else jnp.float32(1.0)
        pred = pred * (self.search_size / rf)
        new_state = clip_box(_map_box_back(pred, st.state, self.search_size, rf),
                             H, W, margin=10)

        max_score = st.max_pred_score * self.max_score_decay
        # without a score head the candidate is ALWAYS the current frame
        # (fixed-interval refresh like the plain trackers); a constant 1.0
        # score under strict > would lock the first post-reset frame in
        is_better = ((pred_score > 0.5) & (pred_score > max_score)
                     ) if has_score else jnp.bool_(True)
        cand, _, ok_c = _prep_rgb_w(img, new_state, self.template_factor,
                                    self.template_size, offset, shape)
        max_t = jnp.where(is_better, cand, st.max_template_v)
        max_score = jnp.where(is_better, pred_score, max_score)

        do_update = (frame_id % self.update_interval) == 0
        # reference commit (mixformer_cvt_online.py:152-162): APPEND while
        # the buffer is short of online_size, then replace at forget_id
        was_full = st.n_filled >= self.online_size
        write_pos = jnp.where(was_full, st.forget_id, st.n_filled)
        ring = jnp.where(
            do_update,
            jax.lax.dynamic_update_slice_in_dim(
                st.online_template_v, max_t, write_pos, axis=0),
            st.online_template_v)
        forget_id = jnp.where(do_update & was_full,
                              (st.forget_id + 1) % self.online_size,
                              st.forget_id)
        n_filled = jnp.where(do_update,
                             jnp.minimum(st.n_filled + 1, self.online_size),
                             st.n_filled)
        max_t = jnp.where(do_update, st.template_v, max_t)
        max_score = jnp.where(do_update, jnp.float32(-1.0), max_score)

        new_st = OnlineTrackState(
            template_v=st.template_v, template_i=st.template_i,
            online_template_v=ring, online_template_i=ring,
            max_template_v=max_t, max_template_i=max_t,
            max_pred_score=max_score, forget_id=forget_id,
            state=new_state, frame_id=frame_id, n_filled=n_filled)
        # without a score head the candidate crop is ALWAYS selected, so its
        # window validity always matters; with one, only when selected
        ok = ok_s & (ok_c if not has_score else (~is_better | ok_c))
        return new_st, new_state, pred_score, ok

    def _step_search(self, shape, variables, st: OnlineTrackState, cache, img):
        new_st, new_state, pred_score, _ = self._step_search_w(
            shape, variables, st, cache, img)
        return new_st, new_state, pred_score

    def _refresh_cache(self, variables, st: OnlineTrackState):
        """set_online over the base template + the already-committed ring."""
        return self._set_online(variables, st.template_v,
                                st.online_template_v, st.n_filled)

    def _step(self, shape, variables, st: OnlineTrackState, cache, img):
        new_st, new_state, pred_score = self._step_search(shape, variables,
                                                          st, cache, img)
        do_update = (new_st.frame_id % self.update_interval) == 0
        cache = jax.lax.cond(do_update,
                             lambda: self._refresh_cache(variables, new_st),
                             lambda: cache)
        return new_st, cache, new_state, pred_score

    # ------------------------------------------------- ROI-window upload mode
    # the carry threads (state, cache) — unlike the RGBT families the k/v
    # cache lives OUTSIDE the state pytree here
    def _carry(self):
        return (self._state, self._cache)

    def _set_carry(self, carry) -> None:
        self._state, self._cache = carry

    def _step_w(self, shape, variables, carry, img_v, img_i, offset=None):
        """RoiChunkMixin entry: raw modal windows in, the RGB/TIR/Prompt mode
        transform applied inside (pixelwise, so transforming the window
        equals windowing the transformed frame); the ring refresh reads only
        crops already committed in the state — no window pixels."""
        st, cache = carry
        img = self._frame(img_v, img_i)
        new_st, new_state, pred_score, ok = self._step_search_w(
            shape, variables, st, cache, img, offset)
        do_update = (new_st.frame_id % self.update_interval) == 0
        cache = jax.lax.cond(do_update,
                             lambda: self._refresh_cache(variables, new_st),
                             lambda: cache)
        return (new_st, cache), (new_state, pred_score), ok

    def _make_track(self, shape):
        def track_fn(variables, st, cache, img_v, img_i):
            return self._step(shape, variables, st, cache,
                              self._frame(img_v, img_i))
        # NOTE: no donate_argnums — buffer donation costs ~130ms/exec through
        # this environment's IFRT proxy (vs 0.4ms without); the state is ~1MB
        # so the HBM saving is irrelevant.
        return jax.jit(track_fn)

    def _make_track_scan(self, shape, chunk: int):
        def track_fn(variables, st, cache, frames_v, frames_i, valid):
            def body(carry, fr):
                st, cache = carry
                img_v, img_i, ok = fr
                frame = self._frame(img_v, img_i)
                new_st, new_cache, new_state, score = self._step(
                    shape, variables, st, cache, frame)
                keep = lambda a, b: jnp.where(ok, a, b)
                new_st = jax.tree_util.tree_map(keep, new_st, st)
                new_cache = jax.tree_util.tree_map(keep, new_cache, cache)
                return (new_st, new_cache), (new_state, score)

            (st, cache), outs = jax.lax.scan(body, (st, cache),
                                             (frames_v, frames_i, valid))
            return st, cache, outs
        return jax.jit(track_fn)

    def track_chunk(self, frames_v, frames_i, fetch: bool = True):
        """Scan'd chunk path over the cached-k/v forward_test steps. Returns
        (boxes (N,4), scores (N,))."""
        K = self.scan_chunk
        key = (self._shape, K)
        if key not in self._scan_jit:
            self._scan_jit[key] = self._make_track_scan(self._shape, K)
        fn = self._scan_jit[key]

        def run_block(carry, blk_v, blk_i, ok):
            st, cache = carry
            st, cache, outs = fn(self.variables, st, cache, blk_v, blk_i, ok)
            return (st, cache), outs

        (self._state, self._cache), outs = _run_chunked(
            run_block, (self._state, self._cache), frames_v, frames_i, K)
        boxes = jnp.concatenate([o[0] for o in outs], axis=0)
        scores = jnp.concatenate([o[1] for o in outs], axis=0)
        if fetch:
            return np.asarray(boxes), np.asarray(scores)
        return boxes, scores

    def initialize(self, image, info: dict):
        img = image[0] if isinstance(image, (list, tuple)) else image
        img_i = image[1] if isinstance(image, (list, tuple)) and len(image) > 1 else img
        shape = img.shape[:2]
        if shape not in self._init_jit:
            self._init_jit[shape] = self._make_init(shape)
            self._track_jit[shape] = self._make_track(shape)
        dv = _put(img)
        di = dv if img_i is img else _put(img_i)
        box = _select_init_box(info["init_bbox"], self.mode)
        self._state, self._cache = self._init_jit[shape](
            self.variables, dv, di, _put(box, np.float32))
        self._shape = shape

    def track(self, image, info: Optional[dict] = None):
        img = image[0] if isinstance(image, (list, tuple)) else image
        img_i = image[1] if isinstance(image, (list, tuple)) and len(image) > 1 else img
        dv = _put(img)
        di = dv if img_i is img else _put(img_i)
        self._state, self._cache, box, score = self._track_jit[self._shape](
            self.variables, self._state, self._cache, dv, di)
        return {"target_bbox": [float(b) for b in np.asarray(box)],
                "pred_score": float(score)}


@dataclasses.dataclass
class RGBTrackerJit(RoiChunkMixin):
    """Unimodal device tracking loop (RGB / TIR / Prompt input modes).

    Parity: lib/test/evaluation/tracker.py:56-57,155-190 — TIR mode feeds the
    JET-mapped IR frame into the RGB tracker; Prompt blends
    (1-lambda)*RGB + lambda*JET(TIR).
    """
    model: Any
    variables: Any
    template_factor: float = 2.0
    template_size: int = 128
    search_factor: float = 4.5
    search_size: int = 288
    update_interval: int = 200
    mode: str = "RGB"            # RGB | TIR | Prompt
    #: reference Prompt blend is hardcoded 0.95*RGB + 0.05*JET(TIR)
    #: (lib/test/evaluation/tracker.py:160)
    prompt_lambda: float = 0.05

    scan_chunk: int = 32

    def __post_init__(self):
        if self.mode not in ("RGB", "TIR", "Prompt"):
            raise ValueError(f"unimodal tracker mode {self.mode!r} "
                             "(expected RGB | TIR | Prompt)")
        self._init_jit = {}
        self._track_jit = {}
        self._scan_jit = {}
        self._scan_roi_jit = {}

    def _frame(self, img_v, img_i):
        if self.mode == "RGB":
            return img_v
        if self.mode == "TIR":
            return apply_jet(img_i)
        return (1 - self.prompt_lambda) * img_v.astype(jnp.float32) + \
            self.prompt_lambda * apply_jet(img_i)

    def _init_step(self, variables, frame, box):
        t, _ = _prep_rgb(frame, box, self.template_factor, self.template_size)
        return TrackState(template_v=t, template_i=t, online_template_v=t,
                          online_template_i=t, state=box.astype(jnp.float32),
                          frame_id=jnp.int32(0))

    def _init_state(self, variables, img_v, img_i, box):
        """Uniform (img_v, img_i) entry for the batched lockstep trackers;
        the RGB/TIR/Prompt mode transform happens inside."""
        return self._init_step(variables, self._frame(img_v, img_i), box)

    def _make_init(self, shape):
        # the RGB/TIR/Prompt mode transform traces INSIDE the jit: the whole
        # per-frame pipeline stays one device program (CLAUDE.md invariant)
        return jax.jit(self._init_state)

    def _step_core(self, shape, variables, st: TrackState, img, offset=None):
        H, W = shape
        frame_id = st.frame_id + 1
        s, rf, ok_s = _prep_rgb_w(img, st.state, self.search_factor,
                                  self.search_size, offset, shape)
        out = self.model.apply(variables, st.template_v, st.online_template_v, s)
        pred = out["pred_boxes"].reshape(-1, 4).mean(axis=0)
        pred = pred * (self.search_size / rf)
        new_state = clip_box(_map_box_back(pred, st.state, self.search_size, rf),
                             H, W, margin=10)

        def updated():
            ot, _, ok_t = _prep_rgb_w(img, new_state, self.template_factor,
                                      self.template_size, offset, shape)
            return ot, ok_t

        do_update = (frame_id % self.update_interval) == 0
        ot, ok_t = jax.lax.cond(
            do_update, updated,
            lambda: (st.online_template_v, jnp.bool_(True)))
        new_st = TrackState(template_v=st.template_v, template_i=st.template_i,
                            online_template_v=ot, online_template_i=ot,
                            state=new_state, frame_id=frame_id)
        return new_st, new_state, ok_s & ok_t

    def _step(self, shape, variables, st: TrackState, img):
        new_st, new_state, _ = self._step_core(shape, variables, st, img)
        return new_st, new_state

    def _step_w(self, shape, variables, st, img_v, img_i, offset=None):
        """RoiChunkMixin entry: raw modal frames in, mode transform applied
        inside (pixelwise, so transforming the window equals windowing the
        transformed frame)."""
        return self._step_core(shape, variables, st,
                               self._frame(img_v, img_i), offset)

    def _make_track(self, shape):
        def track_fn(variables, st, img_v, img_i):
            return self._step(shape, variables, st,
                              self._frame(img_v, img_i))
        return jax.jit(track_fn)   # no donation: ~130ms/exec via IFRT proxy

    def _make_track_scan(self, shape, chunk: int):
        def track_fn(variables, st, frames_v, frames_i, valid):
            def body(st, fr):
                img_v, img_i, ok = fr
                frame = self._frame(img_v, img_i)
                new_st, new_state = self._step(shape, variables, st, frame)
                new_st = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), new_st, st)
                return new_st, new_state

            st, boxes = jax.lax.scan(body, st, (frames_v, frames_i, valid))
            return st, boxes
        return jax.jit(track_fn)

    def track_chunk(self, frames_v, frames_i, fetch: bool = True):
        """Scan'd chunk path (see RGBTTrackerJit.track_chunk); the RGB/TIR/
        Prompt mode transform is applied per frame inside the scan."""
        K = self.scan_chunk
        key = (self._shape, K)
        if key not in self._scan_jit:
            self._scan_jit[key] = self._make_track_scan(self._shape, K)
        fn = self._scan_jit[key]

        def run_block(st, blk_v, blk_i, ok):
            return fn(self.variables, st, blk_v, blk_i, ok)

        self._state, boxes = _run_chunked(run_block, self._state,
                                          frames_v, frames_i, K)
        stacked = jnp.concatenate(boxes, axis=0)
        return np.asarray(stacked) if fetch else stacked

    def initialize(self, image, info: dict):
        img = image[0] if isinstance(image, (list, tuple)) else image
        img_i = image[1] if isinstance(image, (list, tuple)) and len(image) > 1 else img
        shape = img.shape[:2]
        if shape not in self._init_jit:
            self._init_jit[shape] = self._make_init(shape)
            self._track_jit[shape] = self._make_track(shape)
        dv = _put(img)
        di = dv if img_i is img else _put(img_i)
        box = _select_init_box(info["init_bbox"], self.mode)
        self._state = self._init_jit[shape](self.variables, dv, di,
                                            _put(box, np.float32))
        self._shape = shape

    def track(self, image, info: Optional[dict] = None):
        img = image[0] if isinstance(image, (list, tuple)) else image
        img_i = image[1] if isinstance(image, (list, tuple)) and len(image) > 1 else img
        dv = _put(img)
        di = dv if img_i is img else _put(img_i)
        self._state, box = self._track_jit[self._shape](self.variables,
                                                        self._state, dv, di)
        return {"target_bbox": [float(b) for b in np.asarray(box)]}


@dataclasses.dataclass
class RGBCachedTrackerJit(RGBTrackerJit):
    """RGBTrackerJit over the model's own set_online/forward_test k/v cache:
    the base (non-online) unimodal trackers in the reference run the full
    network per frame (lib/test/tracker/mixformer_vit.py), but the same
    asymmetry that powers forward_test makes a cached per-frame step exact
    here too. Works for every unimodal family (ViT/CvT/ConvMAE share the
    {"mem", "template"}-style cache contract); cache rebuilt at template
    updates inside the jitted step."""

    def _init_step(self, variables, frame, box):
        t, _ = _prep_rgb(frame, box, self.template_factor, self.template_size)
        cache = self.model.apply(variables, t, t,
                                 method=type(self.model).set_online)
        return CachedTrackState(template_v=t, template_i=t, cache=cache,
                                state=box.astype(jnp.float32),
                                frame_id=jnp.int32(0))

    def _step_search_w(self, shape, variables, st: CachedTrackState, img,
                       offset=None):
        """Search-only step against the frozen cache (rebuild composed on
        top by _step; hoisted out of the vmap by the batched tracker)."""
        H, W = shape
        frame_id = st.frame_id + 1
        s, rf, ok = _prep_rgb_w(img, st.state, self.search_factor,
                                self.search_size, offset, shape)
        out = self.model.apply(variables, s, st.cache,
                               method=type(self.model).forward_test)
        pred = out["pred_boxes"].reshape(-1, 4).mean(axis=0)
        pred = pred * (self.search_size / rf)
        new_state = clip_box(_map_box_back(pred, st.state, self.search_size, rf),
                             H, W, margin=10)
        new_st = CachedTrackState(template_v=st.template_v,
                                  template_i=st.template_i, cache=st.cache,
                                  state=new_state, frame_id=frame_id)
        return new_st, new_state, ok

    def _step_search(self, shape, variables, st: CachedTrackState, img):
        new_st, new_state, _ = self._step_search_w(shape, variables, st, img)
        return new_st, new_state

    def _rebuild_cache_w(self, variables, st: CachedTrackState, img,
                         offset=None, shape=None):
        ot, _, ok = _prep_rgb_w(img, st.state, self.template_factor,
                                self.template_size, offset, shape)
        return self.model.apply(variables, st.template_v, ot,
                                method=type(self.model).set_online), ok

    def _rebuild_cache(self, variables, st: CachedTrackState, img):
        return self._rebuild_cache_w(variables, st, img)[0]

    def _step_core(self, shape, variables, st: CachedTrackState, img,
                   offset=None):
        new_st, new_state, ok_s = self._step_search_w(shape, variables, st,
                                                      img, offset)
        do_update = (new_st.frame_id % self.update_interval) == 0
        cache, ok_t = jax.lax.cond(
            do_update,
            lambda: self._rebuild_cache_w(variables, new_st, img, offset,
                                          shape),
            lambda: (new_st.cache, jnp.bool_(True)))
        return new_st.replace(cache=cache), new_state, ok_s & ok_t

    def _step(self, shape, variables, st: CachedTrackState, img):
        new_st, new_state, _ = self._step_core(shape, variables, st, img)
        return new_st, new_state
