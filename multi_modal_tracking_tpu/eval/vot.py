"""VOT toolkit integration (trax protocol).

Parity targets:
  lib/test/vot20/vot.py — VOT client wrapper over the trax server (channel
  configs: color / rgbd / rgbt / ir, :24-40); here the trax dependency is
  injectable so the experiment loop is testable without the toolkit.
  lib/test/vot_rgbd_test/tracker_class.py — Tracer_VOT (:31-123): per-frame
  score head, max-score template update every update_interval, and
  run_vot_exp (:136-191): initialize from the first frame's region, then
  report (rect, confidence) per frame.
  lib/test/evaluation/depth_utils.py get_rgbd_frame (:4-60): depth png ->
  normalised JET pseudo-RGB.
"""
from __future__ import annotations

import collections
from typing import Optional

import numpy as np

Rectangle = collections.namedtuple("Rectangle", ["x", "y", "width", "height"])


class VOTClient:
    """Minimal VOT/trax client.

    Uses the `trax` python package when available (exactly like the
    reference); a pre-built server object can be injected for testing or for
    alternative transports. The injected server must provide wait() ->
    request objects with .type in {"initialize", "frame", "quit"},
    .region (x, y, w, h) and .image (list of file paths), plus
    status(region, confidence) and quit().
    """

    def __init__(self, channels: str = "color", server=None):
        if server is not None:
            self._trax = server
        else:
            import trax

            chans = {"color": ["color"], "rgbd": ["color", "depth"],
                     "rgbt": ["color", "ir"], "ir": ["ir"]}[channels]
            self._trax = trax.Server([trax.Region.RECTANGLE], [trax.Image.PATH],
                                     chans, customMetadata=dict(vot="python"))
        request = self._trax.wait()
        assert request.type == "initialize"
        self._region = Rectangle(*self._unpack_region(request))
        self._image = self._unpack_image(request)
        self._trax.status(request.region if hasattr(request, "region") else None)

    @staticmethod
    def _unpack_region(request):
        r = request.region
        if hasattr(r, "bounds"):
            return r.bounds()
        return tuple(r)

    @staticmethod
    def _unpack_image(request):
        img = request.image
        if isinstance(img, dict):
            paths = [x.path() if hasattr(x, "path") else x for x in img.values()]
        elif isinstance(img, (list, tuple)):
            paths = [x.path() if hasattr(x, "path") else x for x in img]
        else:
            paths = [img.path() if hasattr(img, "path") else img]
        return paths if len(paths) > 1 else paths[0]

    def region(self) -> Rectangle:
        return self._region

    def report(self, region, confidence: Optional[float] = None):
        """region: Rectangle for box trackers, or a binary uint8 HxW array
        for VOT2020 mask experiments."""
        r = region
        try:
            import trax
            if isinstance(region, Rectangle):
                r = trax.Region.create("rectangle", region.x, region.y,
                                       region.width, region.height)
            elif isinstance(region, np.ndarray):
                r = trax.Mask.create(region)
        except Exception:
            pass
        self._trax.status(r, {"confidence": confidence} if confidence is not None else {})

    def frame(self):
        """Next frame path(s), or None at end of sequence."""
        request = self._trax.wait()
        if request.type != "frame":
            return None
        return self._unpack_image(request)

    def quit(self):
        if hasattr(self._trax, "quit"):
            self._trax.quit()


def run_vot_exp(script: str, training_yaml: Optional[str] = None,
                checkpoint: Optional[str] = None, channels: str = "rgbd",
                update_interval: int = 25, server=None, tracker=None):
    """VOT experiment loop (tracker_class.py run_vot_exp :136-191).

    Reads frame paths from the toolkit, feeds [color, depth-as-JET] (or
    color/ir) pairs to the score-gated online tracker, reports rect +
    confidence every frame.
    """
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.eval.running import _imread, _read_depth_as_rgb

    def load(paths):
        if isinstance(paths, (list, tuple)) and len(paths) == 2:
            img_v = _imread(paths[0])
            aux = _read_depth_as_rgb(paths[1]) if channels == "rgbd" \
                else _imread(paths[1])
            return [img_v, aux]
        img = _imread(paths if isinstance(paths, str) else paths[0])
        return [img, img]

    handle = VOTClient(channels=channels, server=server)
    if tracker is None:
        params = get_parameters(script, training_yaml, checkpoint=checkpoint)
        tracker = create_tracker(params, dataset_name="VOT22RGBD")
        tracker.update_interval = update_interval

    r = handle.region()
    frame0 = load(handle._image)   # the initialize request's frame
    tracker.initialize(frame0, {"init_bbox": [r.x, r.y, r.width, r.height]})
    while True:
        paths = handle.frame()
        if paths is None:
            break
        out = tracker.track(load(paths))
        x, y, w, h = out["target_bbox"]
        handle.report(Rectangle(x, y, w, h), out.get("pred_score", 1.0))
    handle.quit()


def run_vot20_mask_exp(script: str, training_yaml: Optional[str] = None,
                       checkpoint: Optional[str] = None,
                       refine_checkpoint: Optional[str] = None,
                       mask_threshold: float = 0.6, server=None,
                       tracker=None, refiner=None):
    """VOT2020 mask experiment: the tracker's box is refined into a
    segmentation mask by the Alpha-Refine module each frame
    (external/AR/pytracking/VOT2020_super_only_mask_384_HP/
    mixformer_alpha_seg_class.py:19-53; threshold 0.6).

    Reports binary uint8 masks through the trax handle (falls back to the
    rect when the injected server only understands rectangles).
    """
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.eval.running import _imread

    handle = VOTClient(channels="color", server=server)
    if tracker is None:
        params = get_parameters(script, training_yaml, checkpoint=checkpoint)
        tracker = create_tracker(params, dataset_name="VOT20", mode="RGB")
    if refiner is None:
        from multi_modal_tracking_tpu.models.alpha_refine import (ARcmSeg,
                                                                  build_alpha_refine)
        net, variables, spec = build_alpha_refine()
        if refine_checkpoint:
            from multi_modal_tracking_tpu.utils.checkpoint import load_variables
            variables = load_variables(refine_checkpoint, variables)
        refiner = ARcmSeg(variables, spec)

    def load(paths):
        return _imread(paths if isinstance(paths, str) else paths[0])

    r = handle.region()
    box = [r.x, r.y, r.width, r.height]
    frame0 = load(handle._image)
    tracker.initialize(frame0, {"init_bbox": box})
    refiner.initialize(frame0, box)
    while True:
        paths = handle.frame()
        if paths is None:
            break
        frame = load(paths)
        out = tracker.track(frame)
        box = out["target_bbox"]
        mask = (refiner.get_mask(frame, box) > mask_threshold).astype("uint8")
        handle.report(mask, out.get("pred_score", 1.0))
    handle.quit()
