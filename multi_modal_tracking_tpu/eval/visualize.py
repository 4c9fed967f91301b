"""Visualisation tools: result-vs-GT comparison videos and search-feature /
attention panels.

Parity targets:
  gen_video.py RGBT_Vis_Tracker (:28-40) + imgs2video/video2imgs — render
  saved result boxes against GT onto frames and write a video.
  lib/test/mulit_tracker_vis.py Multi_Trackers (:23-47) + tracker_utils
  vis_search (:138-204) — run several models on the same crops and dump
  per-model search-feature panels.
  lib/test/tracker/mixformer_cvt_online.py attention visualisation hooks
  (:99-131) — here the models return feature maps via return_features=True
  instead of framework hooks.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

_COLORS = [(0, 255, 0), (255, 0, 0), (0, 128, 255), (255, 0, 255),
           (0, 255, 255), (255, 255, 0)]


def _cv2():
    import cv2
    return cv2


def draw_boxes(frame: np.ndarray, boxes: Dict[str, Sequence[float]],
               thickness: int = 2) -> np.ndarray:
    """Draw named xywh boxes (GT first = green) onto an RGB frame copy."""
    cv2 = _cv2()
    img = frame.copy()
    for i, (name, b) in enumerate(boxes.items()):
        if b is None or not np.all(np.isfinite(b)):
            continue
        x, y, w, h = [int(round(float(v))) for v in b]
        color = _COLORS[i % len(_COLORS)]
        cv2.rectangle(img, (x, y), (x + w, y + h), color, thickness)
        cv2.putText(img, name, (x, max(12, y - 4)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, color, 1)
    return img


def render_result_video(seq, results: Dict[str, np.ndarray], out_path: str,
                        fps: int = 30, modality: int = 0) -> str:
    """Overlay each tracker's saved boxes + GT on the sequence frames and
    write an mp4 (gen_video.py semantics).

    seq: eval Sequence/RGBTSequence; results: name -> (N, 4) xywh array.
    """
    from multi_modal_tracking_tpu.eval.running import _load_frame

    cv2 = _cv2()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    first = _load_frame(seq, 0)
    frame0 = first[modality] if isinstance(first, list) else first
    h, w = frame0.shape[:2]
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    gt = np.asarray(seq.ground_truth_rect)
    if gt.ndim == 3:          # RGBT pair: visualise the chosen modality's GT
        gt = gt[:, modality]
    n = len(seq.frames)
    for k in range(n):
        fr = _load_frame(seq, k)
        frame = fr[modality] if isinstance(fr, list) else fr
        boxes = {"GT": gt[k] if k < len(gt) else None}
        for name, arr in results.items():
            boxes[name] = arr[k] if k < len(arr) else None
        writer.write(cv2.cvtColor(draw_boxes(frame, boxes), cv2.COLOR_RGB2BGR))
    writer.release()
    return out_path


def feature_panel(feat: np.ndarray, size: int = 144) -> np.ndarray:
    """(h, w, C) feature map -> JET-coloured mean-activation panel
    (tracker_utils.vis_search:138-204)."""
    cv2 = _cv2()
    m = np.asarray(feat, np.float32).mean(axis=-1)
    m = (m - m.min()) / max(float(m.max() - m.min()), 1e-6)
    img = cv2.applyColorMap((m * 255).astype(np.uint8), cv2.COLORMAP_JET)
    return cv2.resize(img, (size, size), interpolation=cv2.INTER_NEAREST)


def attention_panel(score_grid: np.ndarray, frame_crop: Optional[np.ndarray] = None,
                    size: int = 144, alpha: float = 0.5) -> np.ndarray:
    """(gs, gs) attention score grid -> JET heatmap panel, optionally blended
    over the search crop (the reference's attention-map visualisation,
    lib/test/tracker/mixformer_cvt_online.py:99-131 / vis_attn.png)."""
    cv2 = _cv2()
    m = np.asarray(score_grid, np.float32)
    m = (m - m.min()) / max(float(m.max() - m.min()), 1e-6)
    heat = cv2.applyColorMap((m * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = cv2.resize(heat, (size, size), interpolation=cv2.INTER_NEAREST)
    if frame_crop is not None:
        base = cv2.resize(np.asarray(frame_crop, np.uint8), (size, size))
        heat = cv2.addWeighted(base, 1 - alpha, heat, alpha, 0)
    return heat


def dump_attention_maps(tracker, image, out_dir: str, frame_id: int = 0,
                        size: int = 144) -> List[str]:
    """Run the flagship CE model with return_attn_maps and dump per-CE-block
    template->search attention heatmaps for both modalities."""
    import jax.numpy as jnp
    cv2 = _cv2()
    os.makedirs(out_dir, exist_ok=True)
    st = tracker._state
    t_vi = jnp.concatenate([st.template_v, st.template_i], axis=0)
    # cached-template trackers (CachedTrackState) carry no online-template
    # crops — the diagnostic falls back to the base templates there
    otv = getattr(st, "online_template_v", st.template_v)
    oti = getattr(st, "online_template_i", st.template_i)
    ot_vi = jnp.concatenate([otv, oti], axis=0)
    s_vi = _search_crop(tracker, image)
    _, _, _, attn_maps = tracker.model.apply(
        tracker.variables, t_vi, ot_vi, s_vi, tracker.ce_keep_rate,
        method=lambda m, t, ot, s, k: m.backbone(t, ot, s, k, True, True,
                                                 return_attn_maps=True))
    paths = []
    for bi, maps in sorted(attn_maps.items()):
        row = np.concatenate([attention_panel(np.asarray(maps[0, mod]), size=size)
                              for mod in (0, 1)], axis=1)
        p = os.path.join(out_dir, f"attn_block{bi:02d}_{frame_id:04d}.jpg")
        cv2.imwrite(p, row)
        paths.append(p)
    return paths


def dump_search_features(trackers: Dict[str, object], image, info: dict,
                         out_dir: str, frame_id: int = 0) -> List[str]:
    """Run several RGBT models on the same frame and dump per-model fused /
    per-modality search-feature panels (Multi_Trackers semantics).

    trackers: name -> RGBTTrackerJit whose model supports
    return_features=True.
    """
    import jax.numpy as jnp
    cv2 = _cv2()
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, tr in trackers.items():
        tr.initialize(image, info)
        st = tr._state
        t_vi = jnp.concatenate([st.template_v, st.template_i], axis=0)
        out = tr.model.apply(tr.variables, t_vi, t_vi, _search_crop(tr, image),
                             None, return_features=True)
        panels = [feature_panel(np.asarray(out[k][0], np.float32))
                  for k in ("search_v", "search_i", "search_fused")]
        panel = np.concatenate(panels, axis=1)
        p = os.path.join(out_dir, f"{name}_{frame_id:04d}.jpg")
        cv2.imwrite(p, panel)
        paths.append(p)
    return paths


def _search_crop(tr, image):
    import jax.numpy as jnp
    from multi_modal_tracking_tpu.tracking.tracker import _prep_rgb, _prep_tir, _put
    img_v, img_i = image
    st = tr._state
    sv, _ = _prep_rgb(_put(img_v), st.state, tr.search_factor, tr.search_size)
    si, _ = _prep_tir(_put(img_i), st.state, tr.search_factor, tr.search_size)
    return jnp.concatenate([sv, si], axis=0)
