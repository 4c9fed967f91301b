"""Track a video file (or image directory) and write an annotated video.

Parity target: tracking/video_demo.py + lib/test/evaluation/tracker.py
run_video (:210+) of the reference — the interactive cv2 UI is replaced by a
headless variant (init box from --optional_box) suitable for remote TPU
hosts — plus the reference's one live UI element, cv2.selectROI init, behind
--select_roi (the reference's imshow loop itself is commented out in its own
source, tracker.py:282-331); output is an mp4 with the predicted box drawn
per frame, same as the reference's video_writer path.

Usage:
  python tracking/video_demo.py mixformer_vit baseline path/to/video.mp4 \
      --optional_box 120 80 60 50 --checkpoint ckpt.msgpack
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _frames_from(path):
    import cv2
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        for n in names:
            img = cv2.imread(os.path.join(path, n))
            if img is not None:
                yield cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return
    cap = cv2.VideoCapture(path)
    while True:
        ok, img = cap.read()
        if not ok:
            return
        yield cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("script", type=str)
    p.add_argument("config", type=str, nargs="?", default=None)
    p.add_argument("video", type=str, help="video file or image directory")
    p.add_argument("--optional_box", type=float, nargs=4, default=None,
                   metavar=("x", "y", "w", "h"))
    p.add_argument("--select_roi", action="store_true",
                   help="pick the init box interactively with cv2.selectROI "
                        "(the reference run_video's only live UI element — "
                        "its imshow loop is commented out, tracker.py:"
                        "282-331 — and needs a display; headless hosts use "
                        "--optional_box)")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out", type=str, default="output/demo.mp4")
    p.add_argument("--fps", type=int, default=30)
    args = p.parse_args()

    import cv2
    import numpy as np
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker, is_rgbt_script
    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.eval.visualize import draw_boxes

    params = get_parameters(args.script, args.config, checkpoint=args.checkpoint)
    mode = "RGBT" if is_rgbt_script(args.script) else "RGB"
    tracker = create_tracker(params, mode=mode)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    writer = None
    init_box = args.optional_box
    for k, frame in enumerate(_frames_from(args.video)):
        image = [frame, frame] if mode == "RGBT" else frame
        if k == 0:
            if init_box is None:
                if not args.select_roi:
                    raise SystemExit(
                        "pass --optional_box x y w h, or --select_roi on a "
                        "host with a display")
                # reference run_video init (lib/test/evaluation/tracker.py:282)
                x, y, w, h = cv2.selectROI(
                    "Select target ROI and press ENTER",
                    cv2.cvtColor(frame, cv2.COLOR_RGB2BGR), fromCenter=False)
                init_box = [float(x), float(y), float(w), float(h)]
            tracker.initialize(image, {"init_bbox": list(init_box)})
            box = list(init_box)
        else:
            box = tracker.track(image)["target_bbox"]
        vis = draw_boxes(frame, {"pred": box})
        if writer is None:
            h, w = vis.shape[:2]
            writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                                     args.fps, (w, h))
        writer.write(cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
    if writer is not None:
        writer.release()
    print("wrote", args.out)


if __name__ == "__main__":
    main()
