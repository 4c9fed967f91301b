"""Video -> numbered image frames (reference tracking/video2imgs.py)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def video2imgs(video_path: str, img_dir: str, ext: str = "jpg") -> int:
    import cv2
    os.makedirs(img_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    k = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        cv2.imwrite(os.path.join(img_dir, f"{k:06d}.{ext}"), frame)
        k += 1
    cap.release()
    return k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("video_path", type=str)
    p.add_argument("img_dir", type=str)
    p.add_argument("--ext", type=str, default="jpg")
    a = p.parse_args()
    print(f"wrote {video2imgs(a.video_path, a.img_dir, a.ext)} frames")


if __name__ == "__main__":
    main()
