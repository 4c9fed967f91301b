"""ctypes bindings for the native data runtime (native/libmmtrk.so).

The reference's host runtime is torch's C++ DataLoader workers + turbojpeg
(lib/train/data/image_loader.py, loader.py); libmmtrk is the equivalent for
this framework: threaded JPEG decode straight into a batch buffer, JET
pseudo-colour, and the cv2-parity sample_target crop. Every entry point has
a pure-Python fallback so the framework runs without the build toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "libmmtrk.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        hdr = os.path.join(_NATIVE_DIR, "src", "jet_lut.h")
        if not os.path.isfile(hdr):
            out = subprocess.run(
                # sys.executable, not "python3": the generator imports this
                # repo (+ numpy), which a venv's system python may lack
                [sys.executable, os.path.join(_NATIVE_DIR, "gen_jet_header.py")],
                capture_output=True, text=True, cwd=_NATIVE_DIR, check=True)
            with open(hdr, "w") as f:
                f.write(out.stdout)
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-Wall",
             os.path.join(_NATIVE_DIR, "src", "mmtrk.cpp"),
             "-o", _SO, "-shared", "-ljpeg", "-lpthread"],
            capture_output=True, text=True, check=True)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.mmtrk_decode_jpeg_file.restype = ctypes.c_int
    lib.mmtrk_decode_jpeg_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.mmtrk_decode_jpeg_batch.restype = None
    lib.mmtrk_apply_jet.restype = None
    lib.mmtrk_sample_target.restype = ctypes.c_double
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg(path: str, cap_h: int = 2160, cap_w: int = 3840) -> Optional[np.ndarray]:
    """Decode one JPEG to an RGB uint8 array; None if unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty((cap_h, cap_w, 3), dtype=np.uint8)
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    rc = lib.mmtrk_decode_jpeg_file(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap_h, cap_w, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    return buf[:h.value, :w.value].copy()


def decode_jpeg_batch(paths: List[str], cap_h: int, cap_w: int,
                      num_threads: int = 4) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode n JPEGs into one (n, cap_h, cap_w, 3) buffer with a thread
    pool. Returns (buffer, heights, widths); entries that failed have
    height 0."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    buf = np.zeros((n, cap_h, cap_w, 3), dtype=np.uint8)
    hs = np.zeros(n, dtype=np.int32)
    ws = np.zeros(n, dtype=np.int32)
    rc = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.mmtrk_decode_jpeg_batch(
        arr, n, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap_h, cap_w,
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads)
    hs[rc != 0] = 0
    return buf, hs, ws


def apply_jet(img: np.ndarray, out_bgr: bool = True) -> Optional[np.ndarray]:
    """uint8 (H,W) or (H,W,3) -> JET-mapped (H,W,3); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    dst = np.empty((h, w, 3), dtype=np.uint8)
    lib.mmtrk_apply_jet(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(out_bgr))
    return dst


def sample_target(img: np.ndarray, box, factor: float, out_sz: int,
                  with_mask: bool = True):
    """Native sample_target (processing_utils.py semantics). Returns
    (crop, resize_factor, mask) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    H, W, C = img.shape
    crop = np.empty((out_sz, out_sz, C), dtype=np.uint8)
    mask = np.empty((out_sz, out_sz), dtype=np.uint8) if with_mask else None
    lib.mmtrk_sample_target.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_void_p]
    rf = lib.mmtrk_sample_target(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, C,
        float(box[0]), float(box[1]), float(box[2]), float(box[3]),
        float(factor), out_sz,
        crop.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.ctypes.data if mask is not None else None)
    if rf == 0.0:
        return None
    crop = crop[:, :, 0] if C == 1 else crop
    return crop, float(rf), (mask.astype(bool) if mask is not None else None)
