"""Device-side target-region cropping for the tracking hot loop.

Numerical parity target: the host/cv2 pipeline in the reference
(lib/train/data/processing_utils.py:15-83 `sample_target`): a square crop of
side ceil(sqrt(w*h)*factor) centred (with integer rounding) on the box,
zero-padded (BORDER_CONSTANT) outside the image — including the reference's
off-by-one quirk where the crop's valid region is limited to
[max(x1,0), min(x2, W-1)) — then bilinearly resized (cv2.INTER_LINEAR,
half-pixel centres) to output_sz x output_sz.

TPU-first design: instead of gather-based warping, the crop+pad+resize is
expressed as two small dense matmuls per channel:

    out[c] = A_y @ img[c] @ A_x^T

where A_y: (out_sz, H) and A_x: (out_sz, W) are 2-tap bilinear resampling
matrices built on device from the (dynamic) crop window. Taps falling in the
zero-padded region simply have no column, so padding is implicit. Both matmuls
map straight onto the MXU; the whole op jits into a single fused HLO with no
dynamic shapes, so one tracking step is one H2D frame copy + one jitted call.

Lowering A/B (v5e, 512x640x4, out 288, K=2048-chained scan, 2026-08-18):
this matmul pair costs ~40 us net (52 incl. the 12 us scan floor); a fused
Pallas kernel (tent weights in VMEM + both matmuls per grid cell) measured
62 us, and a 2-tap gather+lerp lowering tied single-stream (52 us) but lost
2.1x under vmap at B=16 (578 vs 1219 us — batched gathers lower poorly).
So the single XLA lowering stays. NOTE: at K<=128 the ~27 ms fixed
dispatch+fetch cost masquerades as ~210 us/iter and dominates any of these
differences — amortise with K>=2048 before attributing time here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _resample_matrix(full_extent: int, out_sz: int, lo: jax.Array, crop_sz: jax.Array,
                     frame_lo=None, frame_hi_excl=None) -> jax.Array:
    """Build the (out_sz, full_extent) 1-D resampling matrix.

    lo       : crop window start in image coords (int32 scalar, may be <0)
    crop_sz  : crop window size in pixels (int32 scalar, >= 1)

    Output row j holds the bilinear weights of output pixel j over image
    pixels, sampling crop coordinate c_j = (j + 0.5) * crop_sz / out_sz - 0.5
    (cv2 half-pixel convention), clamped to the crop borders, and masked to
    the valid (un-padded) image region [max(lo,0), min(lo+crop_sz, ext-1)).

    frame_lo / frame_hi_excl override the 0 / ext-1 frame bounds for the
    ROI-window mode (crop_resize_window): there the array is a sub-window of
    the frame, so the frame edges live at dynamic positions -offset and
    frame_extent - offset - 1 in window coordinates.
    """
    crop_f = crop_sz.astype(jnp.float32)
    j = jnp.arange(out_sz, dtype=jnp.float32)
    c = (j + 0.5) * (crop_f / out_sz) - 0.5
    c = jnp.clip(c, 0.0, crop_f - 1.0)
    c0 = jnp.floor(c)
    frac = c - c0
    c0 = c0.astype(jnp.int32)

    # Tap positions in image coordinates.
    t0 = lo + c0          # (out_sz,)
    t1 = t0 + 1
    w0 = 1.0 - frac
    w1 = frac

    valid_lo = jnp.maximum(lo, 0 if frame_lo is None else frame_lo)
    # Reference quirk: x2_pad = max(x2 - W + 1, 0) drops the last image
    # row/col whenever the window touches it (processing_utils.py:45,48).
    valid_hi = jnp.minimum(
        lo + crop_sz,
        full_extent - 1 if frame_hi_excl is None else frame_hi_excl)  # exclusive

    cols = jnp.arange(full_extent, dtype=jnp.int32)[None, :]           # (1, ext)
    in_valid = (cols >= valid_lo) & (cols < valid_hi)
    m0 = (cols == t0[:, None]) & in_valid
    m1 = (cols == t1[:, None]) & in_valid
    A = m0 * w0[:, None] + m1 * w1[:, None]
    return A.astype(jnp.float32)  # (out_sz, ext)


def crop_resize(img: jax.Array, box_xywh: jax.Array, search_area_factor: float,
                output_sz: int):
    """Square crop around `box_xywh` resized to (output_sz, output_sz).

    img      : (H, W, C) or (H, W) float or uint8 image (device array)
    box_xywh : (4,) float [x, y, w, h] in image coords
    returns  : (crop, resize_factor) with crop (output_sz, output_sz, C) f32
               ((output_sz, output_sz) for 2-D input) and
               resize_factor = output_sz / crop_sz (f32 scalar).
    """
    if img.ndim == 2:
        crop, rf = crop_resize(img[..., None], box_xywh, search_area_factor,
                               output_sz)
        return crop[..., 0], rf
    H, W = img.shape[0], img.shape[1]
    x, y, w, h = box_xywh[0], box_xywh[1], box_xywh[2], box_xywh[3]
    crop_sz = jnp.ceil(jnp.sqrt(w * h) * search_area_factor)
    crop_sz = jnp.maximum(crop_sz, 1.0)
    # jnp.round rounds half-to-even, same as the python round() used by the
    # reference, so the integer crop window matches exactly.
    x1 = jnp.round(x + 0.5 * w - crop_sz * 0.5).astype(jnp.int32)
    y1 = jnp.round(y + 0.5 * h - crop_sz * 0.5).astype(jnp.int32)
    crop_i = crop_sz.astype(jnp.int32)

    A_y = _resample_matrix(H, output_sz, y1, crop_i)   # (out, H)
    A_x = _resample_matrix(W, output_sz, x1, crop_i)   # (out, W)

    imf = img.astype(jnp.float32)
    # (out, H) @ (H, W*C) -> (out, W, C); then contract W with A_x.
    tmp = jnp.einsum("oh,hwc->owc", A_y, imf, precision="highest")
    out = jnp.einsum("pw,owc->opc", A_x, tmp, precision="highest")
    resize_factor = output_sz / crop_sz
    return out, resize_factor


def crop_resize_window(window: jax.Array, box_xywh: jax.Array,
                       offset_xy: jax.Array, frame_hw,
                       search_area_factor: float, output_sz: int):
    """crop_resize against a SUB-WINDOW of the frame (ROI upload mode).

    The tracking loop reads only a ~factor*sqrt(wh)-sized region per frame,
    so the host can upload a conservative window instead of the full frame
    (the upload leg is the transport bottleneck — artifacts/
    profile_upload_r3.json / profile_overlap_r4.json). This routine crops in
    window coordinates and reports whether the result is BIT-IDENTICAL to
    the full-frame crop_resize.

    window    : (Hw, Ww, C) sub-image, window[0,0] at frame coords
                (offset_xy[1], offset_xy[0]); the window must lie inside the
                frame (the host clips it when placing it).
    box_xywh  : (4,) float box in FRAME coordinates.
    offset_xy : (2,) int32 [ox, oy] frame coords of the window origin.
    frame_hw  : static (H, W) of the full frame.
    returns   : (crop, resize_factor, valid) — valid (bool scalar) is True
                iff every frame pixel the full-frame crop would read lies
                inside the window, i.e. crop == crop_resize(frame, box)[0]
                bitwise. On False the caller must fall back to full frames.
    """
    if window.ndim == 2:
        crop, rf, ok = crop_resize_window(window[..., None], box_xywh,
                                          offset_xy, frame_hw,
                                          search_area_factor, output_sz)
        return crop[..., 0], rf, ok
    H, W = frame_hw
    Hw, Ww = window.shape[0], window.shape[1]
    ox = offset_xy[0].astype(jnp.int32)
    oy = offset_xy[1].astype(jnp.int32)
    x, y, w, h = box_xywh[0], box_xywh[1], box_xywh[2], box_xywh[3]
    crop_sz = jnp.ceil(jnp.sqrt(w * h) * search_area_factor)
    crop_sz = jnp.maximum(crop_sz, 1.0)
    # identical integer window to crop_resize (computed in frame coords,
    # then shifted by the integer offset — exact)
    x1 = jnp.round(x + 0.5 * w - crop_sz * 0.5).astype(jnp.int32)
    y1 = jnp.round(y + 0.5 * h - crop_sz * 0.5).astype(jnp.int32)
    crop_i = crop_sz.astype(jnp.int32)

    # the frame-valid tap range the full-frame crop reads (incl. the
    # last-row/col drop quirk); the window must contain all of it
    def _covered(lo, ext, o, wext):
        read_lo = jnp.maximum(lo, 0)
        read_hi = jnp.minimum(lo + crop_i, ext - 1)            # exclusive
        return (read_hi <= read_lo) | ((read_lo >= o) & (read_hi <= o + wext))

    valid = _covered(x1, W, ox, Ww) & _covered(y1, H, oy, Hw)

    A_y = _resample_matrix(Hw, output_sz, y1 - oy, crop_i,
                           frame_lo=-oy, frame_hi_excl=H - 1 - oy)
    A_x = _resample_matrix(Ww, output_sz, x1 - ox, crop_i,
                           frame_lo=-ox, frame_hi_excl=W - 1 - ox)

    imf = window.astype(jnp.float32)
    tmp = jnp.einsum("oh,hwc->owc", A_y, imf, precision="highest")
    out = jnp.einsum("pw,owc->opc", A_x, tmp, precision="highest")
    resize_factor = output_sz / crop_sz
    return out, resize_factor, valid


def crop_resize_batch(imgs: jax.Array, boxes_xywh: jax.Array, search_area_factor: float,
                      output_sz: int):
    """vmapped crop_resize over a leading batch axis."""
    return jax.vmap(lambda im, b: crop_resize(im, b, search_area_factor, output_sz))(imgs, boxes_xywh)


def normalize_imagenet(x: jax.Array) -> jax.Array:
    """uint8-scale (0..255) HWC/NHWC image -> ImageNet-normalised float."""
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype=jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype=jnp.float32)
    return (x.astype(jnp.float32) / 255.0 - mean) / std
