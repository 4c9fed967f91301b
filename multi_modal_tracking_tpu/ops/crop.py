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
map straight onto the MXU.

Two lowerings:
  * XLA (`_crop_resize_xla`): one fused HLO — but the matrix construction
    spreads over ~20 small VPU/scalar kernels whose launch overhead dominates
    (measured 2026-08-18 on v5e: 206 us of the 249 us prep cost at 512x640).
  * Pallas (`_crop_resize_pallas`, default on TPU): ONE kernel — per (channel,
    row-tile) grid cell the resampling weights are materialised in VMEM as a
    tent function max(0, 1-|col - c_j|) (bit-identical to the two-tap
    construction: the tent evaluates to exactly 1-frac / frac at the two tap
    columns) and both matmuls run on the MXU at f32-highest precision with
    the image tile never leaving VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Row-tile of the Pallas crop kernel (images are zero-padded to a multiple).
_TILE_H = 256
#: Pallas path guard: per-cell VMEM ~ (2*out+5*TILE_H)*W*4 bytes must fit the
#: ~16 MB scoped stack; 4096 keeps the worst case (out 288) ~ 7.6 MB.
_MAX_W = 4096

#: Test hook: run the Pallas kernel in interpreter mode (CPU), like
#: ops.attention / ops.msda.
FORCE_INTERPRET = False
#: Explicit dispatch override: True/False forces the lowering, None = auto
#: (Pallas on TPU when the geometry fits, XLA otherwise).
USE_PALLAS = None


def _resample_matrix(full_extent: int, out_sz: int, lo: jax.Array, crop_sz: jax.Array) -> jax.Array:
    """Build the (out_sz, full_extent) 1-D resampling matrix.

    lo       : crop window start in image coords (int32 scalar, may be <0)
    crop_sz  : crop window size in pixels (int32 scalar, >= 1)

    Output row j holds the bilinear weights of output pixel j over image
    pixels, sampling crop coordinate c_j = (j + 0.5) * crop_sz / out_sz - 0.5
    (cv2 half-pixel convention), clamped to the crop borders, and masked to
    the valid (un-padded) image region [max(lo,0), min(lo+crop_sz, ext-1)).
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

    valid_lo = jnp.maximum(lo, 0)
    # Reference quirk: x2_pad = max(x2 - W + 1, 0) drops the last image
    # row/col whenever the window touches it (processing_utils.py:45,48).
    valid_hi = jnp.minimum(lo + crop_sz, full_extent - 1)  # exclusive

    cols = jnp.arange(full_extent, dtype=jnp.int32)[None, :]           # (1, ext)
    in_valid = (cols >= valid_lo) & (cols < valid_hi)
    m0 = (cols == t0[:, None]) & in_valid
    m1 = (cols == t1[:, None]) & in_valid
    A = m0 * w0[:, None] + m1 * w1[:, None]
    return A.astype(jnp.float32)  # (out_sz, ext)


def _crop_window(box_xywh: jax.Array, search_area_factor: float):
    """Integer crop window (x1, y1, crop_sz) as f32 scalars (exact ints)."""
    x, y, w, h = box_xywh[0], box_xywh[1], box_xywh[2], box_xywh[3]
    crop_sz = jnp.ceil(jnp.sqrt(w * h) * search_area_factor)
    crop_sz = jnp.maximum(crop_sz, 1.0)
    # jnp.round rounds half-to-even, same as the python round() used by the
    # reference, so the integer crop window matches exactly.
    x1 = jnp.round(x + 0.5 * w - crop_sz * 0.5)
    y1 = jnp.round(y + 0.5 * h - crop_sz * 0.5)
    return x1, y1, crop_sz


def _tent_weights(out_sz: int, tile: int, row0, lo, crop, full_extent: int):
    """(out_sz, tile) resample weights for image columns [row0, row0+tile).

    Tent form of the 2-tap bilinear matrix: weight(j, col) =
    max(0, 1 - |(col - lo) - c_j|) with c_j the clamped crop-space sample
    coordinate — evaluates to exactly 1-frac at t0 and frac at t1 (f32
    subtraction of values within a factor of 2 is exact), i.e. bit-identical
    to `_resample_matrix`, but built in 3 vector ops instead of ~10.
    lo/crop are f32 scalars holding exact integers; row0 is the tile's
    absolute column offset; full_extent masks the reference's valid region
    [max(lo,0), min(lo+crop, full_extent-1)).
    """
    crop_f = crop.astype(jnp.float32)
    # Mosaic only vectorises INTEGER iota; convert after (exact for < 2^24).
    j = jax.lax.broadcasted_iota(jnp.int32, (out_sz, tile), 0
                                 ).astype(jnp.float32)
    c = (j + 0.5) * (crop_f / out_sz) - 0.5
    c = jnp.clip(c, 0.0, crop_f - 1.0)
    colf = jax.lax.broadcasted_iota(jnp.int32, (out_sz, tile), 1
                                    ).astype(jnp.float32) + row0
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs((colf - lo) - c))
    valid_lo = jnp.maximum(lo, 0.0)
    valid_hi = jnp.minimum(lo + crop_f, float(full_extent - 1))  # exclusive
    return jnp.where((colf >= valid_lo) & (colf < valid_hi), wgt, 0.0)


def _crop_kernel(scal_ref, img_ref, out_ref, tmp_ref, ax_ref, *,
                 out_sz: int, H: int, W: int):
    """One (channel, row-tile) grid cell: accumulate A_y[:, tile] @ img[tile]
    into VMEM scratch; at the last row tile apply A_x^T and emit the channel.
    """
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    x1 = scal_ref[0]
    y1 = scal_ref[1]
    crop = scal_ref[2]

    first = (pl.program_id(0) == 0) & (h == 0)

    @pl.when(first)
    def _():
        ax_ref[:] = _tent_weights(out_sz, W, 0.0, x1, crop, W)

    ay = _tent_weights(out_sz, _TILE_H, (h * _TILE_H).astype(jnp.float32),
                       y1, crop, H)
    part = jax.lax.dot_general(
        ay, img_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    @pl.when(h == 0)
    def _():
        tmp_ref[:] = part

    @pl.when(h > 0)
    def _():
        tmp_ref[:] = tmp_ref[:] + part

    @pl.when(h == nh - 1)
    def _():
        out_ref[0] = jax.lax.dot_general(
            tmp_ref[:], ax_ref[:], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _crop_resize_pallas(img_chw: jax.Array, scal: jax.Array, output_sz: int,
                        H: int, W: int):
    """img_chw: (C, H_pad, W) any dtype; scal: (3,) f32 [x1, y1, crop_sz].
    Returns (C, out, out) f32."""
    C, HP, _ = img_chw.shape
    kernel = functools.partial(_crop_kernel, out_sz=output_sz, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(C, HP // _TILE_H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _TILE_H, W), lambda c, h: (c, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, output_sz, output_sz),
                               lambda c, h: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, output_sz, output_sz), jnp.float32),
        scratch_shapes=[pltpu.VMEM((output_sz, W), jnp.float32),
                        pltpu.VMEM((output_sz, W), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 6 * C * output_sz * (HP + output_sz) * W,
            bytes_accessed=C * (HP * W * img_chw.dtype.itemsize
                                + output_sz * output_sz * 4),
            transcendentals=0,
        ),
        interpret=FORCE_INTERPRET,
    )(scal, img_chw)


def _use_pallas(H: int, W: int) -> bool:
    if USE_PALLAS is not None:
        return USE_PALLAS
    if FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu" and W <= _MAX_W


def _crop_resize_xla(img, box_xywh, search_area_factor: float, output_sz: int):
    H, W = img.shape[0], img.shape[1]
    x1, y1, crop_sz = _crop_window(box_xywh, search_area_factor)
    A_y = _resample_matrix(H, output_sz, y1.astype(jnp.int32),
                           crop_sz.astype(jnp.int32))   # (out, H)
    A_x = _resample_matrix(W, output_sz, x1.astype(jnp.int32),
                           crop_sz.astype(jnp.int32))   # (out, W)
    imf = img.astype(jnp.float32)
    # (out, H) @ (H, W*C) -> (out, W, C); then contract W with A_x.
    tmp = jnp.einsum("oh,hwc->owc", A_y, imf, precision="highest")
    return jnp.einsum("pw,owc->opc", A_x, tmp, precision="highest")


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
    x1, y1, crop_sz = _crop_window(box_xywh, search_area_factor)
    if _use_pallas(H, W):
        scal = jnp.stack([x1, y1, crop_sz])
        chw = jnp.moveaxis(img, -1, 0)
        pad = (-H) % _TILE_H
        if pad:
            chw = jnp.pad(chw, ((0, 0), (0, pad), (0, 0)))
        out = jnp.moveaxis(_crop_resize_pallas(chw, scal, output_sz, H, W),
                           0, -1)
    else:
        out = _crop_resize_xla(img, box_xywh, search_area_factor, output_sz)
    return out, output_sz / crop_sz


def crop_resize_batch(imgs: jax.Array, boxes_xywh: jax.Array, search_area_factor: float,
                      output_sz: int):
    """vmapped crop_resize over a leading batch axis."""
    return jax.vmap(lambda im, b: crop_resize(im, b, search_area_factor, output_sz))(imgs, boxes_xywh)


def normalize_imagenet(x: jax.Array) -> jax.Array:
    """uint8-scale (0..255) HWC/NHWC image -> ImageNet-normalised float."""
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype=jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype=jnp.float32)
    return (x.astype(jnp.float32) / 255.0 - mean) / std
