"""Discriminative-correlation-filter building blocks.

Parity target: external/AR/pytracking/libs/dcf.py (hann windows, gaussian
label functions, max2d) and libs/fourier.py (rfft-domain correlation) — the
math substrate of ECO/ATOM/DiMP.

TPU-first: everything is a pure jnp function; correlation runs in the
rfft2 domain (XLA lowers FFTs natively) with static shapes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def hann1d(n: int, centered: bool = True) -> jax.Array:
    """(dcf.py hann1d) Centered or half-shifted 1-D Hann window."""
    if centered:
        return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(1, n + 1) / (n + 1)))
    w = 0.5 * (1.0 + jnp.cos(2.0 * jnp.pi * jnp.arange(0, n // 2 + 1) / (n + 2)))
    return jnp.concatenate([w, jnp.flip(w[1: n - n // 2])])


def hann2d(h: int, w: int) -> jax.Array:
    """(dcf.py hann2d) Outer product of centred 1-D Hanns, (H, W)."""
    return hann1d(h)[:, None] * hann1d(w)[None, :]


def gauss_label_2d(h: int, w: int, sigma: float,
                   center: jax.Array) -> jax.Array:
    """(dcf.py label_function_spatial) Gaussian regression target centred at
    `center` = (cy, cx) in pixel coordinates of an (h, w) map."""
    ky = jnp.arange(h, dtype=jnp.float32) - center[0]
    kx = jnp.arange(w, dtype=jnp.float32) - center[1]
    gy = jnp.exp(-0.5 * (ky / sigma) ** 2)
    gx = jnp.exp(-0.5 * (kx / sigma) ** 2)
    return gy[:, None] * gx[None, :]


def fft2(x: jax.Array) -> jax.Array:
    """rfft2 over the trailing two spatial dims (fourier.py cfft2)."""
    return jnp.fft.rfft2(x, axes=(-2, -1))


def ifft2(xf: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    return jnp.fft.irfft2(xf, s=shape, axes=(-2, -1))


def pad_rfft2(sf: jax.Array, out_hw: Tuple[int, int],
              in_hw: Optional[Tuple[int, int]] = None) -> jax.Array:
    """Zero-pad an rfft2 spectrum (..., h, w//2+1) of an (h, w) real signal
    into the spectrum of an (H, W) grid — exact Fourier (sinc) upsampling,
    the spatial-domain amplitude preserved (pytracking fourier.sample_fs /
    sum_fs zero-padding of score spectra to the common output size).

    The input width cannot be inferred from the half-spectrum when odd, so
    pass in_hw for odd-sized inputs (default assumes even width). Even-size
    Nyquist bins are split half-and-half between the +N/2 and -N/2 rows
    (and halved at the w/2 column); odd sizes have no Nyquist bin and copy
    straight over. Real signals stay real either way.
    """
    h, wf = sf.shape[-2], sf.shape[-1]
    w = 2 * (wf - 1) if in_hw is None else in_hw[1]
    if in_hw is not None:
        assert in_hw[0] == h and w // 2 + 1 == wf, (in_hw, sf.shape)
    H, W = out_hw
    if (h, w) == (H, W):
        return sf
    Wf = W // 2 + 1
    out = jnp.zeros(sf.shape[:-2] + (H, Wf), sf.dtype)
    top = h // 2 + 1                      # rows 0..h/2 (incl. Nyquist if even)
    bot = h - top                         # negative-frequency rows
    body = sf
    if w % 2 == 0 and w < W:              # halve the even-width Nyquist col
        body = body.at[..., :, wf - 1].multiply(0.5)
    rows_top = body[..., :top, :]
    if h % 2 == 0 and h < H:
        # split the Nyquist row half-and-half between +h/2 and -h/2 (the
        # row is Hermitian in kx by itself, so this keeps the signal real)
        rows_top = rows_top.at[..., top - 1, :].multiply(0.5)
        out = out.at[..., H - h // 2, :wf].set(rows_top[..., top - 1, :])
    out = out.at[..., :top, :wf].set(rows_top)
    if bot:
        out = out.at[..., H - bot:, :wf].set(body[..., top:, :])
    return out * (float(H * W) / float(h * w))


def max2d(score: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(dcf.py max2d) argmax of an (H, W) map -> (max_val, (row, col))."""
    idx = jnp.argmax(score)
    h, w = score.shape[-2], score.shape[-1]
    return score.reshape(-1)[idx], jnp.stack([idx // w, idx % w])


def subpixel_peak(score: jax.Array, peak: jax.Array) -> jax.Array:
    """Quadratic sub-pixel refinement of an integer peak (row, col) on a 2-D
    score map (pytracking localisation uses fourier upsampling; a local
    quadratic fit is the standard static-shape equivalent)."""
    h, w = score.shape
    r = jnp.clip(peak[0], 1, h - 2)
    c = jnp.clip(peak[1], 1, w - 2)
    # 1-D parabola fits along each axis
    f0 = score[r, c]
    fr1, fr2 = score[r - 1, c], score[r + 1, c]
    fc1, fc2 = score[r, c - 1], score[r, c + 1]
    # peak of the parabola through (-1, f1), (0, f0), (+1, f2) is
    # (f1 - f2) / (2 (f1 + f2 - 2 f0)); at a maximum the curvature term is
    # <= 0, so guard the degenerate flat case on the NEGATIVE side (a
    # positive floor would flip the offset's sign at every concave peak).
    dr = 0.5 * (fr1 - fr2) / jnp.minimum(fr1 - 2 * f0 + fr2, -1e-12)
    dc = 0.5 * (fc1 - fc2) / jnp.minimum(fc1 - 2 * f0 + fc2, -1e-12)
    dr = jnp.clip(dr, -1.0, 1.0)
    dc = jnp.clip(dc, -1.0, 1.0)
    return jnp.stack([r + dr, c + dc]).astype(jnp.float32)


# localisation flags (pytracking's string flags as int codes so the whole
# decision runs on device; tracker/atom/atom.py:341-404 localize_advanced,
# tracker/dimp/dimp.py:239-304 — identical logic in both)
FLAG_NORMAL = 0
FLAG_NOT_FOUND = 1
FLAG_UNCERTAIN = 2
FLAG_HARD_NEGATIVE = 3


def localize_advanced(score: jax.Array, target_sz_score: jax.Array,
                      prev_disp: jax.Array | None = None, *,
                      not_found_threshold: float = 0.25,
                      distractor_threshold: float = 0.8,
                      hard_negative_threshold: float = 0.5,
                      target_neighborhood_scale: float = 2.2,
                      displacement_scale: float = 0.8):
    """Advanced target localisation with distractor / hard-negative / lost
    detection (atom.py:341-404, dimp.py:239-304), as one pure device fn.

    score: (H, W) response map (after any output window). target_sz_score:
    (2,) target (h, w) in score-map px. prev_disp: (2,) previous target
    displacement from the map centre in score px (zeros for centred crops).

    Returns (disp, flag, max_score): disp (2,) chosen sub-pixel displacement
    from the map centre, flag one of the FLAG_* codes, max_score the primary
    peak value. Decision tree (same order as the reference):
      peak1 < not_found_threshold                     -> NOT_FOUND
      peak2 > distractor_threshold * peak1:
        far/near disambiguation vs prev_disp          -> HARD_NEGATIVE
        (switching to peak2 when it is the near one)
        both far or both near                         -> UNCERTAIN
      peak2 > hard_negative_threshold * peak1
        and peak2 > not_found_threshold               -> HARD_NEGATIVE
      otherwise                                       -> NORMAL
    """
    h, w = score.shape
    center = jnp.asarray([(h - 1) / 2.0, (w - 1) / 2.0])
    if prev_disp is None:
        prev_disp = jnp.zeros(2)

    s1, p1 = max2d(score)
    d1 = subpixel_peak(score, p1) - center

    # mask out the primary target neighbourhood (rounded, clipped window —
    # zeroing [top:bottom) x [left:right) like the reference slice assign)
    half = target_neighborhood_scale * target_sz_score / 2.0
    top = jnp.round(p1[0] - half[0])
    bottom = jnp.round(p1[0] + half[0] + 1)
    left = jnp.round(p1[1] - half[1])
    right = jnp.round(p1[1] + half[1] + 1)
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = (rows >= top) & (rows < bottom) & (cols >= left) & (cols < right)
    masked = jnp.where(inside, 0.0, score)

    s2, p2 = max2d(masked)
    d2 = subpixel_peak(masked, p2) - center

    disp_threshold = displacement_scale * jnp.sqrt(float(h * w)) / 2.0
    n1 = jnp.linalg.norm(d1 - prev_disp)
    n2 = jnp.linalg.norm(d2 - prev_disp)

    c_nf = s1 < not_found_threshold
    c_distr = s2 > distractor_threshold * s1
    c_hn_keep = c_distr & (n2 > disp_threshold) & (n1 < disp_threshold)
    c_hn_switch = c_distr & (n2 < disp_threshold) & (n1 > disp_threshold)
    c_unc = c_distr & ~c_hn_keep & ~c_hn_switch
    c_hn = ~c_distr & (s2 > hard_negative_threshold * s1) & \
        (s2 > not_found_threshold)

    flag = jnp.select(
        [c_nf, c_hn_keep, c_hn_switch, c_unc, c_hn],
        [FLAG_NOT_FOUND, FLAG_HARD_NEGATIVE, FLAG_HARD_NEGATIVE,
         FLAG_UNCERTAIN, FLAG_HARD_NEGATIVE],
        FLAG_NORMAL).astype(jnp.int32)
    disp = jnp.where(c_hn_switch & ~c_nf, d2, d1)
    return disp, flag, s1


def reg_window(h: int, w: int, target_sz: jax.Array, *,
               window_min: float, window_edge: float,
               window_power: float = 2.0, sparsity_threshold: float = 0.05,
               square: bool = False) -> jax.Array:
    """ECO/CCOT spatial regularization window (dcf.py get_reg_filter:106-152),
    as the SPATIAL penalty weight instead of cropped DFT taps.

    The reference builds a polynomial bowl over the sample support, takes its
    DFT, zeroes coefficients below `sparsity_threshold` of the max (so the
    filter-optimization residual stays a few-tap convolution on the filter
    spectrum), corrects the DC tap so the sparsified window's minimum is back
    at `window_min`, then crops the taps.  Convolving the filter spectrum
    with the FULL sparsified tap set is exactly multiplying the spatial
    filter by the sparsified window, so the TPU-native formulation keeps the
    window in the spatial domain: penalty residual = fft2(W * ifft2(f)).
    Equivalence with the reference taps is pinned by
    tests/test_eco_reg_window.py against the imported reference
    get_reg_filter.

    Built on the (h, w) feature grid with `target_sz` = (th, tw) in feature
    cells (the reference builds at image resolution and applies the cropped
    taps on the feature-grid spectrum — same target/support ratio, one grid).
    Fully traceable: target_sz may be a runtime value.  Returns W in
    origin-at-(0,0) layout matching the filter's spatial layout.
    """
    target_sz = jnp.asarray(target_sz, jnp.float32)
    if square:
        side = jnp.sqrt(target_sz.prod())
        target_sz = jnp.stack([side, side])
    reg_scale = 0.5 * target_sz
    # centred grid, zero at index (n-1)//2 (get_reg_filter:120-121)
    wrg = (jnp.arange(h, dtype=jnp.float32) - (h - 1) // 2)[:, None]
    wcg = (jnp.arange(w, dtype=jnp.float32) - (w - 1) // 2)[None, :]
    win = (window_edge - window_min) * (
        jnp.abs(wrg / reg_scale[0]) ** window_power +
        jnp.abs(wcg / reg_scale[1]) ** window_power) + window_min
    # sparsify the DFT (:134-136)
    dft = jnp.fft.rfft2(win) / (h * w)
    keep = jnp.abs(dft) >= sparsity_threshold * jnp.abs(dft).max()
    sparse = jnp.fft.irfft2(jnp.where(keep, dft, 0.0), s=(h, w)) * (h * w)
    # DC correction restores the minimum (:140)
    sparse = sparse - sparse.min() + window_min
    # target at the origin, like the learned filter's impulse layout
    cy, cx = (h - 1) // 2, (w - 1) // 2
    sparse = jnp.roll(sparse, (-cy, -cx), axis=(0, 1))
    # The reference keeps only real(dft) of the CENTRED window (:141).  The
    # centred window is the origin window shifted by (+c, +c), so its DFT
    # carries the phase e^{-2 pi i (k_r c_y + k_c c_x)/n}; taking the real
    # part averages the (+c,+c)- and (-c,-c)-shifted copies, i.e. the
    # effective penalty window is the mean of the window and its diagonally
    # (n-2c)-cell-shifted copy (1 cell for odd sizes, 2 for even).
    return 0.5 * (sparse + jnp.roll(sparse, (h - 2 * cy, w - 2 * cx),
                                    axis=(0, 1)))
