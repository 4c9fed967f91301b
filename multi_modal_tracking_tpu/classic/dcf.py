"""Discriminative-correlation-filter building blocks.

Parity target: external/AR/pytracking/libs/dcf.py (hann windows, gaussian
label functions, max2d) and libs/fourier.py (rfft-domain correlation) — the
math substrate of ECO/ATOM/DiMP.

TPU-first: everything is a pure jnp function; correlation runs in the
rfft2 domain (XLA lowers FFTs natively) with static shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def hann1d(n: int, centered: bool = True) -> jax.Array:
    """(dcf.py hann1d) Centered or half-shifted 1-D Hann window."""
    if centered:
        return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(1, n + 1) / (n + 1)))
    w = 0.5 * (1.0 + jnp.cos(2.0 * jnp.pi * jnp.arange(0, n // 2 + 1) / (n + 1)))
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


def fourier_correlate(feat: jax.Array, filt: jax.Array) -> jax.Array:
    """Circular cross-correlation sum over channels: feat (C, H, W) with
    filter (C, H, W) -> score (H, W). Correlation = IFFT(conj(F_filt)*F_feat),
    summed over C (the ECO/CCOT score operator, fourier.py)."""
    ff = fft2(feat)
    hf = fft2(filt)
    sf = jnp.sum(jnp.conj(hf) * ff, axis=0)
    return ifft2(sf, feat.shape[-2:])


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
    dr = 0.5 * (fr1 - fr2) / jnp.maximum(fr1 - 2 * f0 + fr2, 1e-12)
    dc = 0.5 * (fc1 - fc2) / jnp.maximum(fc1 - 2 * f0 + fc2, 1e-12)
    dr = jnp.clip(dr, -1.0, 1.0)
    dc = jnp.clip(dc, -1.0, 1.0)
    return jnp.stack([r + dr, c + dc]).astype(jnp.float32)
