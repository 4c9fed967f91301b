"""Modulated deformable convolution v2 (the mmcv ModulatedDeformConv2d CUDA
op used by the RGBT_Fusion_2/3 fusion modules, fusion_utils.py:3,26-83).

TPU-native formulation: per output position and kernel tap, sample the input
bilinearly at (base tap position + learned offset), scale by the learned
modulation mask, then contract all (tap, in-channel) pairs with the weight —
i.e. an im2col gather followed by ONE (kh*kw*Cin, Cout) matmul on the MXU.
Zero padding outside the image (bilinear taps outside contribute 0), exact
mmcv border semantics. Fully differentiable through JAX autodiff (the
reference needed a hand-written CUDA backward).

Layouts (NHWC): x (B, H, W, Cin); offset (B, Ho, Wo, dg*kh*kw*2) with
(dy, dx) interleaved per tap; mask (B, Ho, Wo, dg*kh*kw);
weight (kh, kw, Cin, Cout). Deform groups split Cin; each group has its own
offsets/mask.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """img: (H, W, C); ys/xs: (...,) sample coords. Returns (..., C) with
    zeros outside [0, H-1] x [0, W-1] (mmcv zero-border semantics)."""
    H, W, C = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    out = 0.0
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            yy = y0 + dy
            xx = x0 + dx
            valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            v = img[yi, xi]                              # (..., C)
            out = out + jnp.where(valid[..., None], (wy * wx)[..., None] * v, 0.0)
    return out


def modulated_deform_conv2d(x: jax.Array, offset: jax.Array, mask: jax.Array,
                            weight: jax.Array, bias: Optional[jax.Array] = None,
                            stride: int = 1, padding: int = 1,
                            deform_groups: int = 1) -> jax.Array:
    """DCNv2 forward. Shapes as in the module docstring."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    dg = deform_groups
    Ho = (H + 2 * padding - kh) // stride + 1
    Wo = (W + 2 * padding - kw) // stride + 1
    cg = Cin // dg

    # base sampling grid: output position p -> tap positions p*stride - pad + k
    oy = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(kh, dtype=jnp.float32)
    kx = jnp.arange(kw, dtype=jnp.float32)
    base_y = oy[:, None, None, None] + ky[None, None, :, None]   # (Ho,1,kh,1)
    base_x = ox[None, :, None, None] + kx[None, None, None, :]   # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, kh, kw)).reshape(Ho, Wo, kh * kw)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, kh, kw)).reshape(Ho, Wo, kh * kw)

    off = offset.reshape(B, Ho, Wo, dg, kh * kw, 2).astype(jnp.float32)
    m = mask.reshape(B, Ho, Wo, dg, kh * kw).astype(jnp.float32)

    def one_image(img, off_b, m_b):
        # img (H, W, Cin) -> sampled (Ho, Wo, kh*kw, Cin), group-wise offsets
        cols = []
        for g in range(dg):
            ys = base_y + off_b[..., g, :, 0]
            xs = base_x + off_b[..., g, :, 1]
            s = _bilinear_gather(img[..., g * cg:(g + 1) * cg], ys, xs)
            cols.append(s * m_b[..., g, :, None])
        return jnp.concatenate(cols, axis=-1)      # (Ho, Wo, kh*kw, Cin) grouped

    sampled = jax.vmap(one_image)(x.astype(jnp.float32), off, m)
    # groups are contiguous channel slices in order, so the concat above
    # restores the original channel order — one big matmul over all taps.
    wmat = weight.reshape(kh * kw, Cin, Cout)
    out = jnp.einsum("bhwkc,kco->bhwo", sampled, wmat.astype(jnp.float32))
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
