"""Precise RoI Pooling (PrRoIPool) as a closed-form differentiable jnp op.

Parity target: the reference's CUDA extension
external/PreciseRoIPooling/src/prroi_pooling_gpu_impl.cu (used by the SPM
score decoder, lib/models/mixformer_cvt/score_decoder.py:19,50): each output
bin is the *exact integral average* of the bilinearly-interpolated feature map
over the bin rectangle, with exact gradients w.r.t. both features and RoI
coordinates.

TPU-first design: the 2-D integral of a bilinear surface separates into a
product of 1-D hat-function integrals, so each RoI's pooling is two small
dense matmuls,

    out = (A_y @ feat @ A_x^T) / bin_area,

with A_y: (ph, H), A_x: (pw, W) built from closed-form hat integrals. The op
is smooth in the RoI coordinates, so jax.grad reproduces PrRoI's
coordinate-gradient property with no custom VJP.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _hat_cdf(u: jax.Array) -> jax.Array:
    """G(u) = integral_{-inf}^{u} max(0, 1-|t|) dt  (total mass 1)."""
    u = jnp.clip(u, -1.0, 1.0)
    neg = 0.5 * (u + 1.0) ** 2
    pos = 0.5 + u - 0.5 * u ** 2
    return jnp.where(u <= 0.0, neg, pos)


def _axis_matrix(extent: int, pooled: int, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """(pooled, extent) matrix of per-bin hat integrals along one axis.

    Bin k spans [lo + k*bw, lo + (k+1)*bw] with bw = (hi - lo)/pooled; entry
    [k, p] = integral over that span of the unit hat centred at pixel p.
    Feature values outside [0, extent-1] are implicitly zero because those
    hats have no column.
    """
    bw = (hi - lo) / pooled
    k = jnp.arange(pooled, dtype=jnp.float32)
    a = lo + k * bw                                   # (pooled,)
    b = a + bw
    p = jnp.arange(extent, dtype=jnp.float32)[None, :]  # (1, extent)
    return _hat_cdf(b[:, None] - p) - _hat_cdf(a[:, None] - p)


def prroi_pool(feat: jax.Array, rois: jax.Array, pooled_h: int, pooled_w: int,
               spatial_scale: float = 1.0) -> jax.Array:
    """Precise RoI pooling.

    feat  : (B, H, W, C) feature maps (NHWC)
    rois  : (N, 5) rows [batch_index, x0, y0, x1, y1] in un-scaled coords
    returns (N, pooled_h, pooled_w, C)
    """
    B, H, W, C = feat.shape

    def one(roi):
        bidx = roi[0].astype(jnp.int32)
        x0, y0, x1, y1 = roi[1] * spatial_scale, roi[2] * spatial_scale, roi[3] * spatial_scale, roi[4] * spatial_scale
        Ay = _axis_matrix(H, pooled_h, y0, y1)        # (ph, H)
        Ax = _axis_matrix(W, pooled_w, x0, x1)        # (pw, W)
        f = jax.lax.dynamic_index_in_dim(feat, bidx, axis=0, keepdims=False)  # (H, W, C)
        tmp = jnp.einsum("ph,hwc->pwc", Ay, f.astype(jnp.float32), precision="highest")
        out = jnp.einsum("qw,pwc->pqc", Ax, tmp, precision="highest")      # (ph, pw, C)
        bin_area = ((y1 - y0) / pooled_h) * ((x1 - x0) / pooled_w)
        # Reference kernel divides by max(win_size, 0) and emits 0 for
        # degenerate bins (prroi_pooling_gpu_impl.cu PrRoIPoolingForward).
        return jnp.where(bin_area > 0, out / jnp.maximum(bin_area, 1e-12), 0.0)

    return jax.vmap(one)(rois.astype(jnp.float32))
