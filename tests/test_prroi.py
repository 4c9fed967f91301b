"""PrRoIPool vs avg_pool gold (same acceptance test as the reference's
external/PreciseRoIPooling/pytorch/tests/test_prroi_pooling2d.py) plus
coordinate-gradient checks."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multi_modal_tracking_tpu.ops.prroi import prroi_pool


def test_aligned_roi_equals_avg_pool():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 8, 8, 5
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # RoI covering the full map, pooled to 4x4 == 2x2 avg pooling of the
    # bilinear surface; integer-aligned bins over integer corners reduce to
    # the average of interpolated values, matching avg_pool on a 2x-upsampled
    # bilinear surface. Use exact half-integer bins vs torch oracle instead:
    rois = np.array([[0, 0.0, 0.0, W - 1, H - 1], [1, 0.0, 0.0, W - 1, H - 1]], dtype=np.float32)
    out = np.asarray(prroi_pool(jnp.asarray(feat), jnp.asarray(rois), 4, 4, 1.0))

    # Torch oracle: dense integral via fine bilinear supersampling.
    t = torch.tensor(feat).permute(0, 3, 1, 2)  # (B, C, H, W)
    up = 64
    # sample grid over [0, H-1] x [0, W-1]
    ys = torch.linspace(0, H - 1, 4 * up + 1)
    xs = torch.linspace(0, W - 1, 4 * up + 1)
    gy = (ys / (H - 1)) * 2 - 1
    gx = (xs / (W - 1)) * 2 - 1
    grid = torch.stack(torch.meshgrid(gy, gx, indexing="ij")[::-1], dim=-1)[None].expand(B, -1, -1, -1)
    dense = F.grid_sample(t, grid, mode="bilinear", align_corners=True)  # (B, C, n, n)
    # trapezoid-average each bin
    ref = np.zeros((B, 4, 4, C), np.float32)
    dn = dense.numpy()
    for i in range(4):
        for j in range(4):
            sl = dn[:, :, i * up:(i + 1) * up + 1, j * up:(j + 1) * up + 1]
            wgt = np.ones((sl.shape[2], sl.shape[3]))
            wgt[0, :] *= 0.5; wgt[-1, :] *= 0.5; wgt[:, 0] *= 0.5; wgt[:, -1] *= 0.5
            ref[:, i, j, :] = (sl * wgt).sum(axis=(2, 3)) / wgt.sum()
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def test_point_roi_is_zero():
    feat = jnp.ones((1, 6, 6, 2))
    rois = jnp.asarray([[0, 2.0, 2.0, 2.0, 2.0]])
    out = prroi_pool(feat, rois, 2, 2, 1.0)
    assert float(jnp.abs(out).max()) == 0.0


def test_constant_field_average_is_constant():
    feat = jnp.full((1, 10, 10, 3), 7.0)
    rois = jnp.asarray([[0, 1.3, 2.1, 7.9, 8.4]])
    out = prroi_pool(feat, rois, 3, 3, 1.0)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_coordinate_gradients_match_finite_difference():
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.standard_normal((1, 12, 12, 2)).astype(np.float32))

    def f(coords):
        rois = jnp.concatenate([jnp.zeros((1, 1)), coords[None]], axis=1)
        return prroi_pool(feat, rois, 4, 4, 1.0).sum()

    c0 = jnp.asarray([2.2, 3.1, 9.7, 8.9])
    g = jax.grad(f)(c0)
    eps = 1e-3
    for k in range(4):
        d = jnp.zeros(4).at[k].set(eps)
        fd = (f(c0 + d) - f(c0 - d)) / (2 * eps)
        assert abs(float(fd) - float(g[k])) < 5e-2, (k, float(fd), float(g[k]))
