"""Box prediction heads.

Parity targets: lib/models/mixformer_cvt/head.py —
  Corner_Predictor (:23-94, CORNER, stride 16): two 5-conv towers producing
  top-left / bottom-right score maps, decoded by soft-argmax expectation over
  a stride-spaced coordinate mesh, normalised by feat_sz*stride.
  Pyramid_Corner_Predictor (:98-212, CORNER_UP, stride 4): adds two 2x
  nearest-upsampling stages with lateral adjust convs and multi-scale score
  fusion.
  MLP head (:215-232).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.layers import ConvBNRelu


def soft_argmax(score_map: jax.Array, stride: int):
    """(B, F, F) score map -> expected (x, y) in image-pixel units."""
    B, F, _ = score_map.shape
    vec = score_map.reshape(B, F * F).astype(jnp.float32)
    prob = jax.nn.softmax(vec, axis=1)
    idx = jnp.arange(F * F)
    coord_x = ((idx % F) * stride).astype(jnp.float32)
    coord_y = ((idx // F) * stride).astype(jnp.float32)
    exp_x = (prob * coord_x).sum(axis=1)
    exp_y = (prob * coord_y).sum(axis=1)
    return exp_x, exp_y, prob


def _upsample2x(x: jax.Array) -> jax.Array:
    """Nearest 2x upsample of NHWC (F.interpolate default mode='nearest')."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def _upsample4x(x: jax.Array) -> jax.Array:
    return _upsample2x(_upsample2x(x))


class CornerTower(nn.Module):
    """conv1..conv4 (Conv-BN-ReLU) + conv5 (1x1) score-map tower."""
    channel: int
    freeze_bn: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channel
        kw = dict(frozen=self.freeze_bn, axis_name=self.axis_name, dtype=self.dtype)
        x = ConvBNRelu(c, **kw, name="conv1")(x, train)
        x = ConvBNRelu(c // 2, **kw, name="conv2")(x, train)
        x = ConvBNRelu(c // 4, **kw, name="conv3")(x, train)
        x = ConvBNRelu(c // 8, **kw, name="conv4")(x, train)
        x = nn.Conv(1, kernel_size=(1, 1), dtype=self.dtype, name="conv5")(x)
        return x[..., 0]  # (B, F, F)


class CornerPredictor(nn.Module):
    """CORNER head (stride 16)."""
    channel: int = 384
    feat_sz: int = 18
    stride: int = 16
    freeze_bn: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_dist: bool = False):
        """x: (B, F, F, C) fused search feature -> xyxy box normalised to 1."""
        kw = dict(channel=self.channel, freeze_bn=self.freeze_bn,
                  axis_name=self.axis_name, dtype=self.dtype)
        map_tl = CornerTower(**kw, name="tower_tl")(x, train)
        map_br = CornerTower(**kw, name="tower_br")(x, train)
        img_sz = self.feat_sz * self.stride
        x_tl, y_tl, p_tl = soft_argmax(map_tl, self.stride)
        x_br, y_br, p_br = soft_argmax(map_br, self.stride)
        box = jnp.stack([x_tl, y_tl, x_br, y_br], axis=1) / img_sz
        if return_dist:
            return box, p_tl, p_br
        return box


class PyramidTower(nn.Module):
    """One corner branch of the CORNER_UP pyramid head."""
    channel: int
    freeze_bn: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channel
        kw = dict(frozen=self.freeze_bn, axis_name=self.axis_name, dtype=self.dtype)
        x_init = x
        x1 = ConvBNRelu(c, **kw, name="conv1")(x, train)
        x2 = ConvBNRelu(c // 2, **kw, name="conv2")(x1, train)

        up1 = _upsample2x(ConvBNRelu(c // 2, **kw, name="adjust1")(x_init, train)) + _upsample2x(x2)
        x3 = ConvBNRelu(c // 4, **kw, name="conv3")(up1, train)

        up2 = _upsample4x(ConvBNRelu(c // 4, **kw, name="adjust2")(x_init, train)) + _upsample2x(x3)
        x4 = ConvBNRelu(c // 8, **kw, name="conv4")(up2, train)

        score = nn.Conv(1, kernel_size=(1, 1), dtype=self.dtype, name="conv5")(x4)[..., 0]

        a3 = ConvBNRelu(c // 4, **kw, name="adjust3_0")(x2, train)
        a3 = ConvBNRelu(c // 8, **kw, name="adjust3_1")(a3, train)
        a3 = ConvBNRelu(1, **kw, name="adjust3_2")(a3, train)
        a4 = ConvBNRelu(c // 8, **kw, name="adjust4_0")(x3, train)
        a4 = ConvBNRelu(1, **kw, name="adjust4_1")(a4, train)
        return score + _upsample4x(a3)[..., 0] + _upsample2x(a4)[..., 0]


class PyramidCornerPredictor(nn.Module):
    """CORNER_UP head (effective stride 4 after two upsampling stages)."""
    channel: int = 384
    feat_sz: int = 72          # search_size / 4
    stride: int = 4
    freeze_bn: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_dist: bool = False):
        kw = dict(channel=self.channel, freeze_bn=self.freeze_bn,
                  axis_name=self.axis_name, dtype=self.dtype)
        map_tl = PyramidTower(**kw, name="tower_tl")(x, train)
        map_br = PyramidTower(**kw, name="tower_br")(x, train)
        img_sz = self.feat_sz * self.stride
        x_tl, y_tl, p_tl = soft_argmax(map_tl, self.stride)
        x_br, y_br, p_br = soft_argmax(map_br, self.stride)
        box = jnp.stack([x_tl, y_tl, x_br, y_br], axis=1) / img_sz
        if return_dist:
            return box, p_tl, p_br
        return box


class MLPHead(nn.Module):
    """num_layers-deep MLP with ReLU between layers (head.py:215)."""
    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # `train` accepted (unused — no BN) for head-interface uniformity:
        # every model family calls box_head(x, train=...).
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(self.out_dim if last else self.hidden_dim, dtype=self.dtype,
                         name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


