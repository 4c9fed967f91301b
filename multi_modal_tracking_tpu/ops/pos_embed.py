"""Positional embeddings.

1) MAE-style fixed 2D sin-cos token pos-embeds (parity target:
   lib/models/mixformer_vit/pos_utils.py:20-68) used by the MixFormer ViT
   backbones per template / search grid size.
2) DETR-style sine position encoding over a 2D feature map (parity target:
   lib/models/mixformer_vit_rgbt/deformable_attention/position_encoding.py:18-56,
   always called with a no-padding mask in this framework) used by the
   deformable-attention fusion encoder.

Both are computed once at trace time with static shapes, so they constant-fold
under jit.
"""
from __future__ import annotations

import math

import numpy as np


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """[grid_size**2, embed_dim] fixed sin-cos embedding, w-half THEN h-half.

    Channel order matters for converted checkpoints: the reference's MAE
    pos_utils does `grid = np.meshgrid(grid_w, grid_h)` then feeds grid[0]
    (the W-coordinate array, despite the local name `emb_h`) into the FIRST
    half (pos_utils.py:28,42-45). Backbone weights pretrained against that
    layout would see transposed token geometry under an [h; w] order."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    gw, gh = np.meshgrid(grid_w, grid_h)  # w varies fastest
    emb_first = _sincos_1d(embed_dim // 2, gw)   # reference grid[0] = w
    emb_second = _sincos_1d(embed_dim // 2, gh)  # reference grid[1] = h
    emb = np.concatenate([emb_first, emb_second], axis=1).astype(np.float32)
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim], dtype=np.float32), emb], axis=0)
    return emb


def sine_position_encoding(h: int, w: int, num_pos_feats: int, temperature: float = 10000.0,
                           normalize: bool = True, scale: float | None = None) -> np.ndarray:
    """DETR sine encoding for an un-padded (h, w) map -> [h*w, 2*num_pos_feats].

    With no padding, the cumsum-based y/x embeds reduce to row/col indices
    starting at 1; with normalize=True they become ((i+0.5)/extent)*scale.
    Channel layout matches the reference: [y-half, x-half], each half
    interleaving sin/cos over pairs.
    """
    if scale is None:
        scale = 2 * math.pi
    y_embed = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x_embed = np.arange(1, w + 1, dtype=np.float64)[None, :] * np.ones((h, 1))
    if normalize:
        eps = 1e-6
        y_embed = (y_embed - 0.5) / (y_embed[-1:, :] + eps) * scale
        x_embed = (x_embed - 0.5) / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t  # (h, w, npf)
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2).astype(np.float32)  # (h, w, 2*npf)
    return pos.reshape(h * w, -1)
