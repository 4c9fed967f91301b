"""MixFormer-ConvMAE: 2 conv stages + ViT stage with asymmetric mixed attention.

Parity targets: lib/models/mixformer_convmae/mixformer.py —
  PatchEmbed (:36-50): strided conv + LayerNorm + GELU, applied 3x with patch
  sizes (4, 2, 2) giving total stride 16.
  CBlock (:166-189): conv block = LN -> 1x1 conv -> depthwise 5x5 ("attn") ->
  1x1 conv residual, then LN -> CMlp (1x1 conv FFN) residual.
  Block/Attention (:53-163): stage-3 ViT block with asymmetric mixed attention
  over [t; ot; s] tokens and fixed 2D sin-cos pos-embeds added before stage 3
  (:310-318); set_online / forward_test cached-qkv paths (:96-135, :345-391).
  ConvViT specs (:395-407): convmae_base (256,384,768)x(2,2,11) heads 12,
  convmae_large (384,768,1024)x(2,2,20) heads 16; patch_embed4 Dense after
  stage-3 flatten (:209, :304).
  mixformer_online.py MixFormerOnlineScore (:427-506): + SPM score branch.

TPU-first notes:
  * Stage-1/2 conv blocks run the three crops (t / ot / s) as separate NHWC
    conv calls — XLA batches them onto the MXU; no permute shuffling (the
    reference permutes NCHW<->NHWC around every LayerNorm).
  * Stage-3 reuses the shared `Block` from vit.py: asymmetric attention is
    two fused attention calls (templates-only and search-over-all), the
    fastest static-shape formulation on TPU.
  * Online template memory is an explicit pytree of per-block (k, v) arrays
    (post-projection, per-head) threaded through jitted calls.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.layers import DropPath, gelu_exact
from multi_modal_tracking_tpu.models.vit import Block
from multi_modal_tracking_tpu.models.score_decoder import ScoreDecoder
from multi_modal_tracking_tpu.ops.boxes import box_xyxy_to_cxcywh
from multi_modal_tracking_tpu.ops.pos_embed import get_2d_sincos_pos_embed


class ConvMAEPatchEmbed(nn.Module):
    """Strided conv patchify + LayerNorm + GELU (mixformer_convmae :36-50).

    (B, H, W, Cin) -> (B, H/p, W/p, embed_dim)."""
    embed_dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p),
                    padding="VALID", dtype=self.dtype, name="proj")(x)
        # eps 1e-5: PatchEmbed hardcodes nn.LayerNorm(embed_dim)
        # (mixformer_convmae :44), unlike the eps-1e-6 stage-3 norm_layer
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return gelu_exact(x)


class CBlock(nn.Module):
    """Convolutional block of the ConvMAE early stages (:166-189):
    residual[ 1x1 conv -> depthwise 5x5 -> 1x1 conv ] + residual[ conv FFN ],
    with channel LayerNorms. NHWC throughout."""
    dim: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # eps 1e-5: CBlock hardcodes nn.LayerNorm(dim) (mixformer_convmae
        # :171,:178), ignoring the eps-1e-6 norm_layer the stage-3 blocks use
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv1")(h)
        h = nn.Conv(self.dim, (5, 5), padding=2, feature_group_count=self.dim,
                    dtype=self.dtype, name="attn")(h)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv2")(h)
        x = x + DropPath(self.drop_path, name="dp1")(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Conv(int(self.dim * self.mlp_ratio), (1, 1), dtype=self.dtype,
                    name="mlp_fc1")(h)
        h = gelu_exact(h)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="mlp_fc2")(h)
        return x + DropPath(self.drop_path, name="dp2")(h, deterministic)


class ConvMAEViT(nn.Module):
    """3-stage hybrid backbone (ConvViT, mixformer_convmae :191-391)."""
    img_size_s: int = 288
    img_size_t: int = 128
    patch_size: Tuple[int, ...] = (4, 2, 2)
    embed_dim: Tuple[int, ...] = (256, 384, 768)
    depth: Tuple[int, ...] = (2, 2, 11)
    num_heads: int = 12
    mlp_ratio: Tuple[float, ...] = (4.0, 4.0, 4.0)
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.patch_embed1 = ConvMAEPatchEmbed(self.embed_dim[0], self.patch_size[0],
                                              dtype=self.dtype)
        self.patch_embed2 = ConvMAEPatchEmbed(self.embed_dim[1], self.patch_size[1],
                                              dtype=self.dtype)
        self.patch_embed3 = ConvMAEPatchEmbed(self.embed_dim[2], self.patch_size[2],
                                              dtype=self.dtype)
        self.patch_embed4 = nn.Dense(self.embed_dim[2], dtype=self.dtype)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, sum(self.depth))]
        d0, d1, d2 = self.depth
        self.blocks1 = [CBlock(self.embed_dim[0], self.mlp_ratio[0], dpr[i],
                               dtype=self.dtype, name=f"blocks1_{i}")
                        for i in range(d0)]
        self.blocks2 = [CBlock(self.embed_dim[1], self.mlp_ratio[1], dpr[d0 + i],
                               dtype=self.dtype, name=f"blocks2_{i}")
                        for i in range(d1)]
        self.blocks3 = [Block(self.embed_dim[2], self.num_heads, self.mlp_ratio[2],
                              self.qkv_bias, drop_path=dpr[d0 + d1 + i],
                              dtype=self.dtype, name=f"blocks3_{i}")
                        for i in range(d2)]
        total_stride = int(np.prod(self.patch_size))
        self.grid_size_s = self.img_size_s // total_stride
        self.grid_size_t = self.img_size_t // total_stride
        self.pos_embed_s = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim[2], self.grid_size_s))[None]
        self.pos_embed_t = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim[2], self.grid_size_t))[None]

    def _conv_stages(self, x, deterministic):
        """Image -> stage-3 token sequence (without pos-embed)."""
        x = self.patch_embed1(x)
        for blk in self.blocks1:
            x = blk(x, deterministic)
        x = self.patch_embed2(x)
        for blk in self.blocks2:
            x = blk(x, deterministic)
        x = self.patch_embed3(x)
        B, H, W, C = x.shape
        return self.patch_embed4(x.reshape(B, H * W, C))

    def __call__(self, x_t, x_ot, x_s, deterministic: bool = True):
        """NHWC images -> (t, ot, s) feature maps (B, g, g, C)."""
        t = self._conv_stages(x_t, deterministic) + self.pos_embed_t.astype(self.dtype)
        ot = self._conv_stages(x_ot, deterministic) + self.pos_embed_t.astype(self.dtype)
        s = self._conv_stages(x_s, deterministic) + self.pos_embed_s.astype(self.dtype)
        n_t, n_s = t.shape[1], s.shape[1]
        x = jnp.concatenate([t, ot, s], axis=1)
        for blk in self.blocks3:
            x = blk(x, 2 * n_t, deterministic)
        B = x.shape[0]
        gt, gs = self.grid_size_t, self.grid_size_s
        t, ot, s = x[:, :n_t], x[:, n_t:2 * n_t], x[:, 2 * n_t:]
        return (t.reshape(B, gt, gt, -1), ot.reshape(B, gt, gt, -1),
                s.reshape(B, gs, gs, -1))

    def set_online(self, x_t, x_ot, slot_mask=None):
        """x_t: (1, Ht, Wt, 3); x_ot: (n_ot, Ht, Wt, 3) ring buffer.
        slot_mask (n_ot,) {0,1}: live ring slots (masked slots are invisible
        to every attention — the reference's growing buffer, statically).
        The conv stages act per batch element, so only the attention stage
        needs masking.  Returns (template_feat, per-block (k, v), key_mask).
        """
        t = self._conv_stages(x_t, True) + self.pos_embed_t.astype(self.dtype)
        ot = self._conv_stages(x_ot, True) + self.pos_embed_t.astype(self.dtype)
        n_ot, n_t = ot.shape[0], t.shape[1]
        ot = ot.reshape(1, -1, ot.shape[-1])
        x = jnp.concatenate([t, ot], axis=1)
        key_mask = None
        if slot_mask is not None:
            key_mask = jnp.concatenate(
                [jnp.ones((n_t,), jnp.float32),
                 jnp.repeat(slot_mask.astype(jnp.float32), n_t)], axis=0)
        mem: List[Any] = []
        for blk in self.blocks3:
            x, m = blk.set_online(x, key_mask)
            mem.append(m)
        gt = self.grid_size_t
        return x[:, :n_t].reshape(1, gt, gt, -1), mem, key_mask

    def forward_test(self, x_s, mem, key_mask=None):
        s = self._conv_stages(x_s, True) + self.pos_embed_s.astype(self.dtype)
        for blk, m in zip(self.blocks3, mem):
            s = blk.forward_test(s, m, key_mask)
        B = s.shape[0]
        gs = self.grid_size_s
        return s.reshape(B, gs, gs, -1)


@dataclasses.dataclass(frozen=True)
class ConvMAESpec:
    search_size: int = 288
    template_size: int = 128
    embed_dim: Tuple[int, ...] = (256, 384, 768)
    depth: Tuple[int, ...] = (2, 2, 11)
    num_heads: int = 12
    head_type: str = "CORNER_UP"
    head_dim: int = 384
    head_freeze_bn: bool = False
    drop_path_rate: float = 0.1
    nlayer_head: int = 3

    @staticmethod
    def from_cfg(cfg) -> "ConvMAESpec":
        dims = {
            "convmae_base": ((256, 384, 768), (2, 2, 11), 12),
            "convmae_large": ((384, 768, 1024), (2, 2, 20), 16),
        }[cfg.MODEL.VIT_TYPE]
        return ConvMAESpec(
            search_size=cfg.DATA.SEARCH.SIZE, template_size=cfg.DATA.TEMPLATE.SIZE,
            embed_dim=dims[0], depth=dims[1], num_heads=dims[2],
            head_type=cfg.MODEL.HEAD_TYPE, head_dim=cfg.MODEL.get("HEAD_DIM", 384),
            head_freeze_bn=cfg.MODEL.get("HEAD_FREEZE_BN", False),
            nlayer_head=cfg.MODEL.get("NLAYER_HEAD", 3))


class MixFormerConvMAE(nn.Module):
    """ConvMAE backbone + corner head [+ SPM] (mixformer_convmae
    mixformer.py:427-489, mixformer_online.py:427-526)."""
    spec: ConvMAESpec
    with_score: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        sp = self.spec
        self.backbone = ConvMAEViT(
            img_size_s=sp.search_size, img_size_t=sp.template_size,
            embed_dim=sp.embed_dim, depth=sp.depth, num_heads=sp.num_heads,
            drop_path_rate=sp.drop_path_rate, dtype=self.dtype)
        from multi_modal_tracking_tpu.models.heads import (CornerPredictor,
                                                           PyramidCornerPredictor)
        if sp.head_type == "CORNER_UP":
            self.box_head = PyramidCornerPredictor(
                channel=sp.head_dim, feat_sz=sp.search_size // 4, stride=4,
                freeze_bn=sp.head_freeze_bn, axis_name=self.axis_name, dtype=self.dtype)
        else:
            self.box_head = CornerPredictor(
                channel=sp.head_dim, feat_sz=sp.search_size // 16, stride=16,
                freeze_bn=sp.head_freeze_bn, axis_name=self.axis_name, dtype=self.dtype)
        if self.with_score:
            self.score_branch = ScoreDecoder(num_heads=sp.num_heads,
                                             hidden_dim=sp.embed_dim[2],
                                             nlayer_head=sp.nlayer_head,
                                             dtype=self.dtype)

    def _head(self, s, train, run_score_head=False, template_feat=None,
              gt_bboxes=None):
        B = s.shape[0]
        box_xyxy = self.box_head(s, train=train)
        out = {"pred_boxes": box_xyxy_to_cxcywh(box_xyxy).reshape(B, 1, 4)}
        if run_score_head and self.with_score:
            search_box = gt_bboxes if gt_bboxes is not None else \
                jax.lax.stop_gradient(box_xyxy)
            out["pred_scores"] = self.score_branch(s, template_feat,
                                                   search_box.reshape(B, 4))
        return out

    def __call__(self, template, online_template, search, *unused,
                 run_score_head: bool = False, gt_bboxes=None,
                 deterministic: bool = True, train: bool = False):
        t, ot, s = self.backbone(template, online_template, search, deterministic)
        return self._head(s, train, run_score_head, template_feat=t,
                          gt_bboxes=gt_bboxes)

    def set_online(self, template, online_template, slot_mask=None):
        template_feat, mem, key_mask = self.backbone.set_online(
            template, online_template, slot_mask)
        if key_mask is None:
            n_t = template_feat.shape[1] * template_feat.shape[2]
            key_mask = jnp.ones((n_t * (1 + online_template.shape[0]),),
                                jnp.float32)
        return {"mem": mem, "template": template_feat, "key_mask": key_mask}

    def forward_test(self, search, cache, run_score_head: bool = False):
        s = self.backbone.forward_test(search, cache["mem"],
                                       cache.get("key_mask"))
        return self._head(s, False, run_score_head, template_feat=cache["template"])


def build_mixformer_convmae(cfg, with_score: bool = False, dtype=jnp.float32,
                            axis_name: Optional[str] = None) -> MixFormerConvMAE:
    """build_mixformer_convmae (mixformer.py:480) /
    build_mixformer_convmae_online_score (mixformer_online.py:506)."""
    return MixFormerConvMAE(spec=ConvMAESpec.from_cfg(cfg), with_score=with_score,
                            axis_name=axis_name, dtype=dtype)
