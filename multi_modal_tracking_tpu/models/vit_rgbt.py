"""Non-flagship RGB-T ViT model variants: two-stream, shared-LN, unibackbone.

Parity targets (lib/models/mixformer_vit_rgbt/):
  mixformer.py MixFormer_RGBT (:352-433) — TWO separate ViT backbones
  (backbone_v / backbone_i), each running standard asymmetric mixed attention
  on its own modality; deformable-attention fusion over the two search
  feature maps; corner head on the fused map. (+ mixformer_new.py /
  mixformer_online.py twins.)
  mixformer_shared.py (:52-159, :464) — ONE shared-weight ViT with
  modality-specific LayerNorms (norm1_v/i, norm2_v/i) but NO cross-modal
  attention: the two modalities ride the batch axis, are split for their
  per-modality LNs and re-concatenated for the shared attention/MLP weights.
  mixformer_unibackbone.py (:113-150, :231-261, :434) — fully
  modality-agnostic plain ViT (single shared LNs), modalities stacked on the
  batch dim, fusion applied to the split search features.

TPU-first: all three variants keep modalities on a leading batch axis so
every dense op is one big MXU matmul; the two-stream variant runs both
backbones as two calls of independent module instances (XLA overlaps them);
none of this introduces any dynamic shape.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.asymmetric_shared import (RGBTSpec,
                                                               _build_head_from_spec)
from multi_modal_tracking_tpu.models.fusion import build_fusion
from multi_modal_tracking_tpu.models.layers import Mlp, PatchEmbed, DropPath
from multi_modal_tracking_tpu.models.score_decoder import ScoreDecoder
from multi_modal_tracking_tpu.models.vit import MixedAttention, MixFormerViT
from multi_modal_tracking_tpu.ops.boxes import box_xyxy_to_cxcywh
from multi_modal_tracking_tpu.ops.pos_embed import get_2d_sincos_pos_embed


class SharedLNBlock(nn.Module):
    """Block with modality-specific LayerNorms but modality-independent
    attention (Block_Shared, mixformer_shared.py:143-159): split the bimodal
    batch, apply per-modality norms, re-concat for the shared attention and
    MLP weights."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)
        self.norm1_v = ln("norm1_v")
        self.norm1_i = ln("norm1_i")
        self.norm2_v = ln("norm2_v")
        self.norm2_i = ln("norm2_i")
        self.attn = MixedAttention(self.dim, self.num_heads, self.qkv_bias,
                                   dtype=self.dtype)
        self.mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)
        self.dp1 = DropPath(self.drop_path)
        self.dp2 = DropPath(self.drop_path)

    def __call__(self, x, n_mt: int, deterministic: bool = True):
        """x: (2B, N, C) with [:B]=RGB, [B:]=TIR."""
        B = x.shape[0] // 2
        n1 = jnp.concatenate([self.norm1_v(x[:B]), self.norm1_i(x[B:])], axis=0)
        x = x + self.dp1(self.attn(n1, n_mt), deterministic)
        n2 = jnp.concatenate([self.norm2_v(x[:B]), self.norm2_i(x[B:])], axis=0)
        x = x + self.dp2(self.mlp(n2), deterministic)
        return x


class SharedLNViT(nn.Module):
    """Shared-weight bimodal ViT without cross-modal attention
    (mixformer_shared.py VisionTransformer)."""
    img_size_s: int = 288
    img_size_t: int = 128
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        self.blocks = [
            SharedLNBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                          self.qkv_bias, drop_path=dpr[i], dtype=self.dtype,
                          name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.grid_size_s = self.img_size_s // self.patch_size
        self.grid_size_t = self.img_size_t // self.patch_size
        self.pos_embed_s = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, self.grid_size_s))[None]
        self.pos_embed_t = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, self.grid_size_t))[None]

    def __call__(self, x_t, x_ot, x_s, deterministic: bool = True):
        """(2B, H, W, 3) stacks -> (t, ot, s) maps of shape (2B, g, g, C)."""
        t = self.patch_embed(x_t) + self.pos_embed_t.astype(self.dtype)
        ot = self.patch_embed(x_ot) + self.pos_embed_t.astype(self.dtype)
        s = self.patch_embed(x_s) + self.pos_embed_s.astype(self.dtype)
        n_t, n_s = t.shape[1], s.shape[1]
        x = jnp.concatenate([t, ot, s], axis=1)
        for blk in self.blocks:
            x = blk(x, 2 * n_t, deterministic)
        B2 = x.shape[0]
        gt, gs = self.grid_size_t, self.grid_size_s
        t, ot, s = x[:, :n_t], x[:, n_t:2 * n_t], x[:, 2 * n_t:]
        return (t.reshape(B2, gt, gt, -1), ot.reshape(B2, gt, gt, -1),
                s.reshape(B2, gs, gs, -1))


@dataclasses.dataclass(frozen=True)
class VitRGBTSpec:
    base: RGBTSpec
    variant: str = "two_stream"        # two_stream | shared | unibackbone

    @staticmethod
    def from_cfg(cfg, variant: str) -> "VitRGBTSpec":
        return VitRGBTSpec(base=RGBTSpec.from_cfg(cfg), variant=variant)


class MixFormerViTRGBT(nn.Module):
    """RGB-T model with pluggable backbone topology + fusion + corner head.

    forward contract matches MixFormerRGBT: (t_vi, ot_vi, s_vi) bimodal
    stacks (2B, H, W, 3) -> {"pred_boxes": (B, 1, 4) cxcywh in [0,1]}.
    """
    spec: VitRGBTSpec
    with_score: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        sp = self.spec.base
        kw = dict(img_size_s=sp.search_size, img_size_t=sp.template_size,
                  embed_dim=sp.embed_dim, depth=sp.depth, num_heads=sp.num_heads,
                  drop_path_rate=sp.drop_path_rate, dtype=self.dtype)
        if self.spec.variant == "two_stream":
            self.backbone_v = MixFormerViT(**kw)
            self.backbone_i = MixFormerViT(**kw)
        elif self.spec.variant == "shared":
            self.backbone = SharedLNViT(**kw)
        elif self.spec.variant == "unibackbone":
            self.backbone = MixFormerViT(**kw)
        else:
            raise ValueError(self.spec.variant)
        self.fusion_vi = build_fusion(sp.fusion_class, sp.embed_dim, 512,
                                      sp.fusion_layers, dtype=self.dtype,
                                      axis_name=self.axis_name)
        self.box_head = _build_head_from_spec(sp, axis_name=self.axis_name,
                                              dtype=self.dtype)
        if self.with_score:
            self.score_branch = ScoreDecoder(num_heads=sp.num_heads,
                                             hidden_dim=sp.embed_dim,
                                             nlayer_head=sp.nlayer_head,
                                             dtype=self.dtype)

    def _backbone(self, t_vi, ot_vi, s_vi, deterministic):
        if self.spec.variant == "two_stream":
            B = t_vi.shape[0] // 2
            t_v, ot_v, s_v = self.backbone_v(t_vi[:B], ot_vi[:B], s_vi[:B],
                                             deterministic)
            t_i, ot_i, s_i = self.backbone_i(t_vi[B:], ot_vi[B:], s_vi[B:],
                                             deterministic)
            cat = lambda a, b: jnp.concatenate([a, b], axis=0)
            return cat(t_v, t_i), cat(ot_v, ot_i), cat(s_v, s_i)
        return self.backbone(t_vi, ot_vi, s_vi, deterministic)

    def __call__(self, t_vi, ot_vi, s_vi, ce_keep_rate=None,
                 use_ce_template_mask: bool = True, run_score_head: bool = False,
                 gt_bboxes: Optional[jax.Array] = None,
                 deterministic: bool = True, train: bool = False,
                 return_features: bool = False):
        del ce_keep_rate, use_ce_template_mask   # these variants have no CE
        t, ot, s = self._backbone(t_vi, ot_vi, s_vi, deterministic)
        B = s.shape[0] // 2
        s_v, s_i = s[:B], s[B:]
        fused = self.fusion_vi(s_v, s_i, deterministic, train=train)
        box_xyxy = self.box_head(fused, train=train)
        out = {"pred_boxes": box_xyxy_to_cxcywh(box_xyxy).reshape(B, 1, 4)}
        if run_score_head and self.with_score:
            search_box = gt_bboxes if gt_bboxes is not None else \
                jax.lax.stop_gradient(box_xyxy)
            template_feat = jnp.concatenate([t[:B], t[B:]], axis=2)
            out["pred_scores"] = self.score_branch(fused, template_feat,
                                                   search_box.reshape(B, 4))
        if return_features:
            out["search_v"], out["search_i"], out["search_fused"] = s_v, s_i, fused
        return out


def build_vit_rgbt(cfg, variant: str = "two_stream", with_score: bool = False,
                   dtype=jnp.float32, axis_name: Optional[str] = None) -> MixFormerViTRGBT:
    """Builders: build_mixformer_vit_rgbt (mixformer.py:435),
    build_mixformer_vit_rgbt_shared (mixformer_shared.py:464),
    build_mixformer_vit_rgbt_uni (mixformer_unibackbone.py:434)."""
    return MixFormerViTRGBT(spec=VitRGBTSpec.from_cfg(cfg, variant),
                            with_score=with_score, dtype=dtype, axis_name=axis_name)
