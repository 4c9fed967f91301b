"""Unimodal MixFormer model wrapper (ViT backbone + corner head [+ SPM]).

Parity targets: lib/models/mixformer_vit/mixformer.py MixFormer (:285-338)
and mixformer_online.py MixFormerOnlineScore (:286-363): forward produces
cxcywh boxes from the corner head over the search feature; forward_test
re-uses per-block cached template k/v; set_online builds that cache from
template + online-template ring buffer.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.vit import MixFormerViT
from multi_modal_tracking_tpu.models.score_decoder import ScoreDecoder
from multi_modal_tracking_tpu.models.asymmetric_shared import _build_head_from_spec, RGBTSpec
from multi_modal_tracking_tpu.ops.boxes import box_xyxy_to_cxcywh


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    search_size: int = 288
    template_size: int = 128
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    head_type: str = "CORNER"
    head_dim: int = 384
    head_freeze_bn: bool = False
    drop_path_rate: float = 0.1
    nlayer_head: int = 3

    @staticmethod
    def from_cfg(cfg) -> "ViTSpec":
        dims = dict(base_patch16=(768, 12, 12), large_patch16=(1024, 24, 16))[cfg.MODEL.VIT_TYPE]
        return ViTSpec(
            search_size=cfg.DATA.SEARCH.SIZE, template_size=cfg.DATA.TEMPLATE.SIZE,
            embed_dim=dims[0], depth=dims[1], num_heads=dims[2],
            head_type=cfg.MODEL.HEAD_TYPE, head_dim=cfg.MODEL.get("HEAD_DIM", 384),
            head_freeze_bn=cfg.MODEL.get("HEAD_FREEZE_BN", False),
            nlayer_head=cfg.MODEL.get("NLAYER_HEAD", 3))

    def as_rgbt(self) -> RGBTSpec:
        return RGBTSpec(search_size=self.search_size, template_size=self.template_size,
                        embed_dim=self.embed_dim, head_type=self.head_type,
                        head_dim=self.head_dim, head_freeze_bn=self.head_freeze_bn)


class MixFormer(nn.Module):
    """Unimodal tracker model: (t, ot, s) NHWC images -> pred boxes."""
    spec: ViTSpec
    with_score: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        sp = self.spec
        self.backbone = MixFormerViT(
            img_size_s=sp.search_size, img_size_t=sp.template_size,
            embed_dim=sp.embed_dim, depth=sp.depth, num_heads=sp.num_heads,
            drop_path_rate=sp.drop_path_rate, dtype=self.dtype)
        self.box_head = _build_head_from_spec(sp.as_rgbt(), axis_name=self.axis_name,
                                              dtype=self.dtype)
        if self.with_score:
            self.score_branch = ScoreDecoder(num_heads=sp.num_heads, hidden_dim=sp.embed_dim,
                                             nlayer_head=sp.nlayer_head, dtype=self.dtype)

    def _head(self, search_feat, train, run_score_head, template_feat=None, gt_bboxes=None):
        B = search_feat.shape[0]
        box_xyxy = self.box_head(search_feat, train=train)
        out = {"pred_boxes": box_xyxy_to_cxcywh(box_xyxy).reshape(B, 1, 4)}
        if run_score_head and self.with_score:
            search_box = gt_bboxes if gt_bboxes is not None else jax.lax.stop_gradient(box_xyxy)
            out["pred_scores"] = self.score_branch(search_feat, template_feat,
                                                   search_box.reshape(B, 4))
        return out

    def __call__(self, template, online_template, search, run_score_head: bool = False,
                 gt_bboxes=None, deterministic: bool = True, train: bool = False):
        t, ot, s = self.backbone(template, online_template, search, deterministic)
        return self._head(s, train, run_score_head, template_feat=t, gt_bboxes=gt_bboxes)

    def set_online(self, template, online_template, slot_mask=None):
        """Returns {"template": final template map, "mem": per-block k/v,
        "key_mask": live-token mask over cached template keys} (uniform
        cache contract across model families). slot_mask (n_ot,) {0,1}
        reproduces the reference's growing online-template buffer with
        static ring shapes (mixformer_cvt_online.py:152-168)."""
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


def build_mixformer_vit(cfg, with_score: bool = False, dtype=jnp.float32,
                        axis_name: Optional[str] = None) -> MixFormer:
    return MixFormer(spec=ViTSpec.from_cfg(cfg), with_score=with_score, dtype=dtype,
                     axis_name=axis_name)
