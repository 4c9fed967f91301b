"""MixFormer-CvT: multi-stage conv-ViT with Mixed Attention Modules (MAM).

Parity targets: lib/models/mixformer_cvt/mixformer.py —
  Attention (:75-254): depthwise-conv+BN q/k/v projections; k/v spatially
  strided (stride_kv=2 -> 1/4 tokens); asymmetric attention where template
  queries attend only to (strided) template keys and search queries attend
  to everything (:228-254). ConvEmbed (:393-425), per-stage VisionTransformer
  (:430-616), 3-stage ConvolutionalVisionTransformer (:610-686; spec from
  lib/config/mixformer_cvt_online/config.py:22-41), MixFormer wrapper +
  corner head (:713-775). QuickGELU activation and LayerNorm eps 1e-5
  (get_mixformer_model :688-693).
  mixformer_online.py — forward_test with cached template k/v (:282-326),
  multi-template set_online, MixFormerOnlineScore (:743-845).

TPU-first notes:
  * The online k/v cache stores POST-projection per-head tensors (the Dense
    proj_k/v commute with concatenation), so tracking-time search frames do
    template projection work exactly once per template update.
  * Cached state is an explicit pytree (list over stages of lists over
    blocks of (k, v)), threaded through jitted calls — no module state.
  * BN inside the conv projections supports FrozenBN (FREEZE_BN=True, the
    shipped config) as a pure affine; trainable BN uses flax BatchNorm with
    cross-replica axis sync standing in for the reference's SyncBN.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.layers import DropPath
from multi_modal_tracking_tpu.models.score_decoder import ScoreDecoder
from multi_modal_tracking_tpu.ops.boxes import (box_cxcywh_to_xyxy,
                                                 box_xyxy_to_cxcywh)


def quick_gelu(x):
    """x * sigmoid(1.702 x) (mixformer.py QuickGELU)."""
    return x * jax.nn.sigmoid(1.702 * x)


# shared attention helpers — single definition for every model family
from multi_modal_tracking_tpu.models.vit import _attend, _heads, _merge  # noqa: E402


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine (mixformer_cvt/utils.py
    FrozenBatchNorm2d): a constant per-channel affine at run time.

    All four leaves live in batch_stats, NOT params: the reference registers
    weight/bias/running_mean/running_var as buffers, so a frozen BN's affine
    must never receive gradients or AdamW weight decay during fine-tuning."""
    features: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.variable("batch_stats", "scale",
                              lambda: jnp.ones((self.features,), jnp.float32))
        bias = self.variable("batch_stats", "bias",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        inv = scale.value * jax.lax.rsqrt(var.value + self.epsilon)
        w = inv.astype(x.dtype)
        b = (bias.value - mean.value * inv).astype(x.dtype)
        return x * w + b


class ConvProj(nn.Module):
    """Depthwise conv + BN token projection ('dw_bn', mixformer.py:108-131).

    (B, H, W, C) -> (B, H'*W', C) with H' = ceil(H / stride)."""
    dim: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    freeze_bn: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dim, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    feature_group_count=self.dim, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        if self.freeze_bn:
            x = FrozenBatchNorm(self.dim, dtype=self.dtype, name="bn")(x, train)
        else:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.axis_name, name="bn")(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


class ConvEmbed(nn.Module):
    """Conv patch embedding + token LayerNorm (mixformer.py:393-425).
    Returns (B, H', W', C) feature map."""
    embed_dim: int
    patch_size: int = 7
    stride: int = 4
    padding: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    dtype=self.dtype, name="proj")(x)
        B, H, W, C = x.shape
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(
            x.reshape(B, H * W, C))
        return x.reshape(B, H, W, C)


class MAMAttention(nn.Module):
    """Mixed Attention Module (mixformer.py:75-254)."""
    dim: int
    num_heads: int
    qkv_bias: bool = True
    kernel: int = 3
    stride_q: int = 1
    stride_kv: int = 2
    padding_q: int = 1
    padding_kv: int = 1
    freeze_bn: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        mk = dict(dim=self.dim, kernel=self.kernel, freeze_bn=self.freeze_bn,
                  axis_name=self.axis_name, dtype=self.dtype)
        self.conv_proj_q = ConvProj(stride=self.stride_q, padding=self.padding_q, **mk)
        self.conv_proj_k = ConvProj(stride=self.stride_kv, padding=self.padding_kv, **mk)
        self.conv_proj_v = ConvProj(stride=self.stride_kv, padding=self.padding_kv, **mk)
        self.proj_q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype)
        self.proj_k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype)
        self.proj_v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype)
        self.proj = nn.Dense(self.dim, dtype=self.dtype)
        # CvT quirk: attention scales by the FULL dim, not head_dim
        # (mixformer_cvt/mixformer.py:80 `self.scale = dim_out ** -0.5`)
        self.scale = self.dim ** -0.5

    def _q(self, fmap, train):
        return _heads(self.proj_q(self.conv_proj_q(fmap, train)), self.num_heads)

    def _kv(self, fmap, train):
        k = _heads(self.proj_k(self.conv_proj_k(fmap, train)), self.num_heads)
        v = _heads(self.proj_v(self.conv_proj_v(fmap, train)), self.num_heads)
        return k, v

    def __call__(self, t, ot, s, train: bool = False):
        """t/ot/s: (B, h, w, C) maps. Returns (out_mt, out_s) token tensors
        with out_mt = (B, 2*t_h*t_w, C), out_s = (B, s_h*s_w, C)."""
        q_t, q_ot, q_s = self._q(t, train), self._q(ot, train), self._q(s, train)
        k_t, v_t = self._kv(t, train)
        k_ot, v_ot = self._kv(ot, train)
        k_s, v_s = self._kv(s, train)
        q_mt = jnp.concatenate([q_t, q_ot], axis=2)
        k_mt = jnp.concatenate([k_t, k_ot], axis=2)
        v_mt = jnp.concatenate([v_t, v_ot], axis=2)
        # template attention: templates attend to (strided) templates only
        x_mt = _attend(q_mt, k_mt, v_mt, self.scale)
        # search attention: full mixed keys
        k_all = jnp.concatenate([k_mt, k_s], axis=2)
        v_all = jnp.concatenate([v_mt, v_s], axis=2)
        x_s = _attend(q_s, k_all, v_all, self.scale)
        return self.proj(_merge(x_mt)), self.proj(_merge(x_s))

    @staticmethod
    def _template_key_mask(slot_mask, L_ts):
        """[t keys live ; per-slot strided spans gated by slot_mask]."""
        return jnp.concatenate(
            [jnp.ones((L_ts,), jnp.float32),
             jnp.repeat(slot_mask.astype(jnp.float32), L_ts)], axis=0)

    def set_online(self, t, ot, slot_mask=None):
        """t: (1, h, w, C); ot: (n, h, w, C) multi-template memory.
        Full self-attention over all templates; caches per-head k/v.
        slot_mask (n,) {0,1}: live ring slots — masked slots' strided keys
        are invisible (the reference's GROWING buffer, statically)."""
        q_t = self._q(t, False)
        n = ot.shape[0]
        q_ot = self._q(ot, False)                       # (n, H, L, D)
        q_ot = q_ot.transpose(1, 0, 2, 3).reshape(1, q_ot.shape[1], -1, q_ot.shape[3])
        k_t, v_t = self._kv(t, False)
        k_ot, v_ot = self._kv(ot, False)
        k_ot = k_ot.transpose(1, 0, 2, 3).reshape(1, k_ot.shape[1], -1, k_ot.shape[3])
        v_ot = v_ot.transpose(1, 0, 2, 3).reshape(1, v_ot.shape[1], -1, v_ot.shape[3])
        q = jnp.concatenate([q_t, q_ot], axis=2)
        k = jnp.concatenate([k_t, k_ot], axis=2)
        v = jnp.concatenate([v_t, v_ot], axis=2)
        key_mask = None
        if slot_mask is not None:
            key_mask = self._template_key_mask(slot_mask, k_t.shape[2])
        out = self.proj(_merge(_attend(q, k, v, self.scale, key_mask)))
        return out, (k, v)

    def forward_test(self, s, mem, slot_mask=None):
        q_s = self._q(s, False)
        k_s, v_s = self._kv(s, False)
        k_mem, v_mem = mem
        k = jnp.concatenate([k_mem.astype(k_s.dtype), k_s], axis=2)
        v = jnp.concatenate([v_mem.astype(v_s.dtype), v_s], axis=2)
        key_mask = None
        if slot_mask is not None:
            L_ts = k_mem.shape[2] // (1 + slot_mask.shape[0])
            key_mask = jnp.concatenate(
                [self._template_key_mask(slot_mask, L_ts),
                 jnp.ones((k_s.shape[2],), jnp.float32)], axis=0)
        return self.proj(_merge(_attend(q_s, k, v, self.scale, key_mask)))


class MAMBlock(nn.Module):
    """Pre-LN block around MAM attention (mixformer.py:329-390)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    stride_kv: int = 2
    freeze_bn: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.attn = MAMAttention(self.dim, self.num_heads, self.qkv_bias,
                                 stride_kv=self.stride_kv, freeze_bn=self.freeze_bn,
                                 axis_name=self.axis_name, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        # CvT MLP uses QuickGELU (get_mixformer_model :688)
        self.fc1 = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)
        self.fc2 = nn.Dense(self.dim, dtype=self.dtype)
        self.dp1 = DropPath(self.drop_path)
        self.dp2 = DropPath(self.drop_path)

    def _mlp(self, x):
        return self.fc2(quick_gelu(self.fc1(x)))

    def _split_maps(self, x, t_hw, s_hw):
        """tokens (B, 2*t+s, C) -> three (B, h, w, C) maps."""
        B, _, C = x.shape
        t_h = int(np.sqrt(t_hw))
        s_h = int(np.sqrt(s_hw))
        t = x[:, :t_hw].reshape(B, t_h, t_h, C)
        ot = x[:, t_hw:2 * t_hw].reshape(B, t_h, t_h, C)
        s = x[:, 2 * t_hw:].reshape(B, s_h, s_h, C)
        return t, ot, s

    def __call__(self, x, t_hw: int, s_hw: int, deterministic: bool = True,
                 train: bool = False):
        t, ot, s = self._split_maps(self.norm1(x), t_hw, s_hw)
        out_mt, out_s = self.attn(t, ot, s, train)
        x = x + self.dp1(jnp.concatenate([out_mt, out_s], axis=1), deterministic)
        x = x + self.dp2(self._mlp(self.norm2(x)), deterministic)
        return x

    def set_online(self, x, t_hw: int, slot_mask=None):
        B, N, C = x.shape
        t_h = int(np.sqrt(t_hw))
        xn = self.norm1(x)
        t = xn[:, :t_hw].reshape(1, t_h, t_h, C)
        ot = xn[:, t_hw:].reshape(-1, t_h, t_h, C)
        out, mem = self.attn.set_online(t, ot, slot_mask)
        x = x + out
        x = x + self._mlp(self.norm2(x))
        return x, mem

    def forward_test(self, x, s_hw: int, mem, slot_mask=None):
        B, N, C = x.shape
        s_h = int(np.sqrt(s_hw))
        s = self.norm1(x).reshape(B, s_h, s_h, C)
        x = x + self.attn.forward_test(s, mem, slot_mask)
        x = x + self._mlp(self.norm2(x))
        return x


class CvTStage(nn.Module):
    """One conv-ViT stage (mixformer.py VisionTransformer :430-616)."""
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int
    patch_stride: int
    patch_padding: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    stride_kv: int = 2
    freeze_bn: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.patch_embed = ConvEmbed(self.embed_dim, self.patch_size,
                                     self.patch_stride, self.patch_padding,
                                     dtype=self.dtype)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        self.blocks = [
            MAMBlock(self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                     drop_path=dpr[j], stride_kv=self.stride_kv,
                     freeze_bn=self.freeze_bn, axis_name=self.axis_name,
                     dtype=self.dtype, name=f"blocks_{j}")
            for j in range(self.depth)
        ]

    def __call__(self, t, ot, s, deterministic: bool = True, train: bool = False):
        t, ot, s = self.patch_embed(t), self.patch_embed(ot), self.patch_embed(s)
        B, t_h, t_w, C = t.shape
        s_h, s_w = s.shape[1:3]
        t_hw, s_hw = t_h * t_w, s_h * s_w
        x = jnp.concatenate([t.reshape(B, t_hw, C), ot.reshape(B, t_hw, C),
                             s.reshape(B, s_hw, C)], axis=1)
        for blk in self.blocks:
            x = blk(x, t_hw, s_hw, deterministic, train)
        t = x[:, :t_hw].reshape(B, t_h, t_w, C)
        ot = x[:, t_hw:2 * t_hw].reshape(B, t_h, t_w, C)
        s = x[:, 2 * t_hw:].reshape(B, s_h, s_w, C)
        return t, ot, s

    def set_online(self, t, ot, slot_mask=None):
        t, ot = self.patch_embed(t), self.patch_embed(ot)
        _, t_h, t_w, C = t.shape
        n = ot.shape[0]
        t_hw = t_h * t_w
        x = jnp.concatenate([t.reshape(1, t_hw, C),
                             ot.reshape(1, n * t_hw, C)], axis=1)
        mem = []
        for blk in self.blocks:
            x, m = blk.set_online(x, t_hw, slot_mask)
            mem.append(m)
        t = x[:, :t_hw].reshape(1, t_h, t_w, C)
        ot = x[:, t_hw:].reshape(n, t_h, t_w, C)
        return t, ot, mem

    def forward_test(self, s, mem, slot_mask=None):
        s = self.patch_embed(s)
        B, s_h, s_w, C = s.shape
        s_hw = s_h * s_w
        x = s.reshape(B, s_hw, C)
        for blk, m in zip(self.blocks, mem):
            x = blk.forward_test(x, s_hw, m, slot_mask)
        return x.reshape(B, s_h, s_w, C)


@dataclasses.dataclass(frozen=True)
class CvTSpec:
    search_size: int = 320
    template_size: int = 128
    num_stages: int = 3
    patch_size: Tuple[int, ...] = (7, 3, 3)
    patch_stride: Tuple[int, ...] = (4, 2, 2)
    patch_padding: Tuple[int, ...] = (2, 1, 1)
    dim_embed: Tuple[int, ...] = (64, 192, 384)
    num_heads: Tuple[int, ...] = (1, 3, 6)
    depth: Tuple[int, ...] = (1, 4, 16)
    mlp_ratio: Tuple[float, ...] = (4.0, 4.0, 4.0)
    qkv_bias: Tuple[bool, ...] = (True, True, True)
    drop_path_rate: Tuple[float, ...] = (0.0, 0.0, 0.1)
    stride_kv: Tuple[int, ...] = (2, 2, 2)
    freeze_bn: bool = True
    head_type: str = "CORNER"
    head_dim: int = 384
    head_freeze_bn: bool = False
    nlayer_head: int = 3

    @staticmethod
    def from_cfg(cfg) -> "CvTSpec":
        bb = cfg.MODEL.BACKBONE
        return CvTSpec(
            search_size=cfg.DATA.SEARCH.SIZE, template_size=cfg.DATA.TEMPLATE.SIZE,
            num_stages=bb.NUM_STAGES, patch_size=tuple(bb.PATCH_SIZE),
            patch_stride=tuple(bb.PATCH_STRIDE), patch_padding=tuple(bb.PATCH_PADDING),
            dim_embed=tuple(bb.DIM_EMBED), num_heads=tuple(bb.NUM_HEADS),
            depth=tuple(bb.DEPTH), mlp_ratio=tuple(float(r) for r in bb.MLP_RATIO),
            qkv_bias=tuple(bb.QKV_BIAS),
            drop_path_rate=tuple(float(r) for r in bb.DROP_PATH_RATE),
            stride_kv=tuple(bb.STRIDE_KV), freeze_bn=bb.FREEZE_BN,
            head_type=cfg.MODEL.HEAD_TYPE, head_dim=cfg.MODEL.HEAD_DIM,
            head_freeze_bn=cfg.MODEL.get("HEAD_FREEZE_BN", False),
            nlayer_head=cfg.MODEL.get("NLAYER_HEAD", 3))


class MixFormerCvT(nn.Module):
    """Multi-stage CvT backbone + corner head [+ SPM score branch].

    Interface matches the other model families: apply(variables, t, ot, s)
    -> {"pred_boxes": (B, 1, 4) cxcywh in [0,1]} (mixformer.py:713-763)."""
    spec: CvTSpec
    with_score: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        sp = self.spec
        self.stages = [
            CvTStage(embed_dim=sp.dim_embed[i], depth=sp.depth[i],
                     num_heads=sp.num_heads[i], patch_size=sp.patch_size[i],
                     patch_stride=sp.patch_stride[i], patch_padding=sp.patch_padding[i],
                     mlp_ratio=sp.mlp_ratio[i], qkv_bias=sp.qkv_bias[i],
                     drop_path_rate=sp.drop_path_rate[i], stride_kv=sp.stride_kv[i],
                     freeze_bn=sp.freeze_bn, axis_name=self.axis_name,
                     dtype=self.dtype, name=f"stage{i}")
            for i in range(sp.num_stages)
        ]
        total_stride = int(np.prod(sp.patch_stride))
        self.feat_sz = sp.search_size // total_stride
        self.box_head = build_box_head_cvt(sp, self.feat_sz, self.axis_name, self.dtype)
        if self.with_score:
            # num_heads = hidden_dim // 64 (mixformer_online.py:825)
            # named score_branch to match the reference checkpoint prefix
            # (mixformer_online.py state dict: score_branch.*) like every
            # other family — torch_convert maps score_branch.* here
            self.score_branch = ScoreDecoder(num_heads=max(1, sp.dim_embed[-1] // 64),
                                             hidden_dim=sp.dim_embed[-1],
                                             nlayer_head=sp.nlayer_head,
                                             pool_size=4, dtype=self.dtype)

    def __call__(self, template, online_template, search, *unused,
                 run_score_head: bool = False, gt_bboxes=None,
                 deterministic: bool = True, train: bool = False):
        t, ot, s = template, online_template, search
        for stage in self.stages:
            t, ot, s = stage(t, ot, s, deterministic, train)
        out = self._head(s, train)
        if self.with_score and run_score_head:
            boxes = gt_bboxes if gt_bboxes is not None else \
                jax.lax.stop_gradient(box_cxcywh_to_xyxy(out["pred_boxes"].reshape(-1, 4)))
            out["pred_scores"] = self.score_branch(s, t, boxes)
        return out

    def set_online(self, template, online_template, slot_mask=None):
        """template: (1, H, W, 3); online_template: (n, H, W, 3).
        slot_mask (n,) {0,1}: live ring slots — the static-shape stand-in
        for the reference's GROWING online buffer
        (mixformer_cvt_online.py:152-168).  Returns per-stage per-block
        (k, v) cache + final template map; the slot mask rides in the
        cache (strided k/v means per-stage key masks, derived per stage)."""
        t, ot = template, online_template
        if slot_mask is None:
            slot_mask = jnp.ones((online_template.shape[0],), jnp.float32)
        mems = []
        for stage in self.stages:
            t, ot, mem = stage.set_online(t, ot, slot_mask)
            mems.append(mem)
        return {"mem": mems, "template": t, "slot_mask": slot_mask}

    def forward_test(self, search, cache, run_score_head: bool = False):
        s = search
        slot_mask = cache.get("slot_mask")
        for stage, mem in zip(self.stages, cache["mem"]):
            s = stage.forward_test(s, mem, slot_mask)
        out = self._head(s, False)
        if self.with_score and run_score_head:
            boxes = jax.lax.stop_gradient(box_cxcywh_to_xyxy(out["pred_boxes"].reshape(-1, 4)))
            out["pred_scores"] = self.score_branch(s, cache["template"], boxes)
        return out

    def _head(self, s, train):
        B = s.shape[0]
        xyxy = self.box_head(s, train=train)
        coord = box_xyxy_to_cxcywh(xyxy).reshape(B, 1, 4)
        return {"pred_boxes": coord}


def build_box_head_cvt(spec: CvTSpec, feat_sz: int, axis_name, dtype):
    from multi_modal_tracking_tpu.models.heads import CornerPredictor
    return CornerPredictor(channel=spec.head_dim, feat_sz=feat_sz,
                           stride=16, freeze_bn=spec.head_freeze_bn,
                           axis_name=axis_name, dtype=dtype)


def build_mixformer_cvt(cfg, with_score: bool = False, dtype=jnp.float32,
                        axis_name: Optional[str] = None) -> MixFormerCvT:
    """build_mixformer_cvt (mixformer.py:766) / build_mixformer_cvt_online_score
    (mixformer_online.py:822)."""
    return MixFormerCvT(spec=CvTSpec.from_cfg(cfg), with_score=with_score,
                        axis_name=axis_name, dtype=dtype)
