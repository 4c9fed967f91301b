"""CvT and ConvMAE checkpoint parity: reference-exact PyTorch backbones
(+ corner heads) built with the REFERENCE's parameter naming, state dicts
converted through utils/torch_convert.map_torch_key, and the flax models must
reproduce the oracles' outputs.

Oracle parity targets:
  lib/models/mixformer_cvt/mixformer.py — ConvEmbed (:394-425), Attention
  with depthwise conv projections and the FULL-dim attention scale quirk
  (:80), asymmetric mixed attention (:221-254), Block (:329-390),
  ConvolutionalVisionTransformer stages (:610-686)
  lib/models/mixformer_cvt/utils.py FrozenBatchNorm2d (:54-57)
  lib/models/mixformer_cvt/head.py Corner_Predictor (:23-94) and
  Pyramid_Corner_Predictor / CORNER_UP (:98-160)
  lib/models/mixformer_convmae/mixformer.py — PatchEmbed (:36-50, LN eps
  1e-5), CBlock (:166-189, LN eps 1e-5), stage-3 Block (:135-163, LN eps
  1e-6), ConvViT forward (:296-345), patch_embed4 (:208)
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.models.cvt import CvTSpec, MixFormerCvT
from multi_modal_tracking_tpu.models.convmae import ConvMAESpec, MixFormerConvMAE
from multi_modal_tracking_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict

B = 2


class _FrozenBN2d(nn.Module):
    """mixformer_cvt/utils.py FrozenBatchNorm2d (buffers, eps 1e-5)."""

    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.ones(n))
        self.register_buffer("bias", torch.zeros(n))
        self.register_buffer("running_mean", torch.zeros(n))
        self.register_buffer("running_var", torch.ones(n))

    def forward(self, x):
        w = self.weight.reshape(1, -1, 1, 1)
        b = self.bias.reshape(1, -1, 1, 1)
        rv = self.running_var.reshape(1, -1, 1, 1)
        rm = self.running_mean.reshape(1, -1, 1, 1)
        scale = w * (rv + 1e-5).rsqrt()
        return x * scale + (b - rm * scale)


def _randomise_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (_FrozenBN2d, nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)
                if isinstance(m, nn.BatchNorm2d):
                    m.weight.normal_(1.0, 0.1)
                    m.bias.normal_(0, 0.05)
                else:
                    m.weight.normal_(1.0, 0.1)
                    m.bias.normal_(0, 0.05)


def _head_conv(ic, oc):
    """head.py conv(): Conv-FrozenBN-ReLU (freeze_bn=True path)."""
    return nn.Sequential(nn.Conv2d(ic, oc, 3, padding=1, bias=True),
                         _FrozenBN2d(oc), nn.ReLU(inplace=True))


def _soft_argmax(score_map, stride):
    b, _, f, _ = score_map.shape
    vec = score_map.view(b, f * f)
    prob = torch.softmax(vec, dim=1)
    idx = torch.arange(f * f, dtype=torch.float32)
    cx = (idx % f) * stride
    cy = (idx // f) * stride
    return (prob * cx).sum(1), (prob * cy).sum(1)


# =================================================================== CvT side

T_SZ_C, S_SZ_C = 32, 64
CVT_SPEC = CvTSpec(search_size=S_SZ_C, template_size=T_SZ_C, num_stages=2,
                   patch_size=(7, 3), patch_stride=(4, 2), patch_padding=(2, 1),
                   dim_embed=(16, 32), num_heads=(1, 2), depth=(1, 2),
                   mlp_ratio=(4.0, 4.0), qkv_bias=(True, True),
                   drop_path_rate=(0.0, 0.0), stride_kv=(2, 2), freeze_bn=True,
                   head_type="CORNER", head_dim=32, head_freeze_bn=True)


class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _CvTConvProj(nn.Module):
    """'dw_bn' projection (mixformer_cvt :117-129): depthwise conv + BN,
    tokens out."""

    def __init__(self, dim, stride):
        super().__init__()
        self.conv = nn.Conv2d(dim, dim, 3, padding=1, stride=stride,
                              bias=False, groups=dim)
        self.bn = _FrozenBN2d(dim)

    def forward(self, x):
        return self.bn(self.conv(x)).flatten(2).transpose(1, 2)


class _CvTAttention(nn.Module):
    """mixformer_cvt Attention (:56-254) with the dim_out**-0.5 scale."""

    def __init__(self, dim, num_heads, stride_kv):
        super().__init__()
        self.num_heads = num_heads
        self.scale = dim ** -0.5
        self.conv_proj_q = _CvTConvProj(dim, 1)
        self.conv_proj_k = _CvTConvProj(dim, stride_kv)
        self.conv_proj_v = _CvTConvProj(dim, stride_kv)
        self.proj_q = nn.Linear(dim, dim, bias=True)
        self.proj_k = nn.Linear(dim, dim, bias=True)
        self.proj_v = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, t_h, t_w, s_h, s_w):
        B, N, C = x.shape
        t, ot, s = torch.split(x, [t_h * t_w, t_h * t_w, s_h * s_w], dim=1)
        t = t.transpose(1, 2).reshape(B, C, t_h, t_w)
        ot = ot.transpose(1, 2).reshape(B, C, t_h, t_w)
        s = s.transpose(1, 2).reshape(B, C, s_h, s_w)
        q = torch.cat([self.conv_proj_q(p) for p in (t, ot, s)], dim=1)
        k = torch.cat([self.conv_proj_k(p) for p in (t, ot, s)], dim=1)
        v = torch.cat([self.conv_proj_v(p) for p in (t, ot, s)], dim=1)

        def heads(z):
            return z.reshape(B, -1, self.num_heads,
                             C // self.num_heads).transpose(1, 2)

        q, k, v = heads(self.proj_q(q)), heads(self.proj_k(k)), heads(self.proj_v(v))
        kv_t = ((t_h + 1) // 2) ** 2
        q_mt, q_s = torch.split(q, [t_h * t_w * 2, s_h * s_w], dim=2)
        k_mt, _ = torch.split(k, [kv_t * 2, k.shape[2] - kv_t * 2], dim=2)
        v_mt, _ = torch.split(v, [kv_t * 2, v.shape[2] - kv_t * 2], dim=2)

        a = torch.softmax(q_mt @ k_mt.transpose(-2, -1) * self.scale, dim=-1)
        x_mt = (a @ v_mt).transpose(1, 2).reshape(B, -1, C)
        a = torch.softmax(q_s @ k.transpose(-2, -1) * self.scale, dim=-1)
        x_s = (a @ v).transpose(1, 2).reshape(B, -1, C)
        return self.proj(torch.cat([x_mt, x_s], dim=1))


class _CvTMlp(nn.Module):
    def __init__(self, dim, ratio):
        super().__init__()
        self.fc1 = nn.Linear(dim, int(dim * ratio))
        self.fc2 = nn.Linear(int(dim * ratio), dim)
        self.act = _QuickGELU()

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _CvTBlock(nn.Module):
    def __init__(self, dim, num_heads, stride_kv):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _CvTAttention(dim, num_heads, stride_kv)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = _CvTMlp(dim, 4.0)

    def forward(self, x, t_h, t_w, s_h, s_w):
        x = x + self.attn(self.norm1(x), t_h, t_w, s_h, s_w)
        return x + self.mlp(self.norm2(x))


class _CvTStage(nn.Module):
    def __init__(self, dim, depth, num_heads, patch, stride, padding, stride_kv):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(self._in_dim(dim), dim, patch,
                                          stride=stride, padding=padding)
        self.patch_embed.norm = nn.LayerNorm(dim)
        self.blocks = nn.ModuleList(
            [_CvTBlock(dim, num_heads, stride_kv) for _ in range(depth)])

    @staticmethod
    def _in_dim(dim):
        i = CVT_SPEC.dim_embed.index(dim)
        return 3 if i == 0 else CVT_SPEC.dim_embed[i - 1]

    def _embed(self, x):
        x = self.patch_embed.proj(x)
        b, c, h, w = x.shape
        tok = self.patch_embed.norm(x.flatten(2).transpose(1, 2))
        return tok, h, w

    def forward(self, t, ot, s):
        t, t_h, t_w = self._embed(t)
        ot, _, _ = self._embed(ot)
        s, s_h, s_w = self._embed(s)
        x = torch.cat([t, ot, s], dim=1)
        for blk in self.blocks:
            x = blk(x, t_h, t_w, s_h, s_w)
        C = x.shape[-1]
        t, ot, s = torch.split(x, [t_h * t_w, t_h * t_w, s_h * s_w], dim=1)
        to2d = lambda z, h, w: z.transpose(1, 2).reshape(-1, C, h, w)
        return to2d(t, t_h, t_w), to2d(ot, t_h, t_w), to2d(s, s_h, s_w)


class _CornerHead(nn.Module):
    """head.py Corner_Predictor (:23-94), freeze_bn=True."""

    def __init__(self, inplanes, channel, feat_sz, stride):
        super().__init__()
        self.feat_sz, self.stride = feat_sz, stride
        for c in ("tl", "br"):
            setattr(self, f"conv1_{c}", _head_conv(inplanes, channel))
            setattr(self, f"conv2_{c}", _head_conv(channel, channel // 2))
            setattr(self, f"conv3_{c}", _head_conv(channel // 2, channel // 4))
            setattr(self, f"conv4_{c}", _head_conv(channel // 4, channel // 8))
            setattr(self, f"conv5_{c}", nn.Conv2d(channel // 8, 1, 1))

    def _tower(self, x, c):
        for i in range(1, 6):
            x = getattr(self, f"conv{i}_{c}")(x)
        return x

    def forward(self, x):
        tl = self._tower(x, "tl")
        br = self._tower(x, "br")
        img_sz = self.feat_sz * self.stride
        x_tl, y_tl = _soft_argmax(tl, self.stride)
        x_br, y_br = _soft_argmax(br, self.stride)
        return torch.stack([x_tl, y_tl, x_br, y_br], dim=1) / img_sz


class _CvTOracle(nn.Module):
    def __init__(self):
        super().__init__()
        sp = CVT_SPEC
        backbone = nn.Module()
        for i in range(sp.num_stages):
            setattr(backbone, f"stage{i}", _CvTStage(
                sp.dim_embed[i], sp.depth[i], sp.num_heads[i],
                sp.patch_size[i], sp.patch_stride[i], sp.patch_padding[i],
                sp.stride_kv[i]))
        self.backbone = backbone
        feat_sz = sp.search_size // int(np.prod(sp.patch_stride))
        self.box_head = _CornerHead(sp.dim_embed[-1], sp.head_dim, feat_sz, 16)

    def forward(self, t, ot, s):
        for i in range(CVT_SPEC.num_stages):
            t, ot, s = getattr(self.backbone, f"stage{i}")(t, ot, s)
        xyxy = self.box_head(s)
        cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
        cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
        return torch.stack([cx, cy, xyxy[:, 2] - xyxy[:, 0],
                            xyxy[:, 3] - xyxy[:, 1]], dim=1)


@pytest.fixture(scope="module")
def cvt_converted():
    torch.manual_seed(0)
    oracle = _CvTOracle().eval()
    _randomise_bn(oracle)
    model = MixFormerCvT(spec=CVT_SPEC)
    t = jnp.zeros((B, T_SZ_C, T_SZ_C, 3))
    s = jnp.zeros((B, S_SZ_C, S_SZ_C, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables, report = convert_state_dict(sd, variables, frozen_head_bn=True,
                                           strict=True, verbose=False)
    return oracle, model, variables, report


def test_cvt_every_key_maps(cvt_converted):
    _, _, _, report = cvt_converted
    assert report["shape_mismatch"] == []
    assert report["missing"] == [], report["missing"][:10]


def test_cvt_box_parity(cvt_converted):
    oracle, model, variables, _ = cvt_converted
    rng = np.random.default_rng(0)
    t = rng.standard_normal((B, T_SZ_C, T_SZ_C, 3)).astype(np.float32)
    ot = rng.standard_normal((B, T_SZ_C, T_SZ_C, 3)).astype(np.float32)
    s = rng.standard_normal((B, S_SZ_C, S_SZ_C, 3)).astype(np.float32)
    nchw = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
    with torch.no_grad():
        want = oracle(nchw(t), nchw(ot), nchw(s)).numpy()
    got = np.asarray(jax.jit(model.apply)(
        variables, jnp.asarray(t), jnp.asarray(ot),
        jnp.asarray(s))["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


# =============================================================== ConvMAE side

T_SZ_M, S_SZ_M = 32, 64
CM_SPEC = ConvMAESpec(search_size=S_SZ_M, template_size=T_SZ_M,
                      embed_dim=(16, 24, 32), depth=(1, 1, 2), num_heads=4,
                      head_type="CORNER_UP", head_dim=32, head_freeze_bn=True,
                      drop_path_rate=0.0)


class _CMPatchEmbed(nn.Module):
    """mixformer_convmae PatchEmbed (:36-50): LN eps 1e-5 + GELU."""

    def __init__(self, ic, oc, p):
        super().__init__()
        self.proj = nn.Conv2d(ic, oc, p, stride=p)
        self.norm = nn.LayerNorm(oc)

    def forward(self, x):
        x = self.proj(x)
        x = self.norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        return F.gelu(x)


class _CMCBlock(nn.Module):
    """mixformer_convmae CBlock (:166-189): LN eps 1e-5 hardcoded."""

    def __init__(self, dim, ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.conv1 = nn.Conv2d(dim, dim, 1)
        self.conv2 = nn.Conv2d(dim, dim, 1)
        self.attn = nn.Conv2d(dim, dim, 5, padding=2, groups=dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Conv2d(dim, int(dim * ratio), 1)
        self.mlp.fc2 = nn.Conv2d(int(dim * ratio), dim, 1)

    def _ln(self, norm, x):
        return norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

    def forward(self, x):
        x = x + self.conv2(self.attn(self.conv1(self._ln(self.norm1, x))))
        h = self._ln(self.norm2, x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))


class _CMAttention(nn.Module):
    """mixformer_convmae Attention (:53-95): asymmetric mixed attention."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, n_mt, n_s):
        Bq, N, C = x.shape
        qkv = self.qkv(x).reshape(Bq, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q_mt, q_s = torch.split(q, [n_mt, n_s], dim=2)
        k_mt, _ = torch.split(k, [n_mt, n_s], dim=2)
        v_mt, _ = torch.split(v, [n_mt, n_s], dim=2)
        a = torch.softmax(q_mt @ k_mt.transpose(-2, -1) * self.scale, dim=-1)
        x_mt = (a @ v_mt).transpose(1, 2).reshape(Bq, n_mt, C)
        a = torch.softmax(q_s @ k.transpose(-2, -1) * self.scale, dim=-1)
        x_s = (a @ v).transpose(1, 2).reshape(Bq, n_s, C)
        return self.proj(torch.cat([x_mt, x_s], dim=1))


class _CMBlock(nn.Module):
    """stage-3 Block (:135-163): LN eps 1e-6 via norm_layer."""

    def __init__(self, dim, num_heads, ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _CMAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * ratio))
        self.mlp.fc2 = nn.Linear(int(dim * ratio), dim)

    def forward(self, x, n_mt, n_s):
        x = x + self.attn(self.norm1(x), n_mt, n_s)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class _PyramidHead(nn.Module):
    """head.py Pyramid_Corner_Predictor (:98-160), freeze_bn=True."""

    def __init__(self, inplanes, channel, feat_sz, stride=4):
        super().__init__()
        self.feat_sz, self.stride = feat_sz, stride
        for c in ("tl", "br"):
            setattr(self, f"conv1_{c}", _head_conv(inplanes, channel))
            setattr(self, f"conv2_{c}", _head_conv(channel, channel // 2))
            setattr(self, f"conv3_{c}", _head_conv(channel // 2, channel // 4))
            setattr(self, f"conv4_{c}", _head_conv(channel // 4, channel // 8))
            setattr(self, f"conv5_{c}", nn.Conv2d(channel // 8, 1, 1))
            setattr(self, f"adjust1_{c}", _head_conv(inplanes, channel // 2))
            setattr(self, f"adjust2_{c}", _head_conv(inplanes, channel // 4))
            setattr(self, f"adjust3_{c}", nn.Sequential(
                _head_conv(channel // 2, channel // 4),
                _head_conv(channel // 4, channel // 8),
                _head_conv(channel // 8, 1)))
            setattr(self, f"adjust4_{c}", nn.Sequential(
                _head_conv(channel // 4, channel // 8),
                _head_conv(channel // 8, 1)))

    def _branch(self, x, c):
        g = lambda n: getattr(self, f"{n}_{c}")
        x_init = x
        x1 = g("conv1")(x)
        x2 = g("conv2")(x1)
        up1 = F.interpolate(g("adjust1")(x_init), scale_factor=2) \
            + F.interpolate(x2, scale_factor=2)
        x3 = g("conv3")(up1)
        up2 = F.interpolate(g("adjust2")(x_init), scale_factor=4) \
            + F.interpolate(x3, scale_factor=2)
        x4 = g("conv4")(up2)
        return (g("conv5")(x4)
                + F.interpolate(g("adjust3")(x2), scale_factor=4)
                + F.interpolate(g("adjust4")(x3), scale_factor=2))

    def forward(self, x):
        tl = self._branch(x, "tl")
        br = self._branch(x, "br")
        img_sz = self.feat_sz * self.stride
        x_tl, y_tl = _soft_argmax(tl, self.stride)
        x_br, y_br = _soft_argmax(br, self.stride)
        return torch.stack([x_tl, y_tl, x_br, y_br], dim=1) / img_sz


class _ConvMAEOracle(nn.Module):
    def __init__(self):
        super().__init__()
        sp = CM_SPEC
        d = sp.embed_dim
        bb = nn.Module()
        bb.patch_embed1 = _CMPatchEmbed(3, d[0], 4)
        bb.patch_embed2 = _CMPatchEmbed(d[0], d[1], 2)
        bb.patch_embed3 = _CMPatchEmbed(d[1], d[2], 2)
        bb.patch_embed4 = nn.Linear(d[2], d[2])
        bb.blocks1 = nn.ModuleList([_CMCBlock(d[0]) for _ in range(sp.depth[0])])
        bb.blocks2 = nn.ModuleList([_CMCBlock(d[1]) for _ in range(sp.depth[1])])
        bb.blocks3 = nn.ModuleList(
            [_CMBlock(d[2], sp.num_heads) for _ in range(sp.depth[2])])
        self.backbone = bb
        self.grid_t, self.grid_s = T_SZ_M // 16, S_SZ_M // 16
        # fixed sin-cos pos embeds, identical arrays to the flax model's
        self.pos_t = torch.from_numpy(np.asarray(
            get_2d_sincos_pos_embed(d[2], self.grid_t), np.float32))[None]
        self.pos_s = torch.from_numpy(np.asarray(
            get_2d_sincos_pos_embed(d[2], self.grid_s), np.float32))[None]
        self.box_head = _PyramidHead(d[2], sp.head_dim, S_SZ_M // 4)

    def _stages(self, x):
        bb = self.backbone
        x = bb.patch_embed1(x)
        for blk in bb.blocks1:
            x = blk(x)
        x = bb.patch_embed2(x)
        for blk in bb.blocks2:
            x = blk(x)
        x = bb.patch_embed3(x)
        return bb.patch_embed4(x.flatten(2).permute(0, 2, 1))

    def forward(self, t, ot, s):
        t = self._stages(t) + self.pos_t
        ot = self._stages(ot) + self.pos_t
        s = self._stages(s) + self.pos_s
        n_t, n_s = t.shape[1], s.shape[1]
        x = torch.cat([t, ot, s], dim=1)
        for blk in self.backbone.blocks3:
            x = blk(x, 2 * n_t, n_s)
        s = x[:, 2 * n_t:].transpose(1, 2).reshape(
            -1, x.shape[-1], self.grid_s, self.grid_s)
        xyxy = self.box_head(s)
        cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
        cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
        return torch.stack([cx, cy, xyxy[:, 2] - xyxy[:, 0],
                            xyxy[:, 3] - xyxy[:, 1]], dim=1)


@pytest.fixture(scope="module")
def convmae_converted():
    torch.manual_seed(1)
    oracle = _ConvMAEOracle().eval()
    _randomise_bn(oracle)
    model = MixFormerConvMAE(spec=CM_SPEC)
    t = jnp.zeros((B, T_SZ_M, T_SZ_M, 3))
    s = jnp.zeros((B, S_SZ_M, S_SZ_M, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables, report = convert_state_dict(sd, variables, frozen_head_bn=True,
                                           strict=True, verbose=False)
    return oracle, model, variables, report


def test_convmae_every_key_maps(convmae_converted):
    _, _, _, report = convmae_converted
    assert report["shape_mismatch"] == []
    assert report["missing"] == [], report["missing"][:10]


def test_convmae_box_parity(convmae_converted):
    oracle, model, variables, _ = convmae_converted
    rng = np.random.default_rng(3)
    t = rng.standard_normal((B, T_SZ_M, T_SZ_M, 3)).astype(np.float32)
    ot = rng.standard_normal((B, T_SZ_M, T_SZ_M, 3)).astype(np.float32)
    s = rng.standard_normal((B, S_SZ_M, S_SZ_M, 3)).astype(np.float32)
    nchw = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
    with torch.no_grad():
        want = oracle(nchw(t), nchw(ot), nchw(s)).numpy()
    got = np.asarray(jax.jit(model.apply)(
        variables, jnp.asarray(t), jnp.asarray(ot),
        jnp.asarray(s))["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


# ==================================================== bare pretrain dict load

def test_cvt_bare_pretrain_dict_loads(tmp_path, cvt_converted):
    """A raw CvT-21 ImageNet checkpoint (stage0.* keys, no backbone prefix,
    no envelope — mixformer_cvt/mixformer.py:697-708) warm-starts the
    backbone via load_variables."""
    from multi_modal_tracking_tpu.utils.checkpoint import load_variables
    oracle, model, variables, _ = cvt_converted
    bare = {k[len("backbone."):]: v for k, v in oracle.state_dict().items()
            if k.startswith("backbone.")}
    path = str(tmp_path / "CvT-21-384x384-IN-22k.pth")
    torch.save(bare, path)
    loaded = load_variables(path, variables)
    want = bare["stage0.patch_embed.proj.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["stage0"]["patch_embed"]["proj"]["kernel"]),
        want)


def test_convmae_bare_pretrain_dict_loads(tmp_path, convmae_converted):
    """A raw ConvMAE pretrain dict (blocks1/patch_embed1 keys + pos_embed
    junk — mixformer_convmae/mixformer.py:409-421) warm-starts the
    backbone via load_variables."""
    from multi_modal_tracking_tpu.utils.checkpoint import load_variables
    oracle, model, variables, _ = convmae_converted
    bare = {k[len("backbone."):]: v for k, v in oracle.state_dict().items()
            if k.startswith("backbone.")}
    bare["pos_embed"] = torch.zeros(1, 5, 16)     # dropped on load
    bare["mask_token"] = torch.zeros(1, 1, 16)
    path = str(tmp_path / "convmae_base.pth")
    torch.save(bare, path)
    loaded = load_variables(path, variables)
    want = bare["patch_embed1.proj.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["backbone"]["patch_embed1"]["proj"]["kernel"]),
        want)
