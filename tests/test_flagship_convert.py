"""Flagship RGBT checkpoint parity: a reference-exact PyTorch
asymmetric_shared_ce flagship (cross-modal CE attention, modality-specific
LayerNorms, Attention_Fusion_Bimodal_LNSpecific_2 deformable fusion, corner
head) is built with the REFERENCE's parameter naming, its state dict is
converted through utils/torch_convert, and the flax model must reproduce the
oracle's box outputs — for both the inference path (no CE mask, config keep
ratios; lib/test/tracker/asymmetric_shared_ce.py:90-98) and the training path
(CTR_POINT template mask + runtime ce_keep_rate;
lib/train/actors/mixformer_rgbt.py:67-80).

Oracle parity targets:
  lib/models/mixformer_vit_rgbt/asymmetric_shared_ce.py:49-101 (CE),
  :146-207 (Asym_Attention), :210-282 (CE_Block_Shared), :427-447 (recover)
  lib/models/mixformer_vit_rgbt/fusion_utils.py:321-353 (LNSpecific_2)
  deformable_attention/deformable_encoder_lnspecific.py (encoder)
  ops/modules/ms_deform_attn_bimodal.py:83-130 (bimodal MSDA; the
  grid_sample core below is the reference's own CUDA parity oracle,
  ops/functions/ms_deform_attn_func.py:41-61)
  lib/models/mixformer_cvt/head.py:23-94 (corner head)
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.models.asymmetric_shared import MixFormerRGBT, RGBTSpec
from multi_modal_tracking_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict, map_torch_key

# Small flagship geometry: template grid 7 is a CTR_POINT size (ce_utils.py:29),
# CE at blocks 1/3 mirrors the 3/6/9 schedule at depth 4.
D_BB, DEPTH, HEADS_BB = 64, 4, 4
T_SZ, S_SZ, PATCH = 112, 176, 16
GT, GS = T_SZ // PATCH, S_SZ // PATCH
N_T, N_S = GT * GT, GS * GS
CE_LOC, CE_KEEP = (1, 3), (0.7, 0.7)
D_F, F_LAYERS, F_HEADS, F_POINTS = 512, 2, 8, 4
HEAD_DIM = 64
B = 2


# --------------------------------------------------------------------- backbone

class _AsymAttn(nn.Module):
    """Asym_Attention (asymmetric_shared_ce.py:123-207)."""

    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(D_BB, D_BB * 3, bias=True)
        self.proj = nn.Linear(D_BB, D_BB)
        self.nh = HEADS_BB
        self.scale = (D_BB // HEADS_BB) ** -0.5

    def forward(self, x_v, x_i, n_mt, lens_s, return_attention=False):
        Bc, N, C = x_v.shape
        qkv = self.qkv(torch.cat([x_v, x_i], dim=0)).reshape(2 * Bc, N, 3, self.nh, C // self.nh)
        qkv_V, qkv_I = torch.split(qkv, [Bc, Bc], dim=0)
        qV, kV, vV = qkv_V.permute(2, 0, 3, 1, 4).unbind(0)
        qI, kI, vI = qkv_I.permute(2, 0, 3, 1, 4).unbind(0)

        q_mt_V, q_s_V = torch.split(qV, [n_mt, lens_s], dim=2)
        k_mt_V, k_s_V = torch.split(kV, [n_mt, lens_s], dim=2)
        v_mt_V, v_s_V = torch.split(vV, [n_mt, lens_s], dim=2)
        q_mt_I, q_s_I = torch.split(qI, [n_mt, lens_s], dim=2)
        k_mt_I, k_s_I = torch.split(kI, [n_mt, lens_s], dim=2)
        v_mt_I, v_s_I = torch.split(vI, [n_mt, lens_s], dim=2)

        k_mt = torch.cat([k_mt_V, k_mt_I], dim=2)
        v_mt = torch.cat([v_mt_V, v_mt_I], dim=2)

        def att(q, k, v):
            a = (q @ k.transpose(-2, -1)) * self.scale
            return a.softmax(dim=-1) @ v

        x_mt_V = att(q_mt_V, k_mt_V, v_mt_V).transpose(1, 2).reshape(Bc, n_mt, C)
        x_mt_I = att(q_mt_I, k_mt_I, v_mt_I).transpose(1, 2).reshape(Bc, n_mt, C)
        x_s_V = att(q_s_V, torch.cat([k_mt, k_s_V], dim=2),
                    torch.cat([v_mt, v_s_V], dim=2)).transpose(1, 2).reshape(Bc, lens_s, C)
        x_s_I = att(q_s_I, torch.cat([k_mt, k_s_I], dim=2),
                    torch.cat([v_mt, v_s_I], dim=2)).transpose(1, 2).reshape(Bc, lens_s, C)

        x = self.proj(torch.cat([torch.cat([x_mt_V, x_s_V], dim=1),
                                 torch.cat([x_mt_I, x_s_I], dim=1)], dim=0))
        x_V, x_I = torch.split(x, [Bc, Bc], dim=0)
        attn_t2s = None
        if return_attention:
            attn_t2s = (torch.cat([q_mt_V, q_mt_I], dim=2)
                        @ torch.cat([k_s_V, k_s_I], dim=2).transpose(-2, -1)) * self.scale
            attn_t2s = attn_t2s.softmax(dim=-1)
        return x_V, x_I, attn_t2s


def _get_token_from_attn(attn, tokens, lens_t, lens_keep, gidx):
    """asymmetric_shared_ce.py:22-46."""
    sorted_attn, indices = torch.sort(attn, dim=1, descending=True)
    topk_idx = indices[:, :lens_keep]
    non_topk_idx = indices[:, lens_keep:]
    keep_index = gidx.gather(dim=1, index=topk_idx)
    removed_index = gidx.gather(dim=1, index=non_topk_idx)
    tokens_t = tokens[:, :lens_t, :]
    tokens_s = tokens[:, lens_t:, :]
    Bc, L, C = tokens_s.shape
    attentive = tokens_s.gather(dim=1, index=topk_idx.unsqueeze(-1).expand(Bc, -1, C))
    return torch.cat([tokens_t, attentive], dim=1), keep_index, removed_index


def _candidate_elimination(attn, tok_v, tok_i, keep_ratio, g_v, g_i, box_mask_z):
    """asymmetric_shared_ce.py:49-101."""
    bs, hn, lens_mt_vi, lens_s_2 = attn.shape
    lens_s = lens_s_2 // 2
    lens_mt = lens_mt_vi // 2
    lens_keep = math.ceil(keep_ratio * lens_s)
    if lens_keep == lens_s:
        return tok_v, tok_i, g_v, g_i, None, None
    if box_mask_z is not None:
        m = box_mask_z.unsqueeze(1).unsqueeze(-1).expand(-1, hn, -1, lens_s_2)
        attn = attn[m].view(bs, hn, -1, lens_s_2).mean(dim=2).mean(dim=1)
    else:
        attn = attn.mean(dim=2).mean(dim=1)
    attn_v, attn_i = torch.split(attn, [lens_s, lens_s], dim=1)
    nv, kv, rv = _get_token_from_attn(attn_v, tok_v, lens_mt, lens_keep, g_v)
    ni, ki, ri = _get_token_from_attn(attn_i, tok_i, lens_mt, lens_keep, g_i)
    return nv, ni, kv, ki, rv, ri


class _Mlp(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(D_BB, D_BB * 4)
        self.fc2 = nn.Linear(D_BB * 4, D_BB)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _CEBlock(nn.Module):
    """CE_Block_Shared (asymmetric_shared_ce.py:210-282)."""

    def __init__(self, keep_ratio):
        super().__init__()
        ln = lambda: nn.LayerNorm(D_BB, eps=1e-6)
        self.norm1_v, self.norm1_i = ln(), ln()
        self.attn = _AsymAttn()
        self.norm2_v, self.norm2_i = ln(), ln()
        self.mlp = _Mlp()
        self.keep_ratio_search = keep_ratio

    def forward(self, x_v, x_i, n_mt, g_v, g_i, ce_template_mask, keep_ratio_search):
        exe_ce = self.keep_ratio_search < 1 and (keep_ratio_search is None or keep_ratio_search < 1)
        Bc = x_v.shape[0]
        x_vi = torch.cat([x_v, x_i], dim=0)
        lens_s = g_v.shape[1]
        a_v, a_i, attn_t2s = self.attn(self.norm1_v(x_v), self.norm1_i(x_i),
                                       n_mt, lens_s, exe_ce)
        x_vi = x_vi + torch.cat([a_v, a_i], dim=0)
        x_v, x_i = torch.split(x_vi, [Bc, Bc], dim=0)
        r_v = r_i = None
        if exe_ce:
            kr = self.keep_ratio_search if keep_ratio_search is None else keep_ratio_search
            x_v, x_i, g_v, g_i, r_v, r_i = _candidate_elimination(
                attn_t2s, x_v, x_i, kr, g_v, g_i, ce_template_mask)
        x_vi = torch.cat([x_v, x_i], dim=0)
        x_vi = x_vi + self.mlp(torch.cat([self.norm2_v(x_v), self.norm2_i(x_i)], dim=0))
        x_v, x_i = torch.split(x_vi, [Bc, Bc], dim=0)
        return x_v, x_i, g_v, g_i, r_v, r_i


class _PatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.proj = nn.Conv2d(3, D_BB, PATCH, stride=PATCH)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class _Backbone(nn.Module):
    """CE VisionTransformer (asymmetric_shared_ce.py:285-447)."""

    def __init__(self):
        super().__init__()
        self.patch_embed = _PatchEmbed()
        keeps = {loc: r for loc, r in zip(CE_LOC, CE_KEEP)}
        self.blocks = nn.ModuleList([_CEBlock(keeps.get(i, 1.0)) for i in range(DEPTH)])
        pe_t = get_2d_sincos_pos_embed(D_BB, GT)
        pe_s = get_2d_sincos_pos_embed(D_BB, GS)
        self.register_buffer("pos_embed_t", torch.tensor(pe_t, dtype=torch.float32)[None])
        self.register_buffer("pos_embed_s", torch.tensor(pe_s, dtype=torch.float32)[None])

    def forward(self, x_t, x_ot, x_s, ce_template_mask=None, ce_keep_rate=None):
        x_t = self.patch_embed(x_t) + self.pos_embed_t
        x_ot = self.patch_embed(x_ot) + self.pos_embed_t
        x_s = self.patch_embed(x_s) + self.pos_embed_s
        B2, N, C = x_s.shape
        x = torch.cat([x_t, x_ot, x_s], dim=1)
        Bc = B2 // 2
        x_v, x_i = torch.split(x, [Bc, Bc], dim=0)
        g_v = torch.arange(N, dtype=torch.float32).repeat(Bc, 1)
        g_i = g_v.clone()
        removed_v, removed_i = [], []
        n_mt = 2 * N_T
        for i, blk in enumerate(self.blocks):
            x_v, x_i, g_v, g_i, r_v, r_i = blk(x_v, x_i, n_mt, g_v, g_i,
                                               ce_template_mask, ce_keep_rate)
            if i in CE_LOC and r_v is not None:
                removed_v.append(r_v)
                removed_i.append(r_i)
        x_v = _recover(x_v, g_v, removed_v, N, n_mt)
        x_i = _recover(x_i, g_i, removed_i, N, n_mt)
        x = torch.cat([x_v, x_i], dim=0)
        t, ot, s = torch.split(x, [N_T, N_T, N], dim=1)
        to2d = lambda z, g: z.transpose(1, 2).reshape(B2, C, g, g)
        return to2d(t, GT), to2d(ot, GT), to2d(s, GS)


def _recover(x, gidx, removed, n_s, n_mt):
    """_recover_search (asymmetric_shared_ce.py:427-447)."""
    z, xs = x[:, :n_mt], x[:, n_mt:]
    if removed:
        Bc, C = xs.shape[0], xs.shape[2]
        removed_cat = torch.cat(removed, dim=1)
        pruned = n_s - xs.shape[1]
        xs = torch.cat([xs, torch.zeros(Bc, pruned, C)], dim=1)
        index_all = torch.cat([gidx, removed_cat], dim=1)
        xs = torch.zeros_like(xs).scatter_(
            1, index_all.unsqueeze(-1).expand(Bc, -1, C).to(torch.int64), xs)
    return torch.cat([z, xs], dim=1)


# ----------------------------------------------------------------------- fusion

def _msda_core(value, spatial_shapes, loc, weights):
    """ms_deform_attn_core_pytorch semantics (grid_sample bilinear,
    padding zeros, align_corners False)."""
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    vlist = value.split([h * w for h, w in spatial_shapes], dim=1)
    grids = 2 * loc - 1
    samples = []
    for lid, (H, W) in enumerate(spatial_shapes):
        v = vlist[lid].flatten(2).transpose(1, 2).reshape(N * M, D, H, W)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        samples.append(F.grid_sample(v, g, mode="bilinear",
                                     padding_mode="zeros", align_corners=False))
    w = weights.transpose(1, 2).reshape(N * M, 1, Lq, L * P)
    out = (torch.stack(samples, dim=-2).flatten(-2) * w).sum(-1).view(N, M * D, Lq)
    return out.transpose(1, 2).contiguous()


class _MSDABimodal(nn.Module):
    """MSDeformAttn_Bimodal (ms_deform_attn_bimodal.py:30-130)."""

    def __init__(self):
        super().__init__()
        self.sampling_offsets = nn.Linear(2 * D_F, F_HEADS * 2 * F_POINTS * 2)
        self.attention_weights = nn.Linear(2 * D_F, F_HEADS * 2 * F_POINTS)
        self.value_proj = nn.Linear(D_F, D_F)
        self.output_proj = nn.Linear(D_F, D_F)

    def forward(self, query, reference_points, src, spatial_shapes):
        N, Lq, _ = query.shape
        Lu = Lq // 2
        qb = torch.cat(torch.chunk(query, 2, 1), dim=2)
        value = self.value_proj(src).view(N, Lq, F_HEADS, D_F // F_HEADS)
        off = self.sampling_offsets(qb).view(N, Lu, F_HEADS, 2, F_POINTS, 2)
        off = torch.cat([off, off], dim=1)
        w = self.attention_weights(qb).view(N, Lu, F_HEADS, 2 * F_POINTS)
        w = torch.cat([w, w], dim=1)
        w = F.softmax(w, -1).view(N, Lq, F_HEADS, 2, F_POINTS)
        normalizer = torch.stack([spatial_shapes[..., 1], spatial_shapes[..., 0]], -1).float()
        loc = (reference_points[:, :, None, :, None, :]
               + off / normalizer[None, None, None, :, None, :])
        shapes = [(int(h), int(w_)) for h, w_ in spatial_shapes.tolist()]
        out = _msda_core(value, shapes, loc, w)
        return self.output_proj(out)


class _EncLayer(nn.Module):
    """DeformableTransformerEncoderLayer LN-specific
    (deformable_encoder_lnspecific.py:111-160)."""

    def __init__(self):
        super().__init__()
        self.self_attn = _MSDABimodal()
        self.norm1_v = nn.LayerNorm(D_F)
        self.norm1_i = nn.LayerNorm(D_F)
        self.linear1 = nn.Linear(D_F, 4 * D_F)
        self.linear2 = nn.Linear(4 * D_F, D_F)
        self.norm2_v = nn.LayerNorm(D_F)
        self.norm2_i = nn.LayerNorm(D_F)

    def forward(self, src, pos, ref, spatial_shapes):
        src2 = self.self_attn(src + pos, ref, src, spatial_shapes)
        src = src + src2
        sv, si = torch.chunk(src, 2, 1)
        src = torch.cat([self.norm1_v(sv), self.norm1_i(si)], dim=1)
        src2 = self.linear2(F.relu(self.linear1(src)))
        src = src + src2
        sv, si = torch.chunk(src, 2, 1)
        return torch.cat([self.norm2_v(sv), self.norm2_i(si)], dim=1)


def _sine_pos(x):
    """PositionEmbeddingSine(num_pos_feats=D_F//2, normalize=True)
    (position_encoding.py:18-57) on an all-valid map."""
    b, c, h, w = x.shape
    npf = D_F // 2
    not_mask = torch.ones(b, h, w)
    y = not_mask.cumsum(1)
    xx = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y = (y - 0.5) / (y[:, -1:, :] + eps) * scale
    xx = (xx - 0.5) / (xx[:, :, -1:] + eps) * scale
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / npf)
    px = xx[:, :, :, None] / dim_t
    py = y[:, :, :, None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=4).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=4).flatten(3)
    return torch.cat((py, px), dim=3).permute(0, 3, 1, 2)


class _Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.layers = nn.ModuleList([_EncLayer() for _ in range(F_LAYERS)])

    @staticmethod
    def reference_points(spatial_shapes):
        pts = []
        for (H, W) in spatial_shapes.tolist():
            ry, rx = torch.meshgrid(torch.linspace(0.5, H - 0.5, int(H)),
                                    torch.linspace(0.5, W - 0.5, int(W)), indexing="ij")
            pts.append(torch.stack((rx.reshape(-1) / W, ry.reshape(-1) / H), -1))
        ref = torch.cat(pts, 0)[None]
        return ref[:, :, None].expand(-1, -1, 2, -1)

    def forward(self, src, spatial_shapes, pos):
        ref = self.reference_points(spatial_shapes)
        for layer in self.layers:
            src = layer(src, pos, ref, spatial_shapes)
        return src


class _FusionAttention(nn.Module):
    """DeformableAttentionFusion_LNSpecific (deformable_encoder_lnspecific.py:23-108)."""

    def __init__(self):
        super().__init__()
        self.encoder = _Encoder()
        self.level_embed = nn.Parameter(torch.zeros(2, D_F))

    def forward(self, src_v, src_i):
        srcs = [src_v, src_i]
        flat, lvl_pos, shapes = [], [], []
        for lvl, src in enumerate(srcs):
            b, c, h, w = src.shape
            shapes.append((h, w))
            pe = _sine_pos(src).flatten(2).transpose(1, 2)
            lvl_pos.append(pe + self.level_embed[lvl].view(1, 1, -1))
            flat.append(src.flatten(2).transpose(1, 2))
        src = torch.cat(flat, 1)
        pos = torch.cat(lvl_pos, 1)
        spatial_shapes = torch.as_tensor(shapes, dtype=torch.long)
        return self.encoder(src, spatial_shapes, pos)


class _Fusion2(nn.Module):
    """Attention_Fusion_Bimodal_LNSpecific_2 (fusion_utils.py:321-353)."""

    def __init__(self):
        super().__init__()
        self.adjust_in = nn.Sequential(nn.Conv2d(D_BB, D_F, 1), nn.GroupNorm(32, D_F))
        self.fusion_attention = _FusionAttention()
        self.adjust_out = nn.Sequential(nn.Conv2d(D_F, D_BB, 1), nn.GroupNorm(32, D_BB))

    def forward(self, in_v, in_i):
        b, c, h, w = in_v.shape
        out = self.fusion_attention(self.adjust_in(in_v), self.adjust_in(in_i))
        out_v, out_i = torch.chunk(out, 2, 1)
        out = (out_v + out_i).permute(0, 2, 1).view(b, -1, h, w).contiguous()
        return self.adjust_out(out)


# ------------------------------------------------------------------------- head

def _conv_bn(cin, cout):
    return nn.Sequential(nn.Conv2d(cin, cout, 3, padding=1, bias=True),
                         nn.BatchNorm2d(cout), nn.ReLU())


class _Head(nn.Module):
    """Corner_Predictor naming (head.py:23-94)."""

    def __init__(self, inplanes=D_BB, ch=HEAD_DIM, feat_sz=GS, stride=PATCH):
        super().__init__()
        self.feat_sz, self.stride = feat_sz, stride
        for c in ("tl", "br"):
            setattr(self, f"conv1_{c}", _conv_bn(inplanes, ch))
            setattr(self, f"conv2_{c}", _conv_bn(ch, ch // 2))
            setattr(self, f"conv3_{c}", _conv_bn(ch // 2, ch // 4))
            setattr(self, f"conv4_{c}", _conv_bn(ch // 4, ch // 8))
            setattr(self, f"conv5_{c}", nn.Conv2d(ch // 8, 1, 1))
        idx = torch.arange(feat_sz).float() * stride
        self.register_buffer("cx", idx.repeat(feat_sz))
        self.register_buffer("cy", idx.repeat_interleave(feat_sz))

    def _one(self, x, c):
        for i in range(1, 6):
            x = getattr(self, f"conv{i}_{c}")(x)
        v = x.flatten(1).softmax(1)
        return (self.cx * v).sum(1), (self.cy * v).sum(1)

    def forward(self, x):
        x_tl, y_tl = self._one(x, "tl")
        x_br, y_br = self._one(x, "br")
        return torch.stack([x_tl, y_tl, x_br, y_br], 1) / (self.feat_sz * self.stride)


class _Flagship(nn.Module):
    """MixFormer_RGBT (asymmetric_shared_ce.py:544-624)."""

    def __init__(self):
        super().__init__()
        self.backbone = _Backbone()
        self.fusion_vi = _Fusion2()
        self.box_head = _Head()

    def forward(self, template, online_template, search,
                ce_template_mask=None, ce_keep_rate=None):
        t = torch.cat(template, dim=0)
        ot = torch.cat(online_template, dim=0)
        s = torch.cat(search, dim=0)
        t, ot, s = self.backbone(t, ot, s, ce_template_mask, ce_keep_rate)
        N = s.size(0) // 2
        s_v, s_i = torch.split(s, [N, N], dim=0)
        fused = self.fusion_vi(s_v.contiguous(), s_i.contiguous())
        xyxy = self.box_head(fused)
        cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
        cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
        return torch.stack([cx, cy, xyxy[:, 2] - xyxy[:, 0],
                            xyxy[:, 3] - xyxy[:, 1]], 1)


# ------------------------------------------------------------------------ tests

@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    oracle = _Flagship().eval()
    # randomise BN running stats so the conversion of batch_stats is exercised
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.5)

    spec = RGBTSpec(search_size=S_SZ, template_size=T_SZ, embed_dim=D_BB,
                    depth=DEPTH, num_heads=HEADS_BB, head_dim=HEAD_DIM,
                    fusion_layers=F_LAYERS, ce_loc=CE_LOC, ce_keep_ratio=CE_KEEP,
                    drop_path_rate=0.0)
    model = MixFormerRGBT(spec=spec)
    tz = jnp.zeros((2 * B, T_SZ, T_SZ, 3), jnp.float32)
    sz = jnp.zeros((2 * B, S_SZ, S_SZ, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), tz, tz, sz)

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    new_vars, report = convert_state_dict(sd, variables, verbose=False)
    return oracle, model, new_vars, report, sd


def test_every_oracle_key_maps(converted):
    _, _, _, report, sd = converted
    buffers = ("pos_embed", "cx", "cy", "num_batches_tracked")
    unmapped = [k for k in sd
                if map_torch_key(k) is None and not any(b in k for b in buffers)]
    assert unmapped == [], unmapped
    skipped = [k for k in report["skipped"] if not any(b in k for b in buffers)]
    assert skipped == [], skipped
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert report["missing"] == [], report["missing"]


def _inputs(seed):
    rng = np.random.default_rng(seed)
    mk = lambda sz: rng.standard_normal((B, sz, sz, 3)).astype(np.float32)
    t_v, t_i = mk(T_SZ), mk(T_SZ)
    ot_v, ot_i = mk(T_SZ), mk(T_SZ)
    s_v, s_i = mk(S_SZ), mk(S_SZ)
    as_torch = lambda a: torch.tensor(a).permute(0, 3, 1, 2)
    tpair = lambda v, i: [as_torch(v), as_torch(i)]
    jstack = lambda v, i: jnp.asarray(np.concatenate([v, i], axis=0))
    return ((tpair(t_v, t_i), tpair(ot_v, ot_i), tpair(s_v, s_i)),
            (jstack(t_v, t_i), jstack(ot_v, ot_i), jstack(s_v, s_i)))


def test_inference_path_parity(converted):
    """Test-time call: no CE mask, config keep ratios (tracker :90-98)."""
    oracle, model, new_vars, _, _ = converted
    (tt, tot, ts), (jt, jot, js) = _inputs(1)
    with torch.no_grad():
        want = oracle(tt, tot, ts).numpy()
    got = np.asarray(model.apply(new_vars, jt, jot, js, None,
                                 use_ce_template_mask=False)["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_training_path_parity(converted):
    """Train-time call: CTR_POINT template mask + runtime ce_keep_rate
    (actors/mixformer_rgbt.py:67-80, ce_utils.py generate_mask_cond)."""
    oracle, model, new_vars, _, _ = converted
    (tt, tot, ts), (jt, jot, js) = _inputs(2)
    mask = torch.zeros(B, GT, GT)
    mask[:, 3, 3] = 1      # CTR_POINT index for template grid 7 (ce_utils.py:29)
    mask = mask.flatten(1).bool().repeat(1, 4)
    for rate in (0.55, 0.8):
        with torch.no_grad():
            want = oracle(tt, tot, ts, ce_template_mask=mask,
                          ce_keep_rate=rate).numpy()
        got = np.asarray(model.apply(new_vars, jt, jot, js, rate,
                                     use_ce_template_mask=True)["pred_boxes"]).reshape(B, 4)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_no_ce_path_parity(converted):
    """keep rate 1.0 disables CE entirely in both implementations."""
    oracle, model, new_vars, _, _ = converted
    (tt, tot, ts), (jt, jot, js) = _inputs(3)
    with torch.no_grad():
        want = oracle(tt, tot, ts, ce_keep_rate=1.0).numpy()
    got = np.asarray(model.apply(new_vars, jt, jot, js, 1.0,
                                 use_ce_template_mask=False)["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
