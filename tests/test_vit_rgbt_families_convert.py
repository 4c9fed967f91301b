"""Full-model conversion parity for the NON-flagship vit_rgbt families:
two_stream (mixformer_vit_rgbt/mixformer.py:352-433), shared-LN
(mixformer_shared.py:387-470), unibackbone (mixformer_unibackbone.py:354-430).

Each reference model is rebuilt in torch with the REFERENCE's parameter
naming and forward semantics — plain mixed-attention ViT blocks
(mixformer.py:39-159; the shared family splits the bimodal batch through
per-modality LayerNorms, mixformer_shared.py:143-159), the shipped
Attention_Fusion_Bimodal_LNSpecific fusion (fusion_utils.py:243-279,
oracle reused from tests/test_fusion_lnspecific_convert) and the corner
head (mixformer_cvt/head.py:23-94, oracle reused from
tests/test_flagship_convert) — then its FULL state dict (including the
requires_grad=False pos_embed parameters a real .pth carries,
mixformer.py:215-216) is converted with strict=True and the flax model must
reproduce the oracle's boxes. This is the strict-load proof that a trained
reference checkpoint of any of the three families converts completely: no
skipped torch keys, no shape clashes, no flax params left at init.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tests.test_flagship_convert import (  # noqa: E402
    B, D_BB, GS, GT, HEAD_DIM, HEADS_BB, PATCH, S_SZ, T_SZ, _Head)
from tests.test_fusion_lnspecific_convert import _FusionLNSpecific  # noqa: E402

from multi_modal_tracking_tpu.models.asymmetric_shared import RGBTSpec  # noqa: E402
from multi_modal_tracking_tpu.models.vit_rgbt import (  # noqa: E402
    MixFormerViTRGBT, VitRGBTSpec)
from multi_modal_tracking_tpu.ops.pos_embed import get_2d_sincos_pos_embed  # noqa: E402
from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict  # noqa: E402

DEPTH = 2          # plain blocks; these families have no CE schedule
N_T, N_S = GT * GT, GS * GS


# ------------------------------------------------------------------ backbones

class _Attn(nn.Module):
    """Mixed asymmetric attention (mixformer.py:39-121): template rows
    attend to templates only, search rows attend to everything."""

    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(D_BB, D_BB * 3, bias=True)
        self.proj = nn.Linear(D_BB, D_BB)
        self.scale = (D_BB // HEADS_BB) ** -0.5

    def forward(self, x, n_mt):
        Bc, N, C = x.shape
        qkv = (self.qkv(x).reshape(Bc, N, 3, HEADS_BB, C // HEADS_BB)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv.unbind(0)
        q_mt, q_s = q[:, :, :n_mt], q[:, :, n_mt:]
        k_mt, v_mt = k[:, :, :n_mt], v[:, :, :n_mt]
        a = (q_mt @ k_mt.transpose(-2, -1) * self.scale).softmax(-1)
        x_mt = (a @ v_mt).transpose(1, 2).reshape(Bc, n_mt, C)
        a = (q_s @ k.transpose(-2, -1) * self.scale).softmax(-1)
        x_s = (a @ v).transpose(1, 2).reshape(Bc, N - n_mt, C)
        return self.proj(torch.cat([x_mt, x_s], dim=1))


class _Blk(nn.Module):
    """Block (mixformer.py:124-139) / Block_Shared (mixformer_shared.py:
    109-159): same attn+mlp weights, per-modality LNs when shared_ln."""

    def __init__(self, shared_ln: bool):
        super().__init__()
        self.shared_ln = shared_ln
        if shared_ln:
            self.norm1_v = nn.LayerNorm(D_BB, eps=1e-6)
            self.norm1_i = nn.LayerNorm(D_BB, eps=1e-6)
            self.norm2_v = nn.LayerNorm(D_BB, eps=1e-6)
            self.norm2_i = nn.LayerNorm(D_BB, eps=1e-6)
        else:
            self.norm1 = nn.LayerNorm(D_BB, eps=1e-6)
            self.norm2 = nn.LayerNorm(D_BB, eps=1e-6)
        self.attn = _Attn()
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(D_BB, D_BB * 4)
        self.mlp.fc2 = nn.Linear(D_BB * 4, D_BB)

    def _split_norm(self, x, nv, ni):
        half = x.shape[0] // 2
        return torch.cat([nv(x[:half]), ni(x[half:])], dim=0)

    def forward(self, x, n_mt):
        n1 = (self._split_norm(x, self.norm1_v, self.norm1_i)
              if self.shared_ln else self.norm1(x))
        x = x + self.attn(n1, n_mt)
        n2 = (self._split_norm(x, self.norm2_v, self.norm2_i)
              if self.shared_ln else self.norm2(x))
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(n2)))


class _TorchViT(nn.Module):
    """VisionTransformer (mixformer.py:163-260): patch embed + sincos pos
    embeds stored as requires_grad=False Parameters (so they appear in the
    checkpoint, :215-216) + mixed-attention blocks."""

    def __init__(self, shared_ln: bool = False):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, D_BB, PATCH, stride=PATCH)
        self.blocks = nn.ModuleList([_Blk(shared_ln) for _ in range(DEPTH)])
        pe = lambda g: torch.tensor(get_2d_sincos_pos_embed(D_BB, g),
                                    dtype=torch.float32)[None]
        self.pos_embed_t = nn.Parameter(pe(GT), requires_grad=False)
        self.pos_embed_s = nn.Parameter(pe(GS), requires_grad=False)

    def forward(self, t, ot, s):
        emb = lambda x, pe: (self.patch_embed.proj(x).flatten(2)
                             .transpose(1, 2) + pe)
        t = emb(t, self.pos_embed_t)
        ot = emb(ot, self.pos_embed_t)
        s = emb(s, self.pos_embed_s)
        x = torch.cat([t, ot, s], dim=1)
        for blk in self.blocks:
            x = blk(x, 2 * N_T)
        xs = x[:, 2 * N_T:].transpose(1, 2).reshape(x.shape[0], D_BB, GS, GS)
        return xs


# ---------------------------------------------------------------- full models

class _RGBT(nn.Module):
    """MixFormer_RGBT of each family (mixformer.py:352, mixformer_shared.py:
    387, mixformer_unibackbone.py:354): backbones -> LNSpecific fusion over
    the split search maps -> corner head, boxes as normalised cxcywh."""

    def __init__(self, variant: str):
        super().__init__()
        self.variant = variant
        if variant == "two_stream":
            self.backbone_v = _TorchViT()
            self.backbone_i = _TorchViT()
        else:
            self.backbone = _TorchViT(shared_ln=(variant == "shared"))
        self.fusion_vi = _FusionLNSpecific()
        self.box_head = _Head()

    def forward(self, template, online_template, search):
        if self.variant == "two_stream":
            s_v = self.backbone_v(template[0], online_template[0], search[0])
            s_i = self.backbone_i(template[1], online_template[1], search[1])
        else:
            t = torch.cat(template, dim=0)
            ot = torch.cat(online_template, dim=0)
            s = torch.cat(search, dim=0)
            s = self.backbone(t, ot, s)
            half = s.shape[0] // 2
            s_v, s_i = s[:half], s[half:]
        fused = self.fusion_vi(s_v.contiguous(), s_i.contiguous())
        xyxy = self.box_head(fused)
        cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
        cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
        return torch.stack([cx, cy, xyxy[:, 2] - xyxy[:, 0],
                            xyxy[:, 3] - xyxy[:, 1]], 1)


def _flax_model(variant: str) -> MixFormerViTRGBT:
    base = RGBTSpec(search_size=S_SZ, template_size=T_SZ, embed_dim=D_BB,
                    depth=DEPTH, num_heads=HEADS_BB, head_dim=HEAD_DIM,
                    fusion_class="Attention_Fusion_Bimodal_LNSpecific",
                    fusion_layers=2, drop_path_rate=0.0)
    return MixFormerViTRGBT(spec=VitRGBTSpec(base=base, variant=variant))


@pytest.fixture(scope="module", params=["two_stream", "shared", "unibackbone"])
def converted(request):
    variant = request.param
    torch.manual_seed(0)
    oracle = _RGBT(variant).eval()
    with torch.no_grad():   # exercise batch_stats conversion, not identity BN
        for m in oracle.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.5)

    model = _flax_model(variant)
    tz = jnp.zeros((2 * B, T_SZ, T_SZ, 3), jnp.float32)
    sz = jnp.zeros((2 * B, S_SZ, S_SZ, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), tz, tz, sz)

    # the real corner head keeps coord_x/coord_y as plain tensors, NOT
    # buffers (head.py:46-52), so they never appear in a reference .pth;
    # the shared _Head oracle registers them only for its own forward.
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()
          if k not in ("box_head.cx", "box_head.cy")}
    new_vars, report = convert_state_dict(sd, variables, strict=True,
                                          verbose=False)
    return variant, oracle, model, new_vars, report


def test_strict_full_checkpoint_load(converted):
    """The complete reference-named state dict — pos embeds and BN stats
    included — loads strict: nothing skipped, nothing missing."""
    variant, _, _, _, report = converted
    assert report["skipped"] == []
    assert report["shape_mismatch"] == []
    assert report["missing"] == []
    # the requires_grad=False pos embeds are the only deliberately-ignored keys
    n_bb = 2 if variant == "two_stream" else 1
    assert len(report.get("ignored", [])) == 2 * n_bb


def test_box_parity(converted):
    _, oracle, model, new_vars, _ = converted
    rng = np.random.default_rng(7)
    mk = lambda sz: rng.standard_normal((B, sz, sz, 3)).astype(np.float32)
    pairs = [(mk(T_SZ), mk(T_SZ)), (mk(T_SZ), mk(T_SZ)), (mk(S_SZ), mk(S_SZ))]
    as_torch = lambda a: torch.tensor(a).permute(0, 3, 1, 2)
    t_args = [[as_torch(v), as_torch(i)] for v, i in pairs]
    j_args = [jnp.asarray(np.concatenate([v, i], axis=0)) for v, i in pairs]

    with torch.no_grad():
        want = oracle(*t_args).numpy()
    got = np.asarray(model.apply(new_vars, *j_args)["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
