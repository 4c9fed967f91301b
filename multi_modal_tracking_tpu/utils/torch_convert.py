"""PyTorch reference checkpoint -> flax variables converter.

Parity targets (three warm-start paths, SURVEY §5 checkpoint/resume):
  * MAE/ViT backbone checkpoints with pos-embed filtering and the
    norm1->norm1_{v,i} LayerNorm duplication for the modality-specific-LN
    RGBT models (lib/models/mixformer_vit_rgbt/asymmetric_shared.py:307-333,
    asymmetric_shared_ce.py:515-541).
  * Full-model RGB(T)-pretrained checkpoints {"net": state_dict}
    (asymmetric_shared_ce.py:643-674; backbone->backbone_{v,i} duplication
    for the two-stream model, mixformer.py:447-460).
  * Stage-1 tracker -> stage-2 SPM warm start (strict=False load,
    base_trainer.py:230-272).

Layout transforms (torch -> flax):
  Linear  weight (out, in)         -> kernel (in, out)
  Conv2d  weight (O, I, kh, kw)    -> kernel (kh, kw, I, O)
  LayerNorm/BatchNorm weight       -> scale
  BN running_mean/var              -> batch_stats collection

Only numpy + flax needed at call time; torch is imported lazily just to
unpickle .pth/.pth.tar files.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a reference checkpoint into {torch_key: np.ndarray}.

    Accepts raw state dicts, {"net": sd} trainer checkpoints
    (base_trainer.py:115) and {"model": sd} MAE releases; strips
    "module." DDP prefixes.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("net", "model", "state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "numpy"):
            continue
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


# --------------------------------------------------------------------------
# key-level rewrites
# --------------------------------------------------------------------------

def expand_modality_lns(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """MAE warm start: duplicate every block LayerNorm into the _v/_i pair
    (asymmetric_shared.py:307-333) and drop pos-embeds/mask tokens."""
    out = {}
    for k, v in sd.items():
        if "pos_embed" in k or "mask_token" in k:
            continue
        m = re.search(r"\.(norm[12])\.(weight|bias)$", k)
        if m and re.search(r"(^|\.)blocks\.", k):
            for suffix in ("_v", "_i"):
                out[k.replace(f".{m.group(1)}.", f".{m.group(1)}{suffix}.")] = v
        else:
            out[k] = v
    return out


def expand_two_stream(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """RGB-pretrained -> two-stream: backbone.* duplicated into
    backbone_v/backbone_i (mixformer.py:447-460)."""
    out = {}
    for k, v in sd.items():
        if "pos_embed" in k or "mask_token" in k:
            continue
        if k.startswith("backbone."):
            out["backbone_v." + k[len("backbone."):]] = v
            out["backbone_i." + k[len("backbone."):]] = v
        else:
            out[k] = v
    return out


# --------------------------------------------------------------------------
# torch key -> (collection, flax path tuple, transform)
# --------------------------------------------------------------------------

def _linear(v):  # (out, in) -> (in, out)
    return np.ascontiguousarray(v.T)


def _conv(v):    # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0)))


_HEAD_CONV = re.compile(r"^conv([1-5])_(tl|br)(?:\.(\d))?\.(weight|bias|running_mean|running_var)$")
_HEAD_ADJ12 = re.compile(r"^adjust([12])_(tl|br)\.(\d)\.(weight|bias|running_mean|running_var)$")
_HEAD_ADJ34 = re.compile(r"^adjust([34])_(tl|br)\.(\d)\.(\d)\.(weight|bias|running_mean|running_var)$")


def _convbn_leaf(tower: str, stage: str, sub: str, leaf: str, frozen_bn: bool):
    """One conv(.0)/BN(.1) leaf of a ConvBNRelu tower stage
    (head.py conv(): Sequential(Conv2d, (Frozen)BatchNorm2d, ReLU))."""
    if sub == "0":                      # conv
        tf = _conv if leaf == "weight" else None
        return ("params", (tower, stage, "conv", "kernel" if leaf == "weight" else "bias"), tf)
    # BN (sequential index 1). Candidate list covers both flax layouts —
    # frozen (ConvBNRelu: bn_{scale,bias,mean,var} buffers at the stage
    # level, ALL in batch_stats since the reference keeps them as
    # non-trainable buffers) and regular (nn.BatchNorm "bn" submodule) —
    # and convert_state_dict picks whichever exists in the target model,
    # so the frozen_bn flag is only a tie-break hint, never load-bearing.
    del frozen_bn
    if leaf in ("weight", "bias"):
        name = "bn_scale" if leaf == "weight" else "bn_bias"
        sub = "scale" if leaf == "weight" else "bias"
        return [("batch_stats", (tower, stage, name), None),
                ("params", (tower, stage, "bn", sub), None)]
    name = "bn_mean" if leaf == "running_mean" else "bn_var"
    sub = "mean" if leaf == "running_mean" else "var"
    return [("batch_stats", (tower, stage, name), None),
            ("batch_stats", (tower, stage, "bn", sub), None)]


def _map_head_key(rest: str, frozen_bn: bool):
    """box_head.* keys of the CORNER tower (head.py:23-94) and the
    CORNER_UP pyramid adjust branches (head.py:98-160)."""
    m = _HEAD_CONV.match(rest)
    if m:
        idx, corner, sub, leaf = m.group(1), m.group(2), m.group(3), m.group(4)
        tower = f"tower_{corner}"
        if idx == "5":
            tf = _conv if leaf == "weight" else None
            return ("params", (tower, "conv5", "kernel" if leaf == "weight" else "bias"), tf)
        return _convbn_leaf(tower, f"conv{idx}", sub, leaf, frozen_bn)
    m = _HEAD_ADJ12.match(rest)
    if m:
        return _convbn_leaf(f"tower_{m.group(2)}", f"adjust{m.group(1)}",
                            m.group(3), m.group(4), frozen_bn)
    m = _HEAD_ADJ34.match(rest)
    if m:   # Sequential-of-conv(): adjust3_tl.{i}.{0|1} -> adjust3_{i}
        return _convbn_leaf(f"tower_{m.group(2)}",
                            f"adjust{m.group(1)}_{m.group(3)}",
                            m.group(4), m.group(5), frozen_bn)
    return None


def _map_block_key(rest: str):
    """blocks.N.* inside a ViT backbone (mixformer_vit/mixformer.py,
    asymmetric_shared.py — same member names)."""
    m = re.match(r"^blocks\.(\d+)\.(.+)$", rest)
    if not m:
        return None
    blk = f"blocks_{int(m.group(1))}"
    tail = m.group(2)
    ln = re.match(r"^(norm1|norm2|norm1_v|norm1_i|norm2_v|norm2_i)\.(weight|bias)$", tail)
    if ln:
        return ("params", (blk, ln.group(1), "scale" if ln.group(2) == "weight" else "bias"), None)
    at = re.match(r"^attn\.(qkv|proj)\.(weight|bias)$", tail)
    if at:
        tf = _linear if at.group(2) == "weight" else None
        return ("params", (blk, "attn", at.group(1),
                           "kernel" if at.group(2) == "weight" else "bias"), tf)
    mlp = re.match(r"^mlp\.(fc1|fc2)\.(weight|bias)$", tail)
    if mlp:
        tf = _linear if mlp.group(2) == "weight" else None
        return ("params", (blk, "mlp", mlp.group(1),
                           "kernel" if mlp.group(2) == "weight" else "bias"), tf)
    return None


def _map_cvt_key(rest: str):
    """stage{i}.* keys of the CvT backbone (mixformer_cvt/mixformer.py:
    ConvEmbed :394-425, Attention conv/linear projections :56-132, Block
    :329-390). ConvProj BNs (frozen or not) live at .../bn {scale,bias} +
    batch_stats {mean,var} on the flax side."""
    m = re.match(r"^stage(\d)\.(.+)$", rest)
    if not m:
        return None
    st, tail = f"stage{m.group(1)}", m.group(2)
    pe = re.match(r"^patch_embed\.(proj|norm)\.(weight|bias)$", tail)
    if pe:
        if pe.group(1) == "proj":
            tf = _conv if pe.group(2) == "weight" else None
            return ("params", (st, "patch_embed", "proj",
                               "kernel" if pe.group(2) == "weight" else "bias"), tf)
        return ("params", (st, "patch_embed", "norm",
                           "scale" if pe.group(2) == "weight" else "bias"), None)
    b = re.match(r"^blocks\.(\d+)\.(.+)$", tail)
    if not b:
        return None
    blk, t2 = f"blocks_{int(b.group(1))}", b.group(2)
    ln = re.match(r"^(norm[12])\.(weight|bias)$", t2)
    if ln:
        return ("params", (st, blk, ln.group(1),
                           "scale" if ln.group(2) == "weight" else "bias"), None)
    cp = re.match(r"^attn\.conv_proj_([qkv])\.conv\.weight$", t2)
    if cp:
        return ("params", (st, blk, "attn", f"conv_proj_{cp.group(1)}",
                           "conv", "kernel"), _conv)
    cb = re.match(r"^attn\.conv_proj_([qkv])\.bn\.(weight|bias|running_mean|running_var)$", t2)
    if cb:
        return _bn_leaf((st, blk, "attn", f"conv_proj_{cb.group(1)}", "bn"),
                        cb.group(2))
    pq = re.match(r"^attn\.(proj_q|proj_k|proj_v|proj)\.(weight|bias)$", t2)
    if pq:
        tf = _linear if pq.group(2) == "weight" else None
        return ("params", (st, blk, "attn", pq.group(1),
                           "kernel" if pq.group(2) == "weight" else "bias"), tf)
    ml = re.match(r"^mlp\.(fc[12])\.(weight|bias)$", t2)
    if ml:   # flax MAMBlock holds fc1/fc2 directly
        tf = _linear if ml.group(2) == "weight" else None
        return ("params", (st, blk, ml.group(1),
                           "kernel" if ml.group(2) == "weight" else "bias"), tf)
    return None


def _map_convmae_key(rest: str):
    """ConvMAE backbone keys (mixformer_convmae/mixformer.py: PatchEmbed
    :36-50, CBlock :166-189, stage-3 Block :135-163, patch_embed4 Linear
    :208). The final unused `norm` (:228) is intentionally unmapped."""
    m = re.match(r"^patch_embed([123])\.(proj|norm)\.(weight|bias)$", rest)
    if m:
        pe = f"patch_embed{m.group(1)}"
        if m.group(2) == "proj":
            tf = _conv if m.group(3) == "weight" else None
            return ("params", (pe, "proj",
                               "kernel" if m.group(3) == "weight" else "bias"), tf)
        return ("params", (pe, "norm",
                           "scale" if m.group(3) == "weight" else "bias"), None)
    m = re.match(r"^patch_embed4\.(weight|bias)$", rest)
    if m:
        tf = _linear if m.group(1) == "weight" else None
        return ("params", ("patch_embed4",
                           "kernel" if m.group(1) == "weight" else "bias"), tf)
    m = re.match(r"^blocks([12])\.(\d+)\.(.+)$", rest)
    if m:
        blk, t2 = f"blocks{m.group(1)}_{int(m.group(2))}", m.group(3)
        ln = re.match(r"^(norm[12])\.(weight|bias)$", t2)
        if ln:
            return ("params", (blk, ln.group(1),
                               "scale" if ln.group(2) == "weight" else "bias"), None)
        cv = re.match(r"^(conv1|conv2|attn)\.(weight|bias)$", t2)
        if cv:
            tf = _conv if cv.group(2) == "weight" else None
            return ("params", (blk, cv.group(1),
                               "kernel" if cv.group(2) == "weight" else "bias"), tf)
        ml = re.match(r"^mlp\.(fc[12])\.(weight|bias)$", t2)
        if ml:   # CMlp 1x1 convs -> flax mlp_fc1/mlp_fc2 convs
            tf = _conv if ml.group(2) == "weight" else None
            return ("params", (blk, f"mlp_{ml.group(1)}",
                               "kernel" if ml.group(2) == "weight" else "bias"), tf)
        return None
    m = re.match(r"^blocks3\.(\d+)\.(.+)$", rest)
    if m:
        r = _map_block_key(f"blocks.{m.group(1)}.{m.group(2)}")
        if r:
            return (r[0], (f"blocks3_{int(m.group(1))}",) + r[1][1:], r[2])
        return None
    return None


def _map_score_key(rest: str):
    """score_branch.* (score_decoder.py:12-31)."""
    if rest == "score_token":
        return ("params", ("score_token",), None)
    m = re.match(r"^(proj_q|proj_k|proj_v|proj)\.(\d)\.(weight|bias)$", rest)
    if m:
        tf = _linear if m.group(3) == "weight" else None
        return ("params", (f"{m.group(1)}_{m.group(2)}",
                           "kernel" if m.group(3) == "weight" else "bias"), tf)
    m = re.match(r"^norm1\.(weight|bias)$", rest)
    if m:
        return ("params", ("norm1", "scale" if m.group(1) == "weight" else "bias"), None)
    m = re.match(r"^norm2\.(\d)\.(weight|bias)$", rest)
    if m:
        return ("params", (f"norm2_{m.group(1)}",
                           "scale" if m.group(2) == "weight" else "bias"), None)
    m = re.match(r"^score_head\.layers\.(\d)\.(weight|bias)$", rest)
    if m:
        tf = _linear if m.group(2) == "weight" else None
        return ("params", ("score_head", f"layers_{m.group(1)}",
                           "kernel" if m.group(2) == "weight" else "bias"), tf)
    return None


_GN_ADJUST = re.compile(r"^(adjust_(?:in|out|v|i|cat|sum))\.([01])\.(weight|bias)$")
_CONV_FUSION = re.compile(r"^(fusion[123]?)(_bn)?\.(weight|bias|running_mean|running_var)$")


def _map_fusion_key(rest: str):
    """fusion_vi.* keys of the fusion zoo (fusion_utils.py:8-353,
    deformable_encoder(_lnspecific).py). Returns one candidate or a list of
    candidates (first whose path exists in the target tree wins — needed
    because e.g. `fusion.weight` is a plain conv in RGBT_Fusion_1 but the
    deformable-conv kernel in RGBT_Fusion_3)."""
    m = _GN_ADJUST.match(rest)
    if m:
        adj, idx, leaf = m.group(1), m.group(2), m.group(3)
        if idx == "0":
            tf = _conv if leaf == "weight" else None
            return ("params", (adj, "conv", "kernel" if leaf == "weight" else "bias"), tf)
        return ("params", (adj, "gn", "scale" if leaf == "weight" else "bias"), None)
    if rest == "fusion_attention.level_embed":
        return ("params", ("fusion_attention", "level_embed"), None)
    m = re.match(r"^fusion_attention\.encoder\.layers\.(\d+)\.(.+)$", rest)
    if m:
        layer, tail = f"layers_{int(m.group(1))}", m.group(2)
        a = re.match(r"^self_attn\.(sampling_offsets|attention_weights|value_proj"
                     r"|output_proj)\.(weight|bias)$", tail)
        if a:
            tf = _linear if a.group(2) == "weight" else None
            return ("params", ("fusion_attention", layer, "self_attn", a.group(1),
                               "kernel" if a.group(2) == "weight" else "bias"), tf)
        ln = re.match(r"^(norm[12])(_v|_i)?\.(weight|bias)$", tail)
        if ln:
            sub = {"_v": "norm_v", "_i": "norm_i", None: "norm"}[ln.group(2)]
            return ("params", ("fusion_attention", layer, ln.group(1), sub,
                               "scale" if ln.group(3) == "weight" else "bias"), None)
        lin = re.match(r"^(linear[12])\.(weight|bias)$", tail)
        if lin:
            tf = _linear if lin.group(2) == "weight" else None
            return ("params", ("fusion_attention", layer, lin.group(1),
                               "kernel" if lin.group(2) == "weight" else "bias"), tf)
        return None
    # Conv-fusion families (RGBT_Fusion_1/2/3, RGBT_Fusion_Cat): conv + BN
    # pairs; the RGBT_Fusion_3 Pack predicts offsets via fusion.conv_offset.
    if rest.startswith("fusion.conv_offset."):
        leaf = rest.rsplit(".", 1)[1]
        tf = _conv if leaf == "weight" else None
        return ("params", ("fusion_offset", "kernel" if leaf == "weight" else "bias"), tf)
    m = re.match(r"^fusion_offset\.(weight|bias)$", rest)
    if m:
        tf = _conv if m.group(1) == "weight" else None
        return ("params", ("fusion_offset", "kernel" if m.group(1) == "weight" else "bias"), tf)
    m = _CONV_FUSION.match(rest)
    if m:
        base, is_bn, leaf = m.group(1), m.group(2), m.group(3)
        if is_bn:
            if leaf in ("weight", "bias"):
                return ("params", (f"{base}_bn", "scale" if leaf == "weight" else "bias"), None)
            return ("batch_stats", (f"{base}_bn",
                                    "mean" if leaf == "running_mean" else "var"), None)
        tf = _conv if leaf == "weight" else None
        name = "kernel" if leaf == "weight" else "bias"
        # RGBT_Fusion_1/Cat plain conv vs RGBT_Fusion_2/3 deform-conv kernel
        return [("params", (base, name), tf), ("params", (f"{base}_kernel",), tf)]
    return None


def map_torch_key(key: str, frozen_head_bn: bool = False):
    """One torch key -> (collection, flax path, transform), a list of such
    candidates, or None."""
    if "pos_embed" in key or "mask_token" in key or key.endswith("num_batches_tracked"):
        # deliberately absent twins: pos embeds are fixed sincos recomputed at
        # setup (mixformer.py:215-229 stores them as requires_grad=False
        # Parameters, so they DO appear in real checkpoints); IGNORE keeps
        # strict=True loads of full reference .pth files clean.
        return IGNORE
    for bb in ("backbone_v", "backbone_i", "backbone"):
        if key.startswith(bb + "."):
            rest = key[len(bb) + 1:]
            if rest.startswith("patch_embed.proj."):
                leaf = rest.rsplit(".", 1)[1]
                tf = _conv if leaf == "weight" else None
                return ("params", (bb, "patch_embed", "proj",
                                   "kernel" if leaf == "weight" else "bias"), tf)
            r = _map_block_key(rest) or _map_cvt_key(rest) or _map_convmae_key(rest)
            if r:
                # flax MixFormerCvT holds stage{i} at the top level (no
                # backbone submodule); the ViT/ConvMAE families nest under
                # `backbone`. Offer both paths; the first that exists wins.
                cands = r if isinstance(r, list) else [r]
                return ([(c, (bb,) + p, t) for c, p, t in cands]
                        + [(c, p, t) for c, p, t in cands])
            return None
    if key.startswith("box_head."):
        r = _map_head_key(key[len("box_head."):], frozen_head_bn)
        if isinstance(r, list):
            return [(c, ("box_head",) + p, t) for c, p, t in r]
        if r:
            return _prefix_map(("box_head",), r)
        return None
    if key.startswith("fusion_vi."):
        r = _map_fusion_key(key[len("fusion_vi."):])
        if isinstance(r, list):
            return [(c[0], ("fusion_vi",) + c[1], c[2]) for c in r]
        if r:
            return _prefix_map(("fusion_vi",), r)
        return None
    if key.startswith("score_branch."):
        r = _map_score_key(key[len("score_branch."):])
        if r:
            return _prefix_map(("score_branch",), r)
        return None
    return None


# --------------------------------------------------------------------------
# torchvision ResNet / Alpha-Refine (external/AR) families
# --------------------------------------------------------------------------

def _squeeze_1x1(v):  # (O, I, 1, 1) conv used as a Dense -> kernel (I, O)
    return np.ascontiguousarray(v[:, :, 0, 0].T)


def _bn_leaf(prefix: tuple, leaf: str):
    """BatchNorm leaves. weight/bias get candidates for both flax layouts —
    FrozenBatchNorm keeps scale/bias in batch_stats (reference
    FrozenBatchNorm2d registers them as buffers, never trained), regular
    nn.BatchNorm keeps them in params — and convert_state_dict's existence
    check picks whichever the target model actually has. running_mean/var
    are batch_stats mean/var in both layouts."""
    name = {"weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var"}[leaf]
    if leaf in ("weight", "bias"):
        return [("batch_stats", prefix + (name,), None),
                ("params", prefix + (name,), None)]
    return ("batch_stats", prefix + (name,), None)


def _prefix_map(pre: tuple, r):
    """Prefix a mapper result's flax path(s); handles tuple, candidate list,
    None and IGNORE."""
    if r is None or r is IGNORE:
        return r
    if isinstance(r, list):
        return [(c, pre + p, t) for c, p, t in r]
    return (r[0], pre + r[1], r[2])


#: Sentinel for keys that are INTENTIONALLY absent from the flax model
#: (e.g. the torchvision classification head): strict conversion accepts
#: them silently instead of raising like it does for unknown keys.
IGNORE = "ignore"


def map_resnet_key(rest: str):
    """torchvision/resnet_seg state-dict key -> flax ResNet path
    (models/resnet.py; external/AR/ltr/models/backbone/resnet_seg.py)."""
    if re.match(r"^fc\.(weight|bias)$", rest):
        return IGNORE   # classification head intentionally unmapped
    m = re.match(r"^conv1\.(weight)$", rest)
    if m:
        return ("params", ("conv1", "kernel"), _conv)
    m = re.match(r"^bn1\.(weight|bias|running_mean|running_var)$", rest)
    if m:
        return _bn_leaf(("bn1",), m.group(1))
    m = re.match(r"^layer(\d)\.(\d+)\.(.+)$", rest)
    if not m:
        return None   # fc.* (classification head) intentionally unmapped
    blk, tail = f"layer{m.group(1)}_{int(m.group(2))}", m.group(3)
    c = re.match(r"^conv(\d)\.weight$", tail)
    if c:
        return ("params", (blk, f"conv{c.group(1)}", "kernel"), _conv)
    b = re.match(r"^bn(\d)\.(weight|bias|running_mean|running_var)$", tail)
    if b:
        return _bn_leaf((blk, f"bn{b.group(1)}"), b.group(2))
    d = re.match(r"^downsample\.0\.weight$", tail)
    if d:
        return ("params", (blk, "down_conv", "kernel"), _conv)
    d = re.match(r"^downsample\.1\.(weight|bias|running_mean|running_var)$", tail)
    if d:
        return _bn_leaf((blk, "down_bn"), d.group(1))
    return None


def _map_corrnl_key(rest: str):
    """neck.* keys (external/AR/ltr/models/neck/CorrNL.py, neck_utils.py)."""
    m = re.match(r"^channel_attention\.(fc[12])\.(weight|bias)$", rest)
    if m:
        tf = _squeeze_1x1 if m.group(2) == "weight" else None
        return ("params", ("channel_attention", m.group(1),
                           "kernel" if m.group(2) == "weight" else "bias"), tf)
    # sub_sampled phi/g are Sequential(conv, maxpool) -> '.0'; theta is bare.
    m = re.match(r"^spatial_attention\.(theta|phi\.0|g\.0)\.(weight|bias)$", rest)
    if m:
        name = m.group(1).split(".")[0]
        tf = _conv if m.group(2) == "weight" else None
        return ("params", ("spatial_attention", name,
                           "kernel" if m.group(2) == "weight" else "bias"), tf)
    m = re.match(r"^spatial_attention\.W\.0\.(weight|bias)$", rest)
    if m:
        tf = _conv if m.group(1) == "weight" else None
        return ("params", ("spatial_attention", "w_conv",
                           "kernel" if m.group(1) == "weight" else "bias"), tf)
    m = re.match(r"^spatial_attention\.W\.1\.(weight|bias|running_mean|running_var)$", rest)
    if m:
        return _bn_leaf(("spatial_attention", "w_bn"), m.group(1))
    return None


def _map_seg_head_key(rest: str):
    """refiner.* keys (external/AR/ltr/models/head/seg_network.py)."""
    m = re.match(r"^TSE\.(layer\d)\.(reduce|transform)\.(\d)\.(weight|bias)$", rest)
    if m:
        tf = _conv if m.group(4) == "weight" else None
        return ("params", (f"TSE_{m.group(1)}", f"{m.group(2)}{m.group(3)}",
                           "kernel" if m.group(4) == "weight" else "bias"), tf)
    m = re.match(r"^(RRB[12])\.(layer\d)\.conv1x1\.(weight|bias)$", rest)
    if m:
        tf = _conv if m.group(3) == "weight" else None
        return ("params", (f"{m.group(1)}_{m.group(2)}", "conv1x1",
                           "kernel" if m.group(3) == "weight" else "bias"), tf)
    m = re.match(r"^(RRB[12])\.(layer\d)\.bblock\.1\.(weight|bias|running_mean|running_var)$", rest)
    if m:
        return _bn_leaf((f"{m.group(1)}_{m.group(2)}", "bblock1"), m.group(3))
    m = re.match(r"^(RRB[12])\.(layer\d)\.bblock\.([03])\.(weight|bias)$", rest)
    if m:
        tf = _conv if m.group(4) == "weight" else None
        return ("params", (f"{m.group(1)}_{m.group(2)}", f"bblock{m.group(3)}",
                           "kernel" if m.group(4) == "weight" else "bias"), tf)
    m = re.match(r"^CAB\.(layer\d)\.convreluconv\.(\d)\.(weight|bias)$", rest)
    if m:
        tf = _conv if m.group(3) == "weight" else None
        return ("params", (f"CAB_{m.group(1)}", f"convreluconv{m.group(2)}",
                           "kernel" if m.group(3) == "weight" else "bias"), tf)
    m = re.match(r"^project\.(conv[12])\.(weight|bias)$", rest)
    if m:
        tf = _conv if m.group(2) == "weight" else None
        return ("params", ("project", m.group(1),
                           "kernel" if m.group(2) == "weight" else "bias"), tf)
    return None


def map_alpha_refine_key(key: str):
    """ARnet_seg_mask state-dict key -> flax AlphaRefineNet path
    (AR_seg_mask.py families: feature_extractor / neck / refiner)."""
    if key.endswith("num_batches_tracked"):
        return None
    if key.startswith("feature_extractor."):
        r = map_resnet_key(key[len("feature_extractor."):])
        if r is None or r is IGNORE:
            return r
        return _prefix_map(("feature_extractor",), r)
    if key.startswith("neck."):
        r = _map_corrnl_key(key[len("neck."):])
        return _prefix_map(("neck",), r) if r else None
    if key.startswith("refiner."):
        r = _map_seg_head_key(key[len("refiner."):])
        return _prefix_map(("refiner",), r) if r else None
    return None


def convert_alpha_refine(sd: Dict[str, np.ndarray], variables: Dict[str, Any],
                         strict: bool = True, verbose: bool = True):
    """Alpha-Refine checkpoint (ARcm_coco_seg*, pytracking loading.py) ->
    flax AlphaRefineNet variables."""
    return convert_state_dict(sd, variables, strict=strict, verbose=verbose,
                              key_mapper=map_alpha_refine_key)


def convert_resnet(sd: Dict[str, np.ndarray], variables: Dict[str, Any],
                   prefix: Tuple[str, ...] = (), strict: bool = False,
                   verbose: bool = True):
    """torchvision ResNet state dict -> flax models/resnet.ResNet variables
    (optionally nested under `prefix` inside a larger tree)."""
    def mapper(k):
        r = map_resnet_key(k)
        if r is None or r is IGNORE:
            return r
        return _prefix_map(prefix, r)
    return convert_state_dict(sd, variables, strict=strict, verbose=verbose,
                              key_mapper=mapper)


# ------------------------------------------------------------- DiMP / ATOM
_IOU_CONVBN = re.compile(
    r"^(conv3_1r|conv3_1t|conv3_2t|fc3_1r|conv4_1r|conv4_1t|conv4_2t"
    r"|fc34_3r|fc34_4r)\.([01])\.(weight|bias|running_mean|running_var)$")


def map_atom_iou_key(rest: str):
    """bb_regressor.* keys (external/AR/ltr/models/bbreg/atom_iou_net.py)
    -> flax classic/dimpnet.AtomIoUNet paths."""
    m = _IOU_CONVBN.match(rest)
    if m:
        name, idx, leaf = m.groups()
        if idx == "0":
            tf = _conv if leaf == "weight" else None
            return ("params", (name, "conv",
                               "kernel" if leaf == "weight" else "bias"), tf)
        return _bn_leaf((name, "bn"), leaf)
    m = re.match(r"^(fc3_rt|fc4_rt)\.linear\.(weight|bias)$", rest)
    if m:
        # LinearBlock flattens in torch NCHW order; the flax twin transposes
        # to NCHW before flattening, so a plain transpose converts.
        tf = _linear if m.group(2) == "weight" else None
        return ("params", (m.group(1), "linear",
                           "kernel" if m.group(2) == "weight" else "bias"), tf)
    m = re.match(r"^(fc3_rt|fc4_rt)\.bn\.(weight|bias|running_mean|running_var)$",
                 rest)
    if m:
        return _bn_leaf((m.group(1), "bn"), m.group(2))
    m = re.match(r"^iou_predictor\.(weight|bias)$", rest)
    if m:
        tf = _linear if m.group(1) == "weight" else None
        return ("params", ("iou_predictor",
                           "kernel" if m.group(1) == "weight" else "bias"), tf)
    return None


def map_dimp_classifier_key(rest: str):
    """classifier.* keys (ltr/models/target_classifier/: LinearFilter with
    features + initializer + optimizer) -> flax classic/dimpnet paths. The
    flax ClfFeatures names children seq{i} after the torch Sequential index
    (InstanceL2Norm is parameterless so indices line up)."""
    m = re.match(r"^feature_extractor\.(\d+)\.weight$", rest)
    if m:   # the bare final 3x3 conv
        return ("params", ("feature_extractor", f"seq{m.group(1)}", "kernel"),
                _conv)
    m = re.match(r"^feature_extractor\.(\d+)\.conv(\d)\.weight$", rest)
    if m:   # BasicBlock convs (dimp18 layout)
        return ("params", ("feature_extractor", f"seq{m.group(1)}",
                           f"conv{m.group(2)}", "kernel"), _conv)
    m = re.match(r"^feature_extractor\.(\d+)\.bn(\d)"
                 r"\.(weight|bias|running_mean|running_var)$", rest)
    if m:
        return _bn_leaf(("feature_extractor", f"seq{m.group(1)}",
                         f"bn{m.group(2)}"), m.group(3))
    m = re.match(r"^feature_extractor\.(\d+)\.downsample\.0\.weight$", rest)
    if m:
        return ("params", ("feature_extractor", f"seq{m.group(1)}",
                           "down_conv", "kernel"), _conv)
    m = re.match(r"^feature_extractor\.(\d+)\.downsample\.1"
                 r"\.(weight|bias|running_mean|running_var)$", rest)
    if m:
        return _bn_leaf(("feature_extractor", f"seq{m.group(1)}", "down_bn"),
                        m.group(2))
    m = re.match(r"^filter_initializer\.filter_conv\.(weight|bias)$", rest)
    if m:
        tf = _conv if m.group(1) == "weight" else None
        return ("params", ("filter_initializer", "filter_conv",
                           "kernel" if m.group(1) == "weight" else "bias"), tf)
    m = re.match(r"^filter_optimizer\.(log_step_length|filter_reg)$", rest)
    if m:
        return ("params", ("filter_optimizer", m.group(1)), None)
    m = re.match(r"^filter_optimizer\.(label_map_predictor"
                 r"|spatial_weight_predictor)\.weight$", rest)
    if m:   # 1x1 conv (1, bins, 1, 1) -> (bins, 1) matmul column
        return ("params", ("filter_optimizer", m.group(1)), _squeeze_1x1)
    m = re.match(r"^filter_optimizer\.target_mask_predictor\.0\.weight$", rest)
    if m:
        return ("params", ("filter_optimizer", "target_mask_predictor"),
                _squeeze_1x1)
    return None


def map_dimpnet_key(key: str):
    """DiMPnet state-dict key (ltr/models/tracking/dimpnet.py assembly:
    feature_extractor / classifier / bb_regressor) -> flax path inside the
    tracker's combined {backbone, classifier, bb_regressor} tree. ATOMnet
    checkpoints (ltr/models/bbreg/atom.py: no classifier) map with the same
    function."""
    if key.endswith("num_batches_tracked"):
        return None
    if key.startswith("feature_extractor."):
        r = map_resnet_key(key[len("feature_extractor."):])
        if r is None or r is IGNORE:
            return r
        return _prefix_map(("backbone",), r)
    if key.startswith("classifier."):
        r = map_dimp_classifier_key(key[len("classifier."):])
        return _prefix_map(("classifier",), r) if r else None
    if key.startswith("bb_regressor."):
        r = map_atom_iou_key(key[len("bb_regressor."):])
        return _prefix_map(("bb_regressor",), r) if r else None
    return None


def convert_dimpnet(sd: Dict[str, np.ndarray], variables: Dict[str, Any],
                    strict: bool = True, verbose: bool = True):
    """DiMPnet / ATOMnet checkpoint -> the classic trackers' combined
    variables tree ({"params"|"batch_stats": {"backbone"|"classifier"|
    "bb_regressor": ...}})."""
    return convert_state_dict(sd, variables, strict=strict, verbose=verbose,
                              key_mapper=map_dimpnet_key)


def convert_state_dict(sd: Dict[str, np.ndarray], variables: Dict[str, Any],
                       frozen_head_bn: bool = False,
                       strict: bool = False,
                       verbose: bool = True,
                       key_mapper=None) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Merge a torch state dict into a flax variables pytree.

    variables: the target {"params": ..., "batch_stats": ...} from model.init.
    Returns (new_variables, report) where report lists converted / skipped /
    missing keys. strict=True raises on any skipped torch key or shape clash
    (parity with load_state_dict(strict=True) at test time,
    lib/test/tracker/asymmetric_shared_ce.py:18-19).
    """
    flat = {}
    for coll, tree in variables.items():
        for path, leaf in _flatten(tree):
            flat[(coll,) + path] = leaf

    new_flat = dict(flat)
    report = {"converted": [], "skipped": [], "shape_mismatch": []}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):   # BN bookkeeping, no flax twin
            continue
        if key_mapper is not None:
            r = key_mapper(k)
        else:
            r = map_torch_key(k, frozen_head_bn=frozen_head_bn)
        if r is IGNORE:                  # known-and-deliberately-absent key
            report.setdefault("ignored", []).append(k)
            continue
        if r is None:
            report["skipped"].append(k)
            continue
        candidates = r if isinstance(r, list) else [r]
        hit = next(((c, p, t) for c, p, t in candidates if (c,) + p in flat), None)
        if hit is None:
            report["skipped"].append(k)
            continue
        coll, path, tf = hit
        full = (coll,) + path
        arr = tf(v) if tf else np.asarray(v)
        if tuple(arr.shape) != tuple(flat[full].shape):
            report["shape_mismatch"].append((k, arr.shape, tuple(flat[full].shape)))
            continue
        new_flat[full] = arr.astype(np.asarray(flat[full]).dtype)
        report["converted"].append(k)
    converted_paths = {p for p in new_flat if new_flat[p] is not flat[p]}
    report["missing"] = sorted("/".join(p) for p in flat if p not in converted_paths)

    if strict and (report["skipped"] or report["shape_mismatch"]
                   or report["missing"]):
        # missing counts too (load_state_dict(strict=True) parity): a
        # truncated/partial checkpoint must not run silently on random
        # weights for the unconverted modules
        raise ValueError(f"strict conversion failed: "
                         f"skipped={report['skipped'][:10]} "
                         f"shape={report['shape_mismatch'][:10]} "
                         f"missing={report['missing'][:10]}")
    if verbose:
        print(f"torch->flax: converted {len(report['converted'])} keys, "
              f"skipped {len(report['skipped'])}, "
              f"shape mismatches {len(report['shape_mismatch'])}")

    out = {}
    for coll in variables:
        paths = {p[1:]: new_flat[p] for p in new_flat if p[0] == coll}
        out[coll] = _unflatten(paths)
    return out, report


def convert_checkpoint(path: str, variables: Dict[str, Any],
                       mode: str = "full", frozen_head_bn: bool = False,
                       strict: bool = False) -> Dict[str, Any]:
    """One-call conversion. mode: 'full' | 'mae' (LN duplication) |
    'two_stream' (backbone duplication)."""
    sd = load_torch_state_dict(path)
    if mode == "mae":
        sd = {("backbone." + k if not k.startswith("backbone.") else k): v
              for k, v in expand_modality_lns(sd).items()}
    elif mode == "two_stream":
        sd = expand_two_stream(sd)
    new_vars, _ = convert_state_dict(sd, variables, frozen_head_bn=frozen_head_bn,
                                     strict=strict)
    return new_vars


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _unflatten(paths: Dict[tuple, Any]):
    root: Dict[str, Any] = {}
    for path, leaf in paths.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return root
