"""Asymmetric-shared RGB-T MixFormer (flagship) with optional candidate
elimination (CE).

Parity targets:
  lib/models/mixformer_vit_rgbt/asymmetric_shared.py — shared-weight ViT with
  modality-specific LayerNorms (norm{1,2}_{v,i}); cross-modal asymmetric
  attention (Attention.forward :55-104): each modality's templates attend
  within their own modality, each modality's search attends to its own search
  plus the templates of BOTH modalities; modalities ride the leading batch
  axis; fused search feature -> corner head.
  lib/models/mixformer_vit_rgbt/asymmetric_shared_ce.py — adds OSTrack-style
  candidate elimination at blocks CE_LOC: rank search tokens by the
  (CTR_POINT-masked) template->search attention, keep top
  ceil(keep_ratio * L_s) per modality (same count in both), restore removed
  tokens as zeros in original order before the head (:22-101, :427-447).
  lib/models/mixformer_vit_rgbt/asymmetric_shared_online.py — SPM score
  branch fed the fused search feature and the concat of both modal templates.

TPU-first notes:
  * CE keep-lengths are *static* python ints derived from the (hashable)
    ce_keep_rate argument, so every pruning step has a fixed shape; the
    train-time cosine keep-rate schedule triggers a bounded number of
    re-compilations (bucketised by the trainer).
  * Selection = jax.lax.top_k + take_along_axis; recovery = batched scatter
    into zeros (removed tokens become zeros, exactly like the reference's
    zero-padded scatter).
  * The two modalities are stacked on a leading axis for all shared dense
    ops (same trick as the reference's batch-dim concat) and separated only
    inside attention.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.layers import Mlp, PatchEmbed, DropPath
from multi_modal_tracking_tpu.models.vit import _heads, _merge, _attend
from multi_modal_tracking_tpu.models.fusion import build_fusion
from multi_modal_tracking_tpu.models.score_decoder import ScoreDecoder
from multi_modal_tracking_tpu.ops.boxes import box_xyxy_to_cxcywh
from multi_modal_tracking_tpu.ops.pos_embed import get_2d_sincos_pos_embed

# CTR_POINT centre-token flat index per template grid size (ce_utils.py:24-37)
# — every entry equals (F - 1) // 2, which _ce_rows uses for other grids.
_CTR_INDEX = {8: 3, 12: 5, 7: 3, 14: 6}


def _check_ce_range(mode: str) -> str:
    """CE template-mask modes: CTR_POINT (centre token), CTR_REC (centre
    rectangle), GT_BOX (downsampled ground-truth box mask, needs runtime
    boxes via ce_gt_boxes), ALL (mean over every template row).

    Note the reference's own generate_mask_cond hard-raises for anything but
    CTR_POINT (ce_utils.py:15-16) and its CTR_REC/GT_BOX branches build
    masks of length n_t instead of the 4*n_t the model consumes — the modes
    are dead code there.  Here they are implemented usably: the branch's
    region semantics (ce_utils.py:39-66), applied to all four template
    copies exactly as CTR_POINT's repeat(1, 4) does."""
    if mode not in ("CTR_POINT", "CTR_REC", "GT_BOX", "ALL"):
        raise ValueError(f"unsupported CE_TEMPLATE_RANGE '{mode}' "
                         f"(implemented: CTR_POINT, CTR_REC, GT_BOX, ALL)")
    return mode


def _ctr_rec_span(F: int) -> Tuple[int, int]:
    """CTR_REC row/col span per template grid size (ce_utils.py:41-48:
    8 -> slice(3,5), 12 -> slice(5,7), 7 -> slice(3,4)); other grids follow
    the same rule the table encodes (2-cell span for even grids, the centre
    cell for odd)."""
    lo = (F - 1) // 2
    return lo, lo + (2 if F % 2 == 0 else 1)


def ce_box_row_weights(gt_xywh: jax.Array, template_size: int,
                       grid: int) -> jax.Array:
    """GT_BOX template-row weights (ce_utils.py:54-66): rasterise the
    normalised (B, 4) xywh boxes at template resolution with the reference's
    integer-truncation quirks (generate_bbox_mask:7-11), bilinear-downsample
    by 1/stride (F.interpolate align_corners=False, no antialias), and
    threshold nonzero.  Returns (B, grid*grid) float {0,1} weights for ONE
    template copy.  Fully traceable (runtime boxes, static shapes)."""
    box = gt_xywh.astype(jnp.float32) * template_size
    x1, y1, w, h = box[:, 0], box[:, 1], box[:, 2], box[:, 3]
    r = jnp.arange(template_size, dtype=jnp.float32)
    # slice semantics int(a):int(a+len-1) -> [floor(a), floor(a+len-1))
    rows = ((r[None] >= jnp.floor(y1)[:, None]) &
            (r[None] < jnp.floor(y1 + h - 1.0)[:, None]))
    cols = ((r[None] >= jnp.floor(x1)[:, None]) &
            (r[None] < jnp.floor(x1 + w - 1.0)[:, None]))
    mask = (rows[:, :, None] & cols[:, None, :]).astype(jnp.float32)

    stride = template_size // grid
    # torch bilinear (align_corners=False, antialias off): output centre
    # (i + 0.5) * stride - 0.5, 4-tap gather with edge clamp
    src = (jnp.arange(grid, dtype=jnp.float32) + 0.5) * stride - 0.5
    i0 = jnp.clip(jnp.floor(src), 0, template_size - 1).astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, template_size - 1)
    fr = jnp.clip(src - i0, 0.0, 1.0)

    def down1(m, axis):
        a = jnp.take(m, i0, axis=axis)
        b = jnp.take(m, i1, axis=axis)
        f = fr.reshape((-1,) + (1,) * (m.ndim - 1 - axis))
        return a * (1.0 - f) + b * f

    small = down1(down1(mask, 1), 2)
    return (small > 0).astype(jnp.float32).reshape(gt_xywh.shape[0], -1)


class AsymCrossModalAttention(nn.Module):
    """Cross-modal asymmetric mixed attention over per-modality [t; ot; s]."""
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype)
        self.proj = nn.Dense(self.dim, dtype=self.dtype)
        self.scale = (self.dim // self.num_heads) ** -0.5

    def __call__(self, x_v: jax.Array, x_i: jax.Array, n_mt: int,
                 return_attention: bool = False,
                 ce_rows: Optional[Tuple[int, ...]] = None):
        """x_v/x_i: (B, n_mt + n_s, C). Returns (x_v, x_i, attn_t2s | None).
        ce_rows: static template-row subset for the t->s CE attention — the
        QK^T + softmax is computed over ONLY those rows (CTR_POINT keeps 4 of
        4*n_t rows, a ~64x saving per CE block; row-wise softmax makes the
        slice exact). None returns all template rows."""
        B, N, C = x_v.shape
        qkv = self.qkv(jnp.concatenate([x_v, x_i], axis=0))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _heads(q, self.num_heads)
        k = _heads(k, self.num_heads)
        v = _heads(v, self.num_heads)
        qV, qI = q[:B], q[B:]
        kV, kI = k[:B], k[B:]
        vV, vI = v[:B], v[B:]

        q_mt_V, q_s_V = qV[:, :, :n_mt], qV[:, :, n_mt:]
        k_mt_V, k_s_V = kV[:, :, :n_mt], kV[:, :, n_mt:]
        v_mt_V, v_s_V = vV[:, :, :n_mt], vV[:, :, n_mt:]
        q_mt_I, q_s_I = qI[:, :, :n_mt], qI[:, :, n_mt:]
        k_mt_I, k_s_I = kI[:, :, :n_mt], kI[:, :, n_mt:]
        v_mt_I, v_s_I = vI[:, :, :n_mt], vI[:, :, n_mt:]

        k_mt = jnp.concatenate([k_mt_V, k_mt_I], axis=2)
        v_mt = jnp.concatenate([v_mt_V, v_mt_I], axis=2)

        from multi_modal_tracking_tpu.ops import attention as _attn_ops
        from multi_modal_tracking_tpu.ops.attention import mixed_attention
        use_pallas = _attn_ops.use_pallas_default(q, k, v) \
            or _attn_ops.FORCE_INTERPRET
        if use_pallas:
            # Fused Pallas path: per modality, keys are laid out
            # [own templates ; other-modality templates ; own search], so the
            # standard asymmetric mask (template rows see j < n_mt, search
            # rows see everything) realises the cross-modal semantics, and
            # both modalities ride the kernel's batch grid in ONE call.
            # Softmax/weighted-sum are key-order-invariant, so this matches
            # the 4-call formulation exactly. The decision is made HERE on
            # the pre-merge shapes and passed through explicitly so the
            # dispatcher cannot re-decide differently on the merged arrays.
            k_all = jnp.concatenate([
                jnp.concatenate([k_mt_V, k_mt_I, k_s_V], axis=2),
                jnp.concatenate([k_mt_I, k_mt_V, k_s_I], axis=2)], axis=0)
            v_all = jnp.concatenate([
                jnp.concatenate([v_mt_V, v_mt_I, v_s_V], axis=2),
                jnp.concatenate([v_mt_I, v_mt_V, v_s_I], axis=2)], axis=0)
            x_all = mixed_attention(q, k_all, v_all, n_mt, self.scale,
                                    use_pallas=True)
            out = self.proj(_merge(x_all))
            x_v, x_i = out[:B], out[B:]
        else:
            # Templates attend within their own modality only; both
            # modalities ride one batched call (keys stacked on batch).
            x_mt = _attend(jnp.concatenate([q_mt_V, q_mt_I], axis=0),
                           jnp.concatenate([k_mt_V, k_mt_I], axis=0),
                           jnp.concatenate([v_mt_V, v_mt_I], axis=0),
                           self.scale)
            # Search attends to all templates (both modalities) + own search.
            x_s = _attend(
                jnp.concatenate([q_s_V, q_s_I], axis=0),
                jnp.concatenate([jnp.concatenate([k_mt, k_s_V], axis=2),
                                 jnp.concatenate([k_mt, k_s_I], axis=2)], axis=0),
                jnp.concatenate([jnp.concatenate([v_mt, v_s_V], axis=2),
                                 jnp.concatenate([v_mt, v_s_I], axis=2)], axis=0),
                self.scale)
            out_V = jnp.concatenate([_merge(x_mt[:B]), _merge(x_s[:B])], axis=1)
            out_I = jnp.concatenate([_merge(x_mt[B:]), _merge(x_s[B:])], axis=1)
            out = self.proj(jnp.concatenate([out_V, out_I], axis=0))
            x_v, x_i = out[:B], out[B:]

        attn_t2s = None
        if return_attention:
            # Template->search attention for CE ranking (its own softmax over
            # the concatenated bimodal search axis, asymmetric_shared_ce.py:203).
            q_mt = jnp.concatenate([q_mt_V, q_mt_I], axis=2)
            if ce_rows is not None:
                q_mt = q_mt[:, :, jnp.asarray(ce_rows), :]
            k_s = jnp.concatenate([k_s_V, k_s_I], axis=2)
            a = jnp.einsum("bhqd,bhkd->bhqk", q_mt, k_s) * self.scale
            attn_t2s = jax.nn.softmax(a.astype(jnp.float32), axis=-1)
        return x_v, x_i, attn_t2s

    # ------------------------------------------------- cached-template path
    # The reference applies a k/v-cache fast path only to its unimodal online
    # models (mixformer_vit/mixformer.py:79-109 forward_test/set_online); the
    # same asymmetry makes it exact for the flagship too: template tokens
    # never attend to search, so their per-block q/k/v depend only on the
    # templates and can be computed once per template update instead of every
    # frame.

    def _qkv_heads(self, x):
        qkv = self.qkv(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (_heads(q, self.num_heads), _heads(k, self.num_heads),
                _heads(v, self.num_heads))

    def template_step(self, nv, ni):
        """Normed template tokens (B, n_mt, C) per modality -> attention
        output + this block's cache {q,k,v per modality}. Both modalities
        ride one batched attention call (within-modality keys only)."""
        B = nv.shape[0]
        q, k, v = self._qkv_heads(jnp.concatenate([nv, ni], axis=0))
        x = _attend(q, k, v, self.scale)
        out = self.proj(_merge(x))
        cache = {"qV": q[:B], "kV": k[:B], "vV": v[:B],
                 "qI": q[B:], "kI": k[B:], "vI": v[B:]}
        return out[:B], out[B:], cache

    def search_step(self, nsv, nsi, cache, return_attention: bool = False,
                    ce_rows: Optional[Tuple[int, ...]] = None):
        """Normed search tokens (B, n_s, C) per modality + cached template
        q/k/v -> attention output (search rows only) + t->s CE attention.
        Per-modality key sets are stacked on the batch axis so both
        modalities run ONE batched attention call."""
        B = nsv.shape[0]
        qs, ks, vs = self._qkv_heads(jnp.concatenate([nsv, nsi], axis=0))
        k_mt = jnp.concatenate([cache["kV"], cache["kI"]], axis=2)
        v_mt = jnp.concatenate([cache["vV"], cache["vI"]], axis=2)
        k_all = jnp.concatenate([jnp.concatenate([k_mt, ks[:B]], axis=2),
                                 jnp.concatenate([k_mt, ks[B:]], axis=2)], axis=0)
        v_all = jnp.concatenate([jnp.concatenate([v_mt, vs[:B]], axis=2),
                                 jnp.concatenate([v_mt, vs[B:]], axis=2)], axis=0)
        x_s = _attend(qs, k_all, v_all, self.scale)
        out = self.proj(_merge(x_s))
        attn_t2s = None
        if return_attention:
            q_mt = jnp.concatenate([cache["qV"], cache["qI"]], axis=2)
            if ce_rows is not None:
                q_mt = q_mt[:, :, jnp.asarray(ce_rows), :]
            k_s = jnp.concatenate([ks[:B], ks[B:]], axis=2)
            a = jnp.einsum("bhqd,bhkd->bhqk", q_mt, k_s) * self.scale
            attn_t2s = jax.nn.softmax(a.astype(jnp.float32), axis=-1)
        return out[:B], out[B:], attn_t2s


def _select_rows(tok: jax.Array, idx: jax.Array) -> jax.Array:
    """tok (B, L, C), idx (B, K) -> (B, K, C) row selection as an exact
    one-hot matmul: 0/1 weights pick rows bit-exactly, and the contraction
    rides the MXU where XLA's take_along_axis gather serialises on TPU."""
    L = tok.shape[1]
    oh = (idx[..., None] == jnp.arange(L, dtype=idx.dtype)[None, None]
          ).astype(tok.dtype)
    return jnp.einsum("bkl,blc->bkc", oh, tok)


def _scatter_rows(tok: jax.Array, idx: jax.Array, n: int) -> jax.Array:
    """tok (B, K, C), idx (B, K) -> (B, n, C) with tok rows placed at idx and
    zeros elsewhere — the transpose of _select_rows, same one-hot matmul."""
    oh = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)[None, None]
          ).astype(tok.dtype)                                   # (B, K, n)
    return jnp.einsum("bkn,bkc->bnc", oh, tok)


def _ce_select(attn_m: jax.Array, tokens: jax.Array, gidx: jax.Array,
               n_mt: int, lens_keep: int):
    """Top-k search-token selection for one modality.

    attn_m: (B, L_s) ranking scores; tokens: (B, n_mt + L_s, C);
    gidx: (B, L_s) original positions. Returns (tokens_new, gidx_new).
    """
    _, top_idx = jax.lax.top_k(attn_m, lens_keep)               # (B, keep)
    gidx_new = jnp.take_along_axis(gidx, top_idx, axis=1)
    kept = _select_rows(tokens[:, n_mt:], top_idx)
    return jnp.concatenate([tokens[:, :n_mt], kept], axis=1), gidx_new


class SharedBlock(nn.Module):
    """Transformer block with modality-specific LNs and optional CE."""
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
        self.attn = AsymCrossModalAttention(self.dim, self.num_heads, self.qkv_bias,
                                            dtype=self.dtype)
        self.mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)
        self.dp1 = DropPath(self.drop_path)
        self.dp2 = DropPath(self.drop_path)

    def __call__(self, x_v, x_i, n_mt: int, gidx_v, gidx_i,
                 lens_keep: Optional[int] = None, ce_rows: Optional[Tuple[int, ...]] = None,
                 ce_row_weights: Optional[jax.Array] = None,
                 deterministic: bool = True, return_scores: bool = False):
        """lens_keep: static keep count (None = no CE at this block).
        ce_rows: static template-row indices for CTR_POINT/CTR_REC attention
        pooling (None = mean over all template rows). ce_row_weights:
        runtime (B, 4*n_t) {0,1} weights for GT_BOX pooling (mean over the
        masked rows). return_scores additionally returns the pooled t->s
        attention per modality (diagnostic hook, cf. the reference's
        attention-map visualisation)."""
        B = x_v.shape[0]
        exe_ce = lens_keep is not None and lens_keep < gidx_v.shape[1]
        nv, ni = self.norm1_v(x_v), self.norm1_i(x_i)
        av, ai, attn_t2s = self.attn(nv, ni, n_mt,
                                     return_attention=exe_ce or return_scores,
                                     ce_rows=ce_rows)
        x_v = x_v + self.dp1(av, deterministic)
        x_i = x_i + self.dp1(ai, deterministic)

        scores = None
        if exe_ce or return_scores:
            lens_s = gidx_v.shape[1]
            if ce_row_weights is not None and ce_rows is None:
                # GT_BOX: mean over the masked template rows only
                wr = ce_row_weights[:, :, None].astype(attn_t2s.dtype)
                ah = attn_t2s.mean(axis=1)                        # (B, R, 2L)
                a = (ah * wr).sum(axis=1) / jnp.maximum(wr.sum(axis=1), 1e-6)
            else:
                a = attn_t2s.mean(axis=(1, 2))                    # (B, 2*L_s)
            if return_scores:
                scores = (a[:, :lens_s], a[:, lens_s:], gidx_v, gidx_i)
            if exe_ce:
                x_v, gidx_v = _ce_select(a[:, :lens_s], x_v, gidx_v, n_mt, lens_keep)
                x_i, gidx_i = _ce_select(a[:, lens_s:], x_i, gidx_i, n_mt, lens_keep)

        mv, mi = self.norm2_v(x_v), self.norm2_i(x_i)
        m = self.mlp(jnp.concatenate([mv, mi], axis=0))
        x_v = x_v + self.dp2(m[:B], deterministic)
        x_i = x_i + self.dp2(m[B:], deterministic)
        if return_scores:
            return x_v, x_i, gidx_v, gidx_i, scores
        return x_v, x_i, gidx_v, gidx_i

    # ------------------------------------------------- cached-template path
    def template_step(self, x_v, x_i):
        """Template-only block step; returns evolved template tokens + the
        block's attention cache (exact same values the full path computes)."""
        B = x_v.shape[0]
        av, ai, cache = self.attn.template_step(self.norm1_v(x_v),
                                                self.norm1_i(x_i))
        x_v = x_v + av
        x_i = x_i + ai
        m = self.mlp(jnp.concatenate([self.norm2_v(x_v), self.norm2_i(x_i)],
                                     axis=0))
        return x_v + m[:B], x_i + m[B:], cache

    def search_step(self, s_v, s_i, cache, gidx_v, gidx_i,
                    lens_keep: Optional[int] = None,
                    ce_rows: Optional[Tuple[int, ...]] = None):
        """Search-only block step against a template cache. Mirrors __call__
        for the search rows (template rows are frozen at their cached
        values); CE selection operates on pure search-token tensors."""
        B = s_v.shape[0]
        exe_ce = lens_keep is not None and lens_keep < gidx_v.shape[1]
        av, ai, attn_t2s = self.attn.search_step(self.norm1_v(s_v),
                                                 self.norm1_i(s_i), cache,
                                                 return_attention=exe_ce,
                                                 ce_rows=ce_rows)
        s_v = s_v + av
        s_i = s_i + ai
        if exe_ce:
            lens_s = gidx_v.shape[1]
            a = attn_t2s.mean(axis=(1, 2))
            s_v, gidx_v = _ce_select(a[:, :lens_s], s_v, gidx_v, 0, lens_keep)
            s_i, gidx_i = _ce_select(a[:, lens_s:], s_i, gidx_i, 0, lens_keep)
        m = self.mlp(jnp.concatenate([self.norm2_v(s_v), self.norm2_i(s_i)],
                                     axis=0))
        return s_v + m[:B], s_i + m[B:], gidx_v, gidx_i


def ce_keep_schedule(n_search: int, depth: int, ce_loc: Sequence[int],
                     ce_keep_ratio: Sequence[float], ce_keep_rate: Optional[float]):
    """Static per-block keep lengths (None = no pruning at that block).

    Mirrors candidate_elimination's lens_keep = ceil(rate * current_L_s)
    per CE block (asymmetric_shared_ce.py:77), with the runtime ce_keep_rate
    overriding the per-block config ratio when given (:270).
    """
    keeps: List[Optional[int]] = [None] * depth
    cur = n_search
    ce_loc = list(ce_loc or [])
    ratios = list(ce_keep_ratio or [])
    for bi in range(depth):
        if bi in ce_loc:
            r = ce_keep_rate if ce_keep_rate is not None else ratios[ce_loc.index(bi)]
            k = min(math.ceil(r * cur), cur)
            if k < cur:
                keeps[bi] = k
                cur = k
    return keeps, cur


class AsymSharedViT(nn.Module):
    """Shared-weight bimodal ViT backbone (modalities on a leading axis)."""
    img_size_s: int = 288
    img_size_t: int = 128
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    ce_loc: Optional[Tuple[int, ...]] = None
    ce_keep_ratio: Optional[Tuple[float, ...]] = None
    ce_template_range: str = "CTR_POINT"
    #: gradient checkpointing: recompute each block's activations in the
    #: backward pass instead of storing them — ~depth x less activation HBM
    #: for ~1/3 extra forward FLOPs (the jax.checkpoint lever from the TPU
    #: playbook; enables larger train batches). Numerics are exact.
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        block_cls = SharedBlock
        if self.remat:
            # static args of SharedBlock.__call__ (after self): n_mt(3),
            # lens_keep(6), ce_rows(7), deterministic(9), return_scores(10)
            # (ce_row_weights(8) is a runtime tensor) — flax's nn.remat
            # counts self as argnum 0. Other methods (template_step/
            # search_step: inference caches, no grads) are left
            # untransformed; the lifted transform preserves param names so
            # checkpoints are interchangeable with the plain model.
            block_cls = nn.remat(SharedBlock, static_argnums=(3, 6, 7, 9, 10))
        self.blocks = [
            block_cls(self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                      drop_path=dpr[i], dtype=self.dtype, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.grid_size_s = self.img_size_s // self.patch_size
        self.grid_size_t = self.img_size_t // self.patch_size
        self.pos_embed_s = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, self.grid_size_s))[None]
        self.pos_embed_t = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, self.grid_size_t))[None]

    def _ce_rows(self, use_mask: bool) -> Optional[Tuple[int, ...]]:
        """Static template-row indices ([t_v, ot_v, t_i, ot_i] row order of
        the pooled t->s attention) for the static mask modes: CTR_POINT (the
        centre token, ce_utils.py generate_mask_cond + repeat(1, 4)) and
        CTR_REC (the centre rectangle, ce_utils.py:39-53). Grids outside the
        reference's tables use the same centre formula (F - 1) // 2 the
        tables encode, so small test geometries get true centre semantics
        instead of silently degrading to ALL-rows pooling. GT_BOX masks are
        runtime data, handled via ce_row_weights instead."""
        if not use_mask or self.ce_template_range not in ("CTR_POINT",
                                                          "CTR_REC"):
            return None
        F = self.grid_size_t
        n_t = F * F
        if self.ce_template_range == "CTR_POINT":
            c = _CTR_INDEX.get(F, (F - 1) // 2)
            flats = [c * F + c]
        else:
            lo, hi = _ctr_rec_span(F)
            flats = [r * F + c for r in range(lo, hi) for c in range(lo, hi)]
        return tuple(f + g * n_t for g in range(4) for f in flats)

    def __call__(self, x_t, x_ot, x_s, ce_keep_rate: Optional[float] = None,
                 use_ce_template_mask: bool = True, deterministic: bool = True,
                 return_attn_maps: bool = False,
                 ce_gt_boxes: Optional[jax.Array] = None):
        """Inputs stacked bimodal NHWC batches: x_* shape (2B, H, W, 3) with
        [:B]=RGB, [B:]=TIR. Returns (t, ot, s) feature maps of shape
        (2B, h, w, C) (search tokens zero-restored at pruned positions).
        return_attn_maps additionally returns, per CE block, the pooled
        template->search attention scattered back to the (B, 2, gs, gs) grid
        per modality — the reference's attention-map visualisation hook
        (lib/test/tracker/mixformer_cvt_online.py:99-131)."""
        t = self.patch_embed(x_t) + self.pos_embed_t.astype(self.dtype)
        ot = self.patch_embed(x_ot) + self.pos_embed_t.astype(self.dtype)
        s = self.patch_embed(x_s) + self.pos_embed_s.astype(self.dtype)
        B2 = t.shape[0]
        B = B2 // 2
        n_t, n_s = t.shape[1], s.shape[1]
        n_mt = 2 * n_t

        x = jnp.concatenate([t, ot, s], axis=1)
        x_v, x_i = x[:B], x[B:]

        keeps, _ = ce_keep_schedule(n_s, self.depth, self.ce_loc or (),
                                    self.ce_keep_ratio or (), ce_keep_rate)
        ce_rows = self._ce_rows(use_ce_template_mask)
        ce_row_weights = None
        if (use_ce_template_mask and self.ce_template_range == "GT_BOX"
                and ce_gt_boxes is not None):
            w1 = ce_box_row_weights(ce_gt_boxes, self.img_size_t,
                                    self.grid_size_t)
            ce_row_weights = jnp.tile(w1, (1, 4))   # t/ot x both modalities

        gidx = jnp.broadcast_to(jnp.arange(n_s, dtype=jnp.int32)[None], (B, n_s))
        gidx_v = gidx
        gidx_i = gidx
        gs = self.grid_size_s
        attn_maps = {}

        def scatter_grid(score, gi):
            full = jnp.zeros((B, n_s), jnp.float32)
            full = jax.vmap(lambda buf, idx, val: buf.at[idx].set(val))(
                full, gi, score.astype(jnp.float32))
            return full.reshape(B, gs, gs)

        for bi, blk in enumerate(self.blocks):
            want = return_attn_maps and (self.ce_loc is not None and bi in self.ce_loc)
            # positional call: nn.remat static_argnums are positional-only
            out = blk(x_v, x_i, n_mt, gidx_v, gidx_i,
                      keeps[bi], ce_rows, ce_row_weights, deterministic, want)
            if want:
                x_v, x_i, gidx_v, gidx_i, (a_v, a_i, gv, gi) = out
                attn_maps[bi] = jnp.stack([scatter_grid(a_v, gv),
                                           scatter_grid(a_i, gi)], axis=1)
            else:
                x_v, x_i, gidx_v, gidx_i = out

        # Restore original search-token order; pruned positions become zeros
        # (scatter parity with _recover_search, asymmetric_shared_ce.py:427).
        def recover(xm, gi):
            z, sm = xm[:, :n_mt], xm[:, n_mt:]
            if sm.shape[1] == n_s:
                return xm
            return jnp.concatenate([z, _scatter_rows(sm, gi, n_s)], axis=1)

        x_v = recover(x_v, gidx_v)
        x_i = recover(x_i, gidx_i)
        x = jnp.concatenate([x_v, x_i], axis=0)

        gt, gs = self.grid_size_t, self.grid_size_s
        t, ot, s = x[:, :n_t], x[:, n_t:2 * n_t], x[:, 2 * n_t:]
        feats = (t.reshape(B2, gt, gt, -1), ot.reshape(B2, gt, gt, -1),
                 s.reshape(B2, gs, gs, -1))
        if return_attn_maps:
            return feats + (attn_maps,)
        return feats

    # ------------------------------------------------- cached-template path
    def build_template_cache(self, x_t, x_ot):
        """Run the template tokens through all blocks once, collecting every
        block's attention cache. Returns {"kv": [per-block cache], "t": ...,
        "ot": ...} with final template feature maps for the score branch."""
        t = self.patch_embed(x_t) + self.pos_embed_t.astype(self.dtype)
        ot = self.patch_embed(x_ot) + self.pos_embed_t.astype(self.dtype)
        B2 = t.shape[0]
        B = B2 // 2
        n_t = t.shape[1]
        x = jnp.concatenate([t, ot], axis=1)
        x_v, x_i = x[:B], x[B:]
        kv = []
        for blk in self.blocks:
            x_v, x_i, c = blk.template_step(x_v, x_i)
            kv.append(c)
        x = jnp.concatenate([x_v, x_i], axis=0)
        gt = self.grid_size_t
        return {"kv": kv,
                "t": x[:, :n_t].reshape(B2, gt, gt, -1),
                "ot": x[:, n_t:].reshape(B2, gt, gt, -1)}

    def forward_search(self, cache, x_s, ce_keep_rate: Optional[float] = None,
                       use_ce_template_mask: bool = True):
        """Per-frame search-only forward against a template cache; numerics
        match __call__'s search output exactly (the asymmetry guarantees the
        cached template values are what the full pass would recompute)."""
        s = self.patch_embed(x_s) + self.pos_embed_s.astype(self.dtype)
        B2 = s.shape[0]
        B = B2 // 2
        n_s = s.shape[1]
        s_v, s_i = s[:B], s[B:]
        keeps, _ = ce_keep_schedule(n_s, self.depth, self.ce_loc or (),
                                    self.ce_keep_ratio or (), ce_keep_rate)
        # (GT_BOX needs runtime boxes; eval-time callers pass none, matching
        # the reference tracker's mask-free test call)
        ce_rows = self._ce_rows(use_ce_template_mask)
        gidx = jnp.broadcast_to(jnp.arange(n_s, dtype=jnp.int32)[None], (B, n_s))
        gidx_v = gidx
        gidx_i = gidx
        for bi, blk in enumerate(self.blocks):
            s_v, s_i, gidx_v, gidx_i = blk.search_step(
                s_v, s_i, cache["kv"][bi], gidx_v, gidx_i,
                lens_keep=keeps[bi], ce_rows=ce_rows)

        def recover(sm, gi):
            if sm.shape[1] == n_s:
                return sm
            return _scatter_rows(sm, gi, n_s)

        s_v = recover(s_v, gidx_v)
        s_i = recover(s_i, gidx_i)
        gs = self.grid_size_s
        return jnp.concatenate([s_v, s_i], axis=0).reshape(B2, gs, gs, -1)


@dataclasses.dataclass(frozen=True)
class RGBTSpec:
    """Hashable model spec extracted from a CfgNode (flax field friendly)."""
    search_size: int = 288
    template_size: int = 128
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    head_type: str = "CORNER"
    head_dim: int = 384
    head_freeze_bn: bool = False
    fusion_class: str = "Attention_Fusion_Bimodal_LNSpecific_2"
    fusion_layers: int = 6
    ce_loc: Optional[Tuple[int, ...]] = None
    ce_keep_ratio: Optional[Tuple[float, ...]] = None
    ce_template_range: str = "CTR_POINT"
    drop_path_rate: float = 0.1
    nlayer_head: int = 3
    remat: bool = False

    @staticmethod
    def from_cfg(cfg) -> "RGBTSpec":
        dims = dict(base_patch16=(768, 12, 12), large_patch16=(1024, 24, 16))[cfg.MODEL.VIT_TYPE]
        bb = cfg.MODEL.BACKBONE
        return RGBTSpec(
            search_size=cfg.DATA.SEARCH.SIZE, template_size=cfg.DATA.TEMPLATE.SIZE,
            embed_dim=dims[0], depth=dims[1], num_heads=dims[2],
            head_type=cfg.MODEL.HEAD_TYPE, head_dim=cfg.MODEL.get("HEAD_DIM", 384),
            head_freeze_bn=cfg.MODEL.get("HEAD_FREEZE_BN", False),
            fusion_class=cfg.MODEL.FUSION_CLASS, fusion_layers=cfg.MODEL.FUSION_LAYERS,
            ce_loc=tuple(bb.CE_LOC) if "CE_LOC" in bb else None,
            ce_keep_ratio=tuple(bb.CE_KEEP_RATIO) if "CE_KEEP_RATIO" in bb else None,
            ce_template_range=_check_ce_range(bb.get("CE_TEMPLATE_RANGE",
                                                     "CTR_POINT")),
            nlayer_head=cfg.MODEL.get("NLAYER_HEAD", 3),
            remat=cfg.TRAIN.get("REMAT", False))


class MixFormerRGBT(nn.Module):
    """Backbone + fusion + corner head (+ optional SPM score branch)."""
    spec: RGBTSpec
    with_score: bool = False
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        sp = self.spec
        self.backbone = AsymSharedViT(
            img_size_s=sp.search_size, img_size_t=sp.template_size,
            embed_dim=sp.embed_dim, depth=sp.depth, num_heads=sp.num_heads,
            drop_path_rate=sp.drop_path_rate,
            ce_loc=sp.ce_loc, ce_keep_ratio=sp.ce_keep_ratio,
            ce_template_range=sp.ce_template_range,
            remat=sp.remat, dtype=self.dtype)
        self.fusion_vi = build_fusion(sp.fusion_class, sp.embed_dim, 512,
                                      sp.fusion_layers, dtype=self.dtype,
                                      axis_name=self.axis_name)
        self.box_head = _build_head_from_spec(sp, axis_name=self.axis_name, dtype=self.dtype)
        if self.with_score:
            self.score_branch = ScoreDecoder(num_heads=sp.num_heads, hidden_dim=sp.embed_dim,
                                             nlayer_head=sp.nlayer_head,
                                             dtype=self.dtype)

    def __call__(self, t_vi, ot_vi, s_vi, ce_keep_rate: Optional[float] = None,
                 use_ce_template_mask: bool = True, run_score_head: bool = False,
                 gt_bboxes: Optional[jax.Array] = None,
                 deterministic: bool = True, train: bool = False,
                 return_features: bool = False,
                 ce_gt_boxes: Optional[jax.Array] = None):
        """t_vi/ot_vi/s_vi: (2B, H, W, 3) bimodal stacks ([:B]=RGB, [B:]=TIR).
        ce_gt_boxes: (B, 4) normalised template-crop xywh ground truth,
        needed only for CE_TEMPLATE_RANGE='GT_BOX'.

        Returns dict with 'pred_boxes' (B, 1, 4) cxcywh in [0,1] (+ optional
        'pred_scores', feature maps).
        """
        t, ot, s = self.backbone(t_vi, ot_vi, s_vi, ce_keep_rate,
                                 use_ce_template_mask, deterministic,
                                 ce_gt_boxes=ce_gt_boxes)
        B = s.shape[0] // 2
        s_v, s_i = s[:B], s[B:]
        # train= reaches conv-fusion BatchNorms (batch stats update in
        # training like the reference's SyncBN path)
        fused = self.fusion_vi(s_v, s_i, deterministic, train=train)
        box_xyxy = self.box_head(fused, train=train)           # (B, 4) in [0,1]
        out_coord = box_xyxy_to_cxcywh(box_xyxy)
        out = {"pred_boxes": out_coord.reshape(B, 1, 4)}
        if run_score_head and self.with_score:
            search_box = gt_bboxes if gt_bboxes is not None else jax.lax.stop_gradient(box_xyxy)
            # Score branch sees fused search + concat of both modal templates
            # (asymmetric_shared_online.py:371).
            t_v, t_i = t[:B], t[B:]
            # reference concats modal template maps on NCHW dim 2 == HEIGHT
            # (asymmetric_shared_online.py:374) -> NHWC axis 1; width-concat
            # permutes the flattened token order the SPM attends over (caught
            # by tests/test_reference_import_families.py score parity)
            template_feat = jnp.concatenate([t_v, t_i], axis=1)  # (B, 2*gt, gt, C)
            out["pred_scores"] = self.score_branch(fused, template_feat,
                                                   search_box.reshape(B, 4))
        if return_features:
            out["search_v"], out["search_i"], out["search_fused"] = s_v, s_i, fused
        return out

    # ------------------------------------------------- cached-template path
    def set_online(self, t_vi, ot_vi):
        """Build the per-block template k/v cache + final template features.
        The RGBT analogue of the reference's set_online
        (mixformer_vit/mixformer.py:95-109), exact for this architecture
        because templates never attend to search. Recomputed only at template
        updates; use with forward_track."""
        return self.backbone.build_template_cache(t_vi, ot_vi)

    def forward_track(self, cache, s_vi, ce_keep_rate: Optional[float] = None,
                      use_ce_template_mask: bool = True,
                      run_score_head: bool = False):
        """Per-frame tracking forward over search tokens only (the RGBT
        forward_test, mixformer_vit/mixformer.py:79-93): ~40% fewer backbone
        FLOPs than __call__ with numerically identical outputs."""
        s = self.backbone.forward_search(cache, s_vi, ce_keep_rate,
                                         use_ce_template_mask)
        B = s.shape[0] // 2
        s_v, s_i = s[:B], s[B:]
        fused = self.fusion_vi(s_v, s_i, True)
        box_xyxy = self.box_head(fused, train=False)
        out = {"pred_boxes": box_xyxy_to_cxcywh(box_xyxy).reshape(B, 1, 4)}
        if run_score_head and self.with_score:
            t, _ot = cache["t"], cache["ot"]
            # height-concat (NHWC axis 1), same as __call__ — keeps the
            # cached path bit-identical to the full forward
            template_feat = jnp.concatenate([t[:B], t[B:]], axis=1)
            out["pred_scores"] = self.score_branch(
                fused, template_feat,
                jax.lax.stop_gradient(box_xyxy).reshape(B, 4))
        return out


def _build_head_from_spec(sp: RGBTSpec, axis_name=None, dtype=jnp.float32):
    from multi_modal_tracking_tpu.models.heads import (CornerPredictor,
                                                       PyramidCornerPredictor)
    if sp.head_type == "MLP":
        # The reference builds an MLP box head (head.py:236-239) but its
        # forward_box_head raises KeyError for any non-CORNER head type
        # (mixformer_cvt/mixformer.py:763) — no config uses it and there is
        # no defined way to decode a box from it. Fail loudly at build time
        # instead of reproducing the reference's latent forward-time crash.
        raise NotImplementedError(
            "HEAD_TYPE 'MLP' has no runnable forward path in the reference "
            "(mixformer.py:763 raises KeyError); use CORNER or CORNER_UP")
    if sp.head_type == "CORNER":
        return CornerPredictor(channel=sp.head_dim, feat_sz=sp.search_size // 16, stride=16,
                               freeze_bn=sp.head_freeze_bn, axis_name=axis_name, dtype=dtype)
    if sp.head_type == "CORNER_UP":
        return PyramidCornerPredictor(channel=sp.head_dim, feat_sz=sp.search_size // 4, stride=4,
                                      freeze_bn=sp.head_freeze_bn, axis_name=axis_name, dtype=dtype)
    raise ValueError(sp.head_type)


def build_mixformer_rgbt(cfg, with_score: bool = False, dtype=jnp.float32,
                         axis_name: Optional[str] = None) -> MixFormerRGBT:
    """Builder parity: build_asymmetric_shared(_ce/_online_score)."""
    return MixFormerRGBT(spec=RGBTSpec.from_cfg(cfg), with_score=with_score,
                         dtype=dtype, axis_name=axis_name)
