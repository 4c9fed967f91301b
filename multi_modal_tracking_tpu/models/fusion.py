"""RGB-T fusion zoo: conv fusions and deformable-attention fusion encoders.

Parity targets:
  lib/models/mixformer_vit_rgbt/fusion_utils.py — fusion classes selected by
  cfg.MODEL.FUSION_CLASS (flagship configs use
  Attention_Fusion_Bimodal_LNSpecific_2: shared 1x1+GN in/out adjust, sum of
  modal outputs).
  deformable_attention/deformable_encoder(_lnspecific).py — 2-level ("level"
  = modality) Deformable-DETR encoder: flattened modal maps + sine pos
  embedding + per-level embed, per-pixel reference points, N x
  (MSDeformAttn(+bimodal query) -> LN -> FFN -> LN).
  ops/modules/ms_deform_attn_bimodal.py — sampling offsets & attention
  weights predicted from the concat of both modal queries and shared across
  modalities; directional grid bias init (:65-81).

TPU-first: reference points, pos encodings and level embeds constant-fold at
trace time (no padding masks — tracking crops are always dense, which the
reference also exploits by passing all-False masks). The sampling core is the
pure-XLA `ms_deform_attn` op.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.ops.msda import ms_deform_attn
from multi_modal_tracking_tpu.ops.pos_embed import sine_position_encoding


def _msda_grid_bias(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Directional grid init for sampling-offset bias (ms_deform_attn*.py:66-75)."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(n_heads, 1, 1, 2), (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttnBimodal(nn.Module):
    """Multi-scale deformable attention over 2 levels = 2 modalities.

    attn_type (deformable_encoder.py:119-124 DeformAttn_type):
      'bimodal'   offsets/weights predicted from the CONCAT of both modal
                  queries and SHARED across modalities
                  (ops/modules/ms_deform_attn_bimodal.py:97-111)
      'bimodal_2' separate offsets/weights PER modality, still predicted from
                  the concat bimodal query (2x prediction width;
                  ms_deform_attn_bimodal_2.py:58-60,109-110 — the reference
                  `view`s the doubled features straight to sequence length,
                  interleaving modalities; we keep them aligned with the
                  [V; I] token order, which is the stated intent)
      'normal'    standard MSDeformAttn: each query predicts its own
                  offsets/weights from itself (ms_deform_attn.py)
    """
    d_model: int = 256
    n_levels: int = 2
    n_heads: int = 8
    n_points: int = 4
    attn_type: str = "bimodal"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jax.Array, reference_points: jax.Array, src: jax.Array,
                 spatial_shapes: Tuple[Tuple[int, int], ...]) -> jax.Array:
        """query/src: (B, 2*HW, C); reference_points: (Lq, L, 2) static."""
        B, Lq, C = query.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points
        Lq_uni = Lq // 2

        # xavier_uniform like the reference's _reset_parameters
        # (ms_deform_attn_bimodal.py:78-81)
        xav = nn.initializers.xavier_uniform()
        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj",
                         kernel_init=xav)(src)
        value = value.reshape(B, Lq, M, C // M)

        grid_bias = lambda reps: (lambda *_: jnp.asarray(
            np.tile(_msda_grid_bias(M, L, P), reps)))
        if self.attn_type == "normal":
            off = nn.Dense(M * L * P * 2, dtype=self.dtype, name="sampling_offsets",
                           kernel_init=nn.initializers.zeros,
                           bias_init=grid_bias(1))(query)
            off = off.reshape(B, Lq, M, L, P, 2)
            w = nn.Dense(M * L * P, dtype=self.dtype, name="attention_weights",
                         kernel_init=nn.initializers.zeros)(query)
            w = w.reshape(B, Lq, M, L * P)
        else:
            q_bi = jnp.concatenate([query[:, :Lq_uni], query[:, Lq_uni:]], axis=2)  # (B, Lq/2, 2C)
            if self.attn_type == "bimodal_2":
                off = nn.Dense(M * L * P * 2 * 2, dtype=self.dtype, name="sampling_offsets",
                               kernel_init=nn.initializers.zeros,
                               bias_init=grid_bias(2))(q_bi)
                off = off.reshape(B, Lq_uni, 2, M, L, P, 2)
                off = jnp.concatenate([off[:, :, 0], off[:, :, 1]], axis=1)   # per-modal V/I
                w = nn.Dense(M * L * P * 2, dtype=self.dtype, name="attention_weights",
                             kernel_init=nn.initializers.zeros)(q_bi)
                w = w.reshape(B, Lq_uni, 2, M, L * P)
                w = jnp.concatenate([w[:, :, 0], w[:, :, 1]], axis=1)
            else:
                off = nn.Dense(M * L * P * 2, dtype=self.dtype, name="sampling_offsets",
                               kernel_init=nn.initializers.zeros,
                               bias_init=grid_bias(1))(q_bi)
                off = off.reshape(B, Lq_uni, M, L, P, 2)
                off = jnp.concatenate([off, off], axis=1)                     # shared V/I
                w = nn.Dense(M * L * P, dtype=self.dtype, name="attention_weights",
                             kernel_init=nn.initializers.zeros)(q_bi)
                w = jnp.concatenate([w, w], axis=1).reshape(B, Lq, M, L * P)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(self.dtype)
        w = w.reshape(B, Lq, M, L, P)

        normalizer = jnp.asarray([[s[1], s[0]] for s in spatial_shapes], dtype=jnp.float32)  # (L, 2) [W, H]
        loc = reference_points[None, :, None, :, None, :] + off / normalizer[None, None, None, :, None, :]
        # sampling runs in the model dtype (bf16 on TPU: the interpolation
        # weights carry ~2 valid decimals, well inside tracking tolerance,
        # and the matmul-lowered sampler then rides the MXU at full rate);
        # coordinates stay f32 inside ms_deform_attn.
        out = ms_deform_attn(value, spatial_shapes,
                             loc.astype(jnp.float32), w.astype(self.dtype))
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj",
                        kernel_init=xav)(out)


class _ModalLayerNorm(nn.Module):
    """LN applied per modality half of a (B, 2*HW, C) sequence when
    `ln_specific`, else one shared LN (deformable_encoder vs _lnspecific)."""
    ln_specific: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # epsilon 1e-5: the reference's encoder LNs use the torch default
        # (deformable_encoder_lnspecific.py:127-137), unlike the backbone's 1e-6.
        if not self.ln_specific:
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        half = x.shape[1] // 2
        xv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_v")(x[:, :half])
        xi = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_i")(x[:, half:])
        return jnp.concatenate([xv, xi], axis=1)


class DeformableEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int = 2
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.1
    ln_specific: bool = True
    attn_type: str = "bimodal"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, deterministic=True):
        q = src + pos
        src2 = MSDeformAttnBimodal(self.d_model, self.n_levels, self.n_heads,
                                   self.n_points, attn_type=self.attn_type,
                                   dtype=self.dtype, name="self_attn")(
            q, reference_points, src, spatial_shapes)
        src2 = nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = _ModalLayerNorm(self.ln_specific, dtype=self.dtype, name="norm1")(src + src2)

        # the reference encoder xavier-inits every dim>1 parameter
        # (deformable_encoder.py _reset_parameters)
        xav = nn.initializers.xavier_uniform()
        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1",
                      kernel_init=xav)(src)
        ff = nn.Dropout(self.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2",
                      kernel_init=xav)(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        src = _ModalLayerNorm(self.ln_specific, dtype=self.dtype, name="norm2")(src + ff)
        return src


class DeformableAttentionFusion(nn.Module):
    """N-layer deformable encoder over the two flattened modal search maps."""
    d_model: int = 512
    n_heads: int = 8
    num_encoder_layers: int = 6
    n_points: int = 4
    dropout: float = 0.1
    ln_specific: bool = True
    attn_type: str = "bimodal"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src_v: jax.Array, src_i: jax.Array, deterministic=True,
                 train: bool = False) -> jax.Array:
        """src_v/src_i: (B, H, W, d_model) -> (B, 2*H*W, d_model).
        `train` is accepted for a uniform fusion interface (no BN here)."""
        B, H, W, C = src_v.shape
        spatial_shapes = ((H, W), (H, W))
        src = jnp.concatenate([src_v.reshape(B, H * W, C), src_i.reshape(B, H * W, C)], axis=1)

        level_embed = self.param("level_embed", nn.initializers.normal(1.0), (2, self.d_model))
        pos1 = jnp.asarray(sine_position_encoding(H, W, self.d_model // 2))   # (HW, C)
        pos = jnp.concatenate([pos1 + level_embed[0], pos1 + level_embed[1]], axis=0)[None]
        pos = pos.astype(self.dtype)

        # Reference points: per-pixel centres normalised by extent, identical
        # for both levels (valid_ratios == 1; deformable_encoder*.py:168-186).
        ys, xs = np.meshgrid(np.linspace(0.5, H - 0.5, H) / H,
                             np.linspace(0.5, W - 0.5, W) / W, indexing="ij")
        ref1 = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)                 # (HW, 2)
        ref = np.concatenate([ref1, ref1], axis=0)                            # (2HW, 2)
        ref = jnp.asarray(np.tile(ref[:, None, :], (1, 2, 1)), dtype=jnp.float32)  # (2HW, L, 2)

        for i in range(self.num_encoder_layers):
            src = DeformableEncoderLayer(self.d_model, 4 * self.d_model, 2, self.n_heads,
                                         self.n_points, self.dropout, self.ln_specific,
                                         self.attn_type, dtype=self.dtype,
                                         name=f"layers_{i}")(
                src, pos, ref, spatial_shapes, deterministic)
        return src


class _AdjustConv(nn.Module):
    """1x1 conv + GroupNorm(32) channel adjust."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, kernel_size=(1, 1), dtype=self.dtype, name="conv")(x)
        # torch GroupNorm default eps (fusion_utils.py:330-342)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="gn")(x)


class AttentionFusionBimodal(nn.Module):
    """Attention_Fusion_Bimodal(_LNSpecific){,_Sum,_2} family.

    mode:
      'cat'        separate in-adjusts, concat modal outputs -> out adjust
                   (Attention_Fusion_Bimodal / _LNSpecific / _Bimodal_2 /
                   Attention_Fusion_512)
      'sum'        separate in-adjusts, sum modal outputs -> out adjust
                   (Attention_Fusion_Bimodal_LNSpecific_Sum)
      'shared_sum' shared in-adjust, sum outputs, shared out adjust
                   (Attention_Fusion_Bimodal_LNSpecific_2 — flagship)
      'raw_sum'    no adjusts at all: encoder at d_model=channels, modal
                   outputs summed (Attention_Fusion_1, fusion_utils.py:113-126)
    """
    channels: int = 768
    d_model: int = 512
    num_encoder_layers: int = 6
    ln_specific: bool = True
    mode: str = "shared_sum"
    attn_type: str = "bimodal"
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_v: jax.Array, x_i: jax.Array, deterministic=True,
                 train: bool = False) -> jax.Array:
        """(B, H, W, channels) x2 -> (B, H, W, channels) fused map.
        `train` is accepted for a uniform fusion interface (no BN here)."""
        B, H, W, _ = x_v.shape
        d_model = self.channels if self.mode == "raw_sum" else self.d_model
        if self.mode == "raw_sum":
            v, i = x_v, x_i
        elif self.mode == "shared_sum":
            adj = _AdjustConv(d_model, dtype=self.dtype, name="adjust_in")
            v, i = adj(x_v), adj(x_i)
        else:
            v = _AdjustConv(d_model, dtype=self.dtype, name="adjust_v")(x_v)
            i = _AdjustConv(d_model, dtype=self.dtype, name="adjust_i")(x_i)
        out = DeformableAttentionFusion(d_model, 8, self.num_encoder_layers,
                                        ln_specific=self.ln_specific, dropout=self.dropout,
                                        attn_type=self.attn_type,
                                        dtype=self.dtype, name="fusion_attention")(
            v, i, deterministic)
        out_v = out[:, :H * W].reshape(B, H, W, d_model)
        out_i = out[:, H * W:].reshape(B, H, W, d_model)
        if self.mode == "raw_sum":
            return out_v + out_i
        if self.mode == "cat":
            cat = jnp.concatenate([out_v, out_i], axis=-1)
            return _AdjustConv(self.channels, dtype=self.dtype, name="adjust_cat")(cat)
        name = "adjust_out" if self.mode == "shared_sum" else "adjust_sum"
        return _AdjustConv(self.channels, dtype=self.dtype, name=name)(out_v + out_i)


class ConvFusion(nn.Module):
    """RGBT_Fusion_1 (fusion_utils.py:8-23): cat -> 3x3 conv-BN-ReLU x2."""
    out_channels: int = 768
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def _bn(self, name, train):
        # torch BatchNorm2d parity: momentum 0.1 (flax 0.9), eps 1e-5;
        # axis_name syncs batch stats across the data mesh (SyncBN,
        # train_script_mixformer.py:105) like every other BN here.
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5,
                            axis_name=self.axis_name if train else None,
                            dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x_v, x_i, deterministic=True, train: bool = False):
        x = jnp.concatenate([x_v, x_i], axis=-1)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="fusion")(x)
        x = self._bn("fusion_bn", train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="fusion2")(x)
        x = self._bn("fusion2_bn", train)(x)
        return nn.relu(x)


class DeformConvFusion(nn.Module):
    """RGBT_Fusion_2 (fusion_utils.py:26-62): zero-initialised offset conv
    over the concatenated modalities predicts (dy, dx, mask) for a
    2-deform-group modulated deformable conv, then conv-BN-ReLU."""
    out_channels: int = 768
    deform_groups: int = 2
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    _bn = ConvFusion._bn

    @nn.compact
    def __call__(self, x_v, x_i, deterministic=True, train: bool = False):
        from multi_modal_tracking_tpu.ops.deform_conv import modulated_deform_conv2d
        x = jnp.concatenate([x_v, x_i], axis=-1)
        cin = x.shape[-1]
        dg, k = self.deform_groups, 3
        raw = nn.Conv(3 * dg * k * k, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype, name="fusion_offset")(x)
        o1, o2, mask = jnp.split(raw, 3, axis=-1)
        # reference semantics (fusion_utils.py:56-57 + the mmcv kernel):
        # offset = cat(o1, o2) where the kernel reads each deform group's
        # 2*kh*kw slice as per-tap interleaved (dy, dx) pairs — with dg=2,
        # o1 IS group 0's interleaved pairs and o2 group 1's. Interleaving
        # o1/o2 (treating them as all-dy/all-dx) would scramble converted
        # fusion_offset weights across y/x and groups.
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(mask)
        w = self.param("fusion_kernel", nn.initializers.he_normal(),
                       (k, k, cin, self.out_channels))
        x = modulated_deform_conv2d(x, offset, mask, w,
                                    deform_groups=dg, padding=1)
        x = self._bn("fusion_bn", train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="fusion2")(x)
        x = self._bn("fusion2_bn", train)(x)
        return nn.relu(x)


class CatConvFusion(nn.Module):
    """RGBT_Fusion_Cat ablation (fusion_utils.py:86-110): 3 conv-BN-ReLU."""
    channels: int = 768
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    _bn = ConvFusion._bn

    @nn.compact
    def __call__(self, x_v, x_i, deterministic=True, train: bool = False):
        x = jnp.concatenate([x_v, x_i], axis=-1)
        for idx, ch in enumerate([2 * self.channels, self.channels, self.channels]):
            x = nn.Conv(ch, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        name=f"fusion{idx + 1}")(x)
            x = self._bn(f"fusion{idx + 1}_bn", train)(x)
            x = nn.relu(x)
        return x


# cfg.MODEL.FUSION_CLASS name -> constructor kwargs (mirrors the reference's
# globals()[FUSION_CLASS] dispatch, asymmetric_shared.py:418).
def build_fusion(fusion_class: str, channels: int, d_model: int, num_encoder_layers: int,
                 dtype=jnp.float32, name: str = "fusion_vi",
                 axis_name: Optional[str] = None):
    table = {
        "Attention_Fusion_1": dict(ln_specific=False, mode="raw_sum", attn_type="bimodal"),
        "Attention_Fusion_512": dict(ln_specific=False, mode="cat", attn_type="normal"),
        "Attention_Fusion_Bimodal": dict(ln_specific=False, mode="cat"),
        "Attention_Fusion_Bimodal_2": dict(ln_specific=False, mode="cat", attn_type="bimodal_2"),
        "Attention_Fusion_Bimodal_LNSpecific": dict(ln_specific=True, mode="cat"),
        "Attention_Fusion_Bimodal_LNSpecific_Sum": dict(ln_specific=True, mode="sum"),
        "Attention_Fusion_Bimodal_LNSpecific_2": dict(ln_specific=True, mode="shared_sum"),
    }
    if fusion_class in table:
        return AttentionFusionBimodal(channels=channels, d_model=d_model,
                                      num_encoder_layers=num_encoder_layers,
                                      dtype=dtype, name=name, **table[fusion_class])
    if fusion_class == "RGBT_Fusion_1":
        return ConvFusion(out_channels=channels, axis_name=axis_name,
                          dtype=dtype, name=name)
    if fusion_class == "RGBT_Fusion_2":
        return DeformConvFusion(out_channels=channels, deform_groups=2,
                                axis_name=axis_name, dtype=dtype, name=name)
    if fusion_class == "RGBT_Fusion_3":
        # Pack variant (fusion_utils.py:65-83): same modulated deformable
        # conv with internally predicted offsets, deform_groups=1.
        return DeformConvFusion(out_channels=channels, deform_groups=1,
                                axis_name=axis_name, dtype=dtype, name=name)
    if fusion_class == "RGBT_Fusion_Cat":
        return CatConvFusion(channels=channels, axis_name=axis_name,
                             dtype=dtype, name=name)
    raise ValueError(f"Unknown FUSION_CLASS {fusion_class}")
