"""Learned DiMP / ATOM network modules, reference-exact and
weight-convertible.

Parity targets (checkpoint layout = pytracking's DiMPnet / ATOMnet):
  external/AR/ltr/models/target_classifier/features.py:9-69
    (residual_basic_block / residual_bottleneck classification features),
  external/AR/ltr/models/target_classifier/initializer.py:9-45,118-173
    (FilterPool, FilterInitializerLinear),
  external/AR/ltr/models/target_classifier/optimizer.py:11-170
    (DiMPSteepestDescentGN: distance-map label/mask/weight predictors,
    learned step length + filter reg, unrolled SD Gauss-Newton),
  external/AR/ltr/models/layers/filter.py (apply_filter/apply_feat_transpose),
  external/AR/ltr/models/layers/distance.py (DistanceMap),
  external/AR/ltr/models/layers/normalization.py (InstanceL2Norm),
  external/AR/ltr/models/bbreg/atom_iou_net.py:15-179 (AtomIoUNet),
  external/AR/ltr/models/tracking/dimpnet.py:100-198 (dimpnet18/50 assembly).

TPU-first notes: every op is static-shape; the SD-GN unroll is a fixed-trip
loop of convs + reductions (one fused XLA program, no Python re-entry per
iteration like the reference); apply_feat_transpose is jax.vjp of the filter
correlation (exact transpose, no conv_transpose bookkeeping); BatchNorms are
frozen affines (converted checkpoints run in eval mode). Layout is NHWC; the
torch Sequential indices are mirrored in child-module names (seq0, seq1, ...)
so state dicts convert mechanically (utils/torch_convert.map_dimpnet_key).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.cvt import FrozenBatchNorm
from multi_modal_tracking_tpu.models.resnet import BasicBlock
from multi_modal_tracking_tpu.ops.prroi import prroi_pool


# --------------------------------------------------------------------------
# layers/normalization.py InstanceL2Norm (size_average=True)
def instance_l2norm(x: jax.Array, scale: float, eps: float = 1e-5) -> jax.Array:
    """x: (N, H, W, C); normalise each sample to RMS 1 then scale."""
    n = x.shape[1] * x.shape[2] * x.shape[3]
    ss = jnp.sum(jnp.square(x), axis=(1, 2, 3), keepdims=True)
    return x * (scale * jnp.sqrt(n / (ss + eps)))


class ClfFeatures(nn.Module):
    """Classification feature extractor (features.py residual_basic_block /
    residual_bottleneck with num_blocks residual blocks + final 3x3 conv +
    InstanceL2Norm). dimp18: num_blocks=1, feature_dim=256, out_dim=256;
    dimp50: num_blocks=0, input 1024 -> out_dim 512 (just the final conv).
    Child names mirror the torch nn.Sequential indices."""
    feature_dim: int = 256
    out_dim: int = 512
    num_blocks: int = 0
    filter_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = BasicBlock(self.feature_dim, dtype=self.dtype,
                           name=f"seq{i}")(x)
        x = nn.Conv(self.out_dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"seq{self.num_blocks}")(x)
        norm_scale = math.sqrt(1.0 / (self.out_dim * self.filter_size ** 2))
        return instance_l2norm(x, norm_scale)


# --------------------------------------------------------------------------
def filter_pool(feat: jax.Array, bb_xywh: jax.Array, filter_size: int,
                feat_stride: int) -> jax.Array:
    """initializer.py FilterPool: PrRoI-pool each sample's target box to
    (filter_size, filter_size). feat (N, H, W, C); bb (N, 4) xywh image px."""
    n = bb_xywh.shape[0]
    xyxy = jnp.concatenate([bb_xywh[:, :2], bb_xywh[:, :2] + bb_xywh[:, 2:]],
                           axis=1)
    rois = jnp.concatenate([jnp.arange(n, dtype=jnp.float32)[:, None], xyxy],
                           axis=1)
    return prroi_pool(feat, rois, filter_size, filter_size,
                      1.0 / feat_stride)


class FilterInitializerLinear(nn.Module):
    """initializer.py FilterInitializerLinear: 3x3 conv, pool the target
    region, average over samples. Returns (fs, fs, C)."""
    feature_dim: int = 512
    filter_size: int = 4
    feat_stride: int = 16
    filter_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, bb_xywh: jax.Array) -> jax.Array:
        feat = nn.Conv(self.feature_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="filter_conv")(feat)
        weights = filter_pool(feat, bb_xywh, self.filter_size,
                              self.feat_stride)           # (N, fs, fs, C)
        weights = jnp.mean(weights, axis=0)
        if self.filter_norm:
            weights = weights / (self.filter_size ** 2 * self.feature_dim)
        return weights


# --------------------------------------------------------------------------
def apply_filter(feat: jax.Array, weights: jax.Array) -> jax.Array:
    """filter.py apply_filter for one sequence: correlate the (fh, fw, C)
    filter over (N, H, W, C) features with torch's padding = ksz // 2 (an
    even filter therefore yields (H+1, W+1) scores)."""
    fh, fw = weights.shape[0], weights.shape[1]
    return jax.lax.conv_general_dilated(
        feat, weights[..., None], (1, 1),
        [(fh // 2, fh // 2), (fw // 2, fw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]


def apply_feat_transpose(feat: jax.Array, residuals: jax.Array,
                         filter_shape: Tuple[int, int, int]) -> jax.Array:
    """filter.py apply_feat_transpose: exact transpose of apply_filter wrt
    the filter, via jax.vjp (the reference hand-rolls it with
    conv_transpose2d; the VJP is the same linear map)."""
    zero = jnp.zeros(filter_shape, feat.dtype)
    _, vjp = jax.vjp(lambda w: apply_filter(feat, w), zero)
    return vjp(residuals)[0]


def distance_map(center_yx: jax.Array, output_sz: Tuple[int, int],
                 num_bins: int, bin_displacement: float = 1.0) -> jax.Array:
    """layers/distance.py DistanceMap: soft-binned radial distance from
    center. center (N, 2) (y, x); returns (N, H, W, bins) [NHWC]."""
    bins = jnp.arange(num_bins, dtype=jnp.float32)
    k0 = jnp.arange(output_sz[0], dtype=jnp.float32)
    k1 = jnp.arange(output_sz[1], dtype=jnp.float32)
    d0 = k0[None, :, None] - center_yx[:, 0][:, None, None]
    d1 = k1[None, None, :] - center_yx[:, 1][:, None, None]
    dist = jnp.sqrt(d0 * d0 + d1 * d1)                      # (N, H, W)
    diff = dist[..., None] / bin_displacement - bins        # (N, H, W, bins)
    last = jnp.clip(1.0 + diff[..., -1:], 0.0, 1.0)
    rest = jax.nn.relu(1.0 - jnp.abs(diff[..., :-1]))
    return jnp.concatenate([rest, last], axis=-1)


def _gauss_bin_init(num_bins: int, bin_displacement: float,
                    init_gauss_sigma: float):
    d = jnp.arange(num_bins, dtype=jnp.float32) * bin_displacement
    if init_gauss_sigma == 0:
        g = jnp.zeros((num_bins,)).at[0].set(1.0)
    else:
        g = jnp.exp(-0.5 * (d / init_gauss_sigma) ** 2)
    return (g - g.min()).reshape(num_bins, 1)


class DiMPSteepestDescentGN(nn.Module):
    """optimizer.py DiMPSteepestDescentGN for one sequence: unrolled steepest
    descent with Gauss-Newton step length on the hinged discriminative loss,
    with the learned label map / target mask / spatial weight predictors
    (1x1 convs over the distance-map bins) and learned step length + filter
    regularisation.

    __call__(weights (fh, fw, C), feat (N, H, W, C), bb (N, 4) xywh image px,
    sample_weight None | (N,)) -> optimized weights."""
    num_iter: int = 5
    feat_stride: int = 16
    init_step_length: float = 1.0
    init_filter_reg: float = 1e-2
    init_gauss_sigma: float = 1.0
    num_dist_bins: int = 5
    bin_displacement: float = 1.0
    mask_init_factor: float = 4.0
    min_filter_reg: float = 1e-3
    alpha_eps: float = 0.0

    @nn.compact
    def __call__(self, weights: jax.Array, feat: jax.Array, bb: jax.Array,
                 sample_weight: Optional[jax.Array] = None,
                 num_iter: Optional[int] = None) -> jax.Array:
        num_iter = self.num_iter if num_iter is None else num_iter
        n = feat.shape[0]
        fh, fw = weights.shape[0], weights.shape[1]
        out_sz = (feat.shape[1] + (fh + 1) % 2, feat.shape[2] + (fw + 1) % 2)

        log_step = self.param(
            "log_step_length",
            lambda k: math.log(self.init_step_length) * jnp.ones((1,)))
        filter_reg = self.param(
            "filter_reg", lambda k: self.init_filter_reg * jnp.ones((1,)))
        # the three 1x1 predictors over distance bins, stored (bins, 1) like
        # the torch conv weight (1, bins, 1, 1) squeezed
        label_w = self.param(
            "label_map_predictor",
            lambda k: _gauss_bin_init(self.num_dist_bins,
                                      self.bin_displacement,
                                      self.init_gauss_sigma))
        d = jnp.arange(self.num_dist_bins,
                       dtype=jnp.float32) * self.bin_displacement
        mask_w = self.param(
            "target_mask_predictor",
            lambda k: (self.mask_init_factor
                       * jnp.tanh(2.0 - d)).reshape(self.num_dist_bins, 1))
        weight_w = self.param(
            "spatial_weight_predictor",
            lambda k: jnp.ones((self.num_dist_bins, 1)))

        step_length = jnp.exp(log_step)
        reg = jnp.clip(filter_reg * filter_reg, self.min_filter_reg ** 2)

        offset = jnp.asarray([fh % 2, fw % 2], jnp.float32) / 2.0
        center = jnp.flip((bb[:, :2] + bb[:, 2:] / 2.0) / self.feat_stride,
                          axis=1) - offset                 # (N, 2) (y, x)
        dmap = distance_map(center, out_sz, self.num_dist_bins,
                            self.bin_displacement)          # (N, H, W, bins)
        label = (dmap @ label_w)[..., 0]                   # (N, H, W)
        mask = jax.nn.sigmoid((dmap @ mask_w)[..., 0])
        spatial_w = (dmap @ weight_w)[..., 0]

        if sample_weight is None:
            sw = math.sqrt(1.0 / n) * spatial_w
        else:
            sw = jnp.sqrt(sample_weight)[:, None, None] * spatial_w

        def step(w, _):
            scores = apply_filter(feat, w)
            # LeakyReluPar activation and its derivative wrt scores
            s_act = (1.0 - mask) / 2.0 * jnp.abs(scores) + \
                (1.0 + mask) / 2.0 * scores
            s_grad_mask = (1.0 - mask) / 2.0 * jnp.sign(scores) + \
                (1.0 + mask) / 2.0
            residuals = sw * (s_act - label)
            mapped = s_grad_mask * (sw * residuals)
            w_grad = apply_feat_transpose(feat, mapped, w.shape) + reg * w
            s_grad = sw * (s_grad_mask * apply_filter(feat, w_grad))
            a_num = jnp.sum(w_grad * w_grad)
            a_den = jnp.clip(jnp.sum(s_grad * s_grad)
                             + (reg + self.alpha_eps) * a_num, 1e-8)
            return w - (step_length * a_num / a_den) * w_grad, None

        weights, _ = jax.lax.scan(step, weights, None, length=num_iter)
        return weights


# --------------------------------------------------------------------------
class ConvBNRelu(nn.Module):
    """atom_iou_net.py conv(): Conv2d(bias) + BatchNorm2d + ReLU. Frozen BN
    (eval-mode affine) for converted checkpoints."""
    features: int
    kernel: int = 3
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=self.padding, dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class LinearBlock(nn.Module):
    """layers/blocks.py LinearBlock: flatten -> Linear -> BatchNorm2d(on
    (N, C, 1, 1)) -> ReLU. The flatten follows torch's NCHW ordering, so the
    converted Dense kernel is permuted accordingly (torch_convert)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, C) pooled maps -> flatten in torch (C, H, W) order
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.Dense(self.features, dtype=self.dtype, name="linear")(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _rois(boxes_xyxy: jax.Array, batch_index: Optional[jax.Array] = None):
    n = boxes_xyxy.shape[0]
    idx = (jnp.arange(n, dtype=jnp.float32) if batch_index is None
           else batch_index.astype(jnp.float32))
    return jnp.concatenate([idx[:, None], boxes_xyxy], axis=1)


class AtomIoUNet(nn.Module):
    """atom_iou_net.py AtomIoUNet: two backbone scales (layer2 @ /8,
    layer3 @ /16); the reference branch produces per-target modulation
    vectors, the test branch scores candidate boxes. Reference-exact layer
    layout -> published ATOM/DiMP `bb_regressor.*` weights convert 1:1.

    input_dim: backbone channels (layer2, layer3) — (128, 256) for
    ResNet-18 (atomnet), (512, 1024) for ResNet-50 (dimpnet50)."""
    input_dim: Tuple[int, int] = (128, 256)
    pred_input_dim: Tuple[int, int] = (256, 256)
    pred_inter_dim: Tuple[int, int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dt = self.dtype
        self.conv3_1r = ConvBNRelu(128, 3, 1, dt)
        self.conv3_1t = ConvBNRelu(256, 3, 1, dt)
        self.conv3_2t = ConvBNRelu(self.pred_input_dim[0], 3, 1, dt)
        self.fc3_1r = ConvBNRelu(256, 3, 0, dt)
        self.conv4_1r = ConvBNRelu(256, 3, 1, dt)
        self.conv4_1t = ConvBNRelu(256, 3, 1, dt)
        self.conv4_2t = ConvBNRelu(self.pred_input_dim[1], 3, 1, dt)
        self.fc34_3r = ConvBNRelu(self.pred_input_dim[0], 1, 0, dt)
        self.fc34_4r = ConvBNRelu(self.pred_input_dim[1], 1, 0, dt)
        self.fc3_rt = LinearBlock(self.pred_inter_dim[0], dt)
        self.fc4_rt = LinearBlock(self.pred_inter_dim[1], dt)
        self.iou_predictor = nn.Dense(1, dtype=dt)

    def get_modulation(self, feat3: jax.Array, feat4: jax.Array,
                       bb_xywh: jax.Array):
        """Reference-branch modulation vectors. feat3 (B, H, W, C2) @ /8,
        feat4 (B, H', W', C3) @ /16, bb (B, 4) xywh crop px.
        Returns two (B, pred_input_dim) vectors."""
        c3_r = self.conv3_1r(feat3)
        xyxy = jnp.concatenate([bb_xywh[:, :2],
                                bb_xywh[:, :2] + bb_xywh[:, 2:]], axis=1)
        roi = _rois(xyxy)
        roi3r = prroi_pool(c3_r, roi, 3, 3, 1.0 / 8)        # (B, 3, 3, 128)
        c4_r = self.conv4_1r(feat4)
        roi4r = prroi_pool(c4_r, roi, 1, 1, 1.0 / 16)       # (B, 1, 1, 256)
        fc3_r = self.fc3_1r(roi3r)                          # (B, 1, 1, 256)
        fc34_r = jnp.concatenate([fc3_r, roi4r], axis=-1)   # (B, 1, 1, 512)
        return (self.fc34_3r(fc34_r)[:, 0, 0],
                self.fc34_4r(fc34_r)[:, 0, 0])

    def get_iou_feat(self, feat3: jax.Array, feat4: jax.Array):
        """Test-branch features for IoU prediction."""
        return (self.conv3_2t(self.conv3_1t(feat3)),
                self.conv4_2t(self.conv4_1t(feat4)))

    def predict_iou(self, modulation, feat, proposals_xywh: jax.Array):
        """IoU for proposals (B, P, 4) xywh crop px; modulation/feat from the
        two methods above. Returns (B, P)."""
        mod3, mod4 = modulation
        c3_t, c4_t = feat
        B, P = proposals_xywh.shape[:2]
        c3_att = c3_t * mod3[:, None, None, :]
        c4_att = c4_t * mod4[:, None, None, :]
        prop = proposals_xywh.reshape(B * P, 4)
        xyxy = jnp.concatenate([prop[:, :2], prop[:, :2] + prop[:, 2:]],
                               axis=1)
        bidx = jnp.repeat(jnp.arange(B, dtype=jnp.float32), P)
        roi = _rois(xyxy, bidx)
        roi3t = prroi_pool(c3_att, roi, 5, 5, 1.0 / 8)      # (BP, 5, 5, 256)
        roi4t = prroi_pool(c4_att, roi, 3, 3, 1.0 / 16)     # (BP, 3, 3, 256)
        x = jnp.concatenate([self.fc3_rt(roi3t), self.fc4_rt(roi4t)], axis=1)
        return self.iou_predictor(x).reshape(B, P)

    def __call__(self, feat3_r, feat4_r, feat3_t, feat4_t, bb_xywh,
                 proposals_xywh):
        """Training-style forward (AtomIoUNet.forward, single train frame):
        modulation from the reference frames, IoU for proposals on test."""
        modulation = self.get_modulation(feat3_r, feat4_r, bb_xywh)
        feat = self.get_iou_feat(feat3_t, feat4_t)
        return self.predict_iou(modulation, feat, proposals_xywh)


# --------------------------------------------------------------------------
class DiMPClassifier(nn.Module):
    """linear_filter.py LinearFilter: feature extractor + initializer +
    optimizer, single-sequence tracking form."""
    feature_dim: int = 256
    out_dim: int = 512
    num_blocks: int = 0
    filter_size: int = 4
    feat_stride: int = 16
    optim_iter: int = 5
    init_step_length: float = 1.0
    init_filter_reg: float = 1e-2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feature_extractor = ClfFeatures(
            self.feature_dim, self.out_dim, self.num_blocks,
            self.filter_size, self.dtype)
        self.filter_initializer = FilterInitializerLinear(
            self.out_dim, self.filter_size, self.feat_stride,
            dtype=self.dtype)
        self.filter_optimizer = DiMPSteepestDescentGN(
            self.optim_iter, self.feat_stride, self.init_step_length,
            self.init_filter_reg)

    def extract_classification_feat(self, backbone_feat):
        return self.feature_extractor(backbone_feat)

    def get_filter(self, clf_feat, bb_xywh, sample_weight=None,
                   num_iter=None):
        """Initialize + optimize the filter on classification features."""
        weights = self.filter_initializer(clf_feat, bb_xywh)
        return self.filter_optimizer(weights, clf_feat, bb_xywh,
                                     sample_weight, num_iter)

    def optimize_filter(self, weights, clf_feat, bb_xywh, sample_weight=None,
                        num_iter=None):
        return self.filter_optimizer(weights, clf_feat, bb_xywh,
                                     sample_weight, num_iter)

    def classify(self, weights, clf_feat):
        return apply_filter(clf_feat, weights)

    def __call__(self, backbone_feat, bb_xywh):
        """Training-style forward (LinearFilter.forward): extract features,
        learn a filter, score the same samples."""
        f = self.feature_extractor(backbone_feat)
        w = self.get_filter(f, bb_xywh)
        return self.classify(w, f)
