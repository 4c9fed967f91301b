"""DiMP/ATOM learned-module checkpoint parity: reference-exact PyTorch twins
of the pytracking modules are built with the REFERENCE's parameter naming,
their state dicts converted through utils/torch_convert.map_dimpnet_key, and
the flax classic/dimpnet modules must reproduce the oracle outputs.

Oracle parity targets:
  external/AR/ltr/models/target_classifier/features.py:9-28
    (residual_basic_block: BasicBlock + final conv + InstanceL2Norm)
  external/AR/ltr/models/target_classifier/initializer.py:9-45,118-173
    (FilterPool + FilterInitializerLinear)
  external/AR/ltr/models/target_classifier/optimizer.py:11-170
    (DiMPSteepestDescentGN with learned label/mask/weight predictors)
  external/AR/ltr/models/layers/filter.py (apply_filter/apply_feat_transpose)
  external/AR/ltr/models/bbreg/atom_iou_net.py:15-179 (AtomIoUNet)

PrRoI pooling is evaluated with the same closed-form hat-integral math on
both sides (the CUDA kernel has no CPU torch twin); the jax implementation
is independently oracle-tested in tests/test_prroi.py.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.classic import dimpnet as D
from multi_modal_tracking_tpu.utils.torch_convert import (convert_state_dict,
                                                          map_dimpnet_key)

torch.manual_seed(0)


# ------------------------------------------------------------- torch oracle
def _hat_cdf_t(u):
    u = u.clamp(-1.0, 1.0)
    return torch.where(u <= 0, 0.5 * (u + 1.0) ** 2, 0.5 + u - 0.5 * u * u)


def _axis_mat_t(extent, pooled, lo, hi):
    bw = (hi - lo) / pooled
    k = torch.arange(pooled, dtype=torch.float32)
    a = lo + k * bw
    b = a + bw
    p = torch.arange(extent, dtype=torch.float32)[None]
    return _hat_cdf_t(b[:, None] - p) - _hat_cdf_t(a[:, None] - p)


class PrRoIPool2D(nn.Module):
    """Closed-form PrRoI forward (same math as ops/prroi.py)."""

    def __init__(self, ph, pw, scale):
        super().__init__()
        self.ph, self.pw, self.scale = ph, pw, scale

    def forward(self, feat, rois):
        H, W = feat.shape[-2:]
        out = []
        for r in rois:
            b = int(r[0])
            x0, y0, x1, y1 = (r[1:] * self.scale).tolist()
            ay = _axis_mat_t(H, self.ph, y0, y1)
            ax = _axis_mat_t(W, self.pw, x0, x1)
            tmp = torch.einsum("ph,chw->cpw", ay, feat[b])
            o = torch.einsum("qw,cpw->cpq", ax, tmp)
            area = ((y1 - y0) / self.ph) * ((x1 - x0) / self.pw)
            out.append(o / max(area, 1e-12))
        return torch.stack(out)


class InstanceL2Norm(nn.Module):
    def __init__(self, scale):
        super().__init__()
        self.scale = scale

    def forward(self, x):
        n = x.shape[1] * x.shape[2] * x.shape[3]
        ss = (x * x).reshape(x.shape[0], 1, 1, -1).sum(dim=3, keepdim=True)
        return x * (self.scale * (n / (ss + 1e-5)).sqrt())


def _conv_bn_relu(cin, cout, k=3, pad=1):
    return nn.Sequential(nn.Conv2d(cin, cout, k, padding=pad, bias=True),
                         nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


class LinearBlock(nn.Module):
    def __init__(self, in_planes, out_planes, input_sz):
        super().__init__()
        self.linear = nn.Linear(in_planes * input_sz * input_sz, out_planes)
        self.bn = nn.BatchNorm2d(out_planes)

    def forward(self, x):
        x = self.linear(x.reshape(x.shape[0], -1))
        x = self.bn(x.reshape(x.shape[0], x.shape[1], 1, 1))
        return F.relu(x).reshape(x.shape[0], -1)


class AtomIoUNetOracle(nn.Module):
    """atom_iou_net.py AtomIoUNet (ResNet-18 dims) with reference naming."""

    def __init__(self, input_dim=(128, 256), pred_input_dim=(256, 256),
                 pred_inter_dim=(256, 256)):
        super().__init__()
        self.conv3_1r = _conv_bn_relu(input_dim[0], 128)
        self.conv3_1t = _conv_bn_relu(input_dim[0], 256)
        self.conv3_2t = _conv_bn_relu(256, pred_input_dim[0])
        self.prroi_pool3r = PrRoIPool2D(3, 3, 1 / 8)
        self.prroi_pool3t = PrRoIPool2D(5, 5, 1 / 8)
        self.fc3_1r = _conv_bn_relu(128, 256, k=3, pad=0)
        self.conv4_1r = _conv_bn_relu(input_dim[1], 256)
        self.conv4_1t = _conv_bn_relu(input_dim[1], 256)
        self.conv4_2t = _conv_bn_relu(256, pred_input_dim[1])
        self.prroi_pool4r = PrRoIPool2D(1, 1, 1 / 16)
        self.prroi_pool4t = PrRoIPool2D(3, 3, 1 / 16)
        self.fc34_3r = _conv_bn_relu(256 + 256, pred_input_dim[0], k=1, pad=0)
        self.fc34_4r = _conv_bn_relu(256 + 256, pred_input_dim[1], k=1, pad=0)
        self.fc3_rt = LinearBlock(pred_input_dim[0], pred_inter_dim[0], 5)
        self.fc4_rt = LinearBlock(pred_input_dim[1], pred_inter_dim[1], 3)
        self.iou_predictor = nn.Linear(pred_inter_dim[0] + pred_inter_dim[1], 1)

    def get_modulation(self, feat, bb):
        feat3_r, feat4_r = feat
        c3_r = self.conv3_1r(feat3_r)
        batch_index = torch.arange(bb.shape[0], dtype=torch.float32)[:, None]
        bb = bb.clone()
        bb[:, 2:4] = bb[:, 0:2] + bb[:, 2:4]
        roi1 = torch.cat((batch_index, bb), dim=1)
        roi3r = self.prroi_pool3r(c3_r, roi1)
        c4_r = self.conv4_1r(feat4_r)
        roi4r = self.prroi_pool4r(c4_r, roi1)
        fc3_r = self.fc3_1r(roi3r)
        fc34_r = torch.cat((fc3_r, roi4r), dim=1)
        return self.fc34_3r(fc34_r), self.fc34_4r(fc34_r)

    def get_iou_feat(self, feat2):
        feat3_t, feat4_t = feat2
        return (self.conv3_2t(self.conv3_1t(feat3_t)),
                self.conv4_2t(self.conv4_1t(feat4_t)))

    def predict_iou(self, modulation, feat, proposals):
        fc34_3_r, fc34_4_r = modulation
        c3_t, c4_t = feat
        batch = c3_t.shape[0]
        c3_att = c3_t * fc34_3_r.reshape(batch, -1, 1, 1)
        c4_att = c4_t * fc34_4_r.reshape(batch, -1, 1, 1)
        num_prop = proposals.shape[1]
        prop_xyxy = torch.cat((proposals[:, :, 0:2],
                               proposals[:, :, 0:2] + proposals[:, :, 2:4]),
                              dim=2)
        bidx = torch.arange(batch, dtype=torch.float32).reshape(-1, 1, 1)
        roi2 = torch.cat((bidx.expand(-1, num_prop, -1), prop_xyxy),
                         dim=2).reshape(-1, 5)
        fc3_rt = self.fc3_rt(self.prroi_pool3t(c3_att, roi2))
        fc4_rt = self.fc4_rt(self.prroi_pool4t(c4_att, roi2))
        return self.iou_predictor(torch.cat((fc3_rt, fc4_rt),
                                            dim=1)).reshape(batch, num_prop)


class BasicBlockOracle(nn.Module):
    def __init__(self, planes):
        super().__init__()
        self.conv1 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(out)) + x)


def clf_features_oracle(feature_dim, out_dim, num_blocks, filter_size):
    """features.py residual_basic_block / residual_bottleneck(num_blocks=0)"""
    norm_scale = math.sqrt(1.0 / (out_dim * filter_size ** 2))
    layers = [BasicBlockOracle(feature_dim) for _ in range(num_blocks)]
    layers.append(nn.Conv2d(feature_dim, out_dim, 3, padding=1, bias=False))
    layers.append(InstanceL2Norm(norm_scale))
    return nn.Sequential(*layers)


class FilterInitializerLinearOracle(nn.Module):
    def __init__(self, filter_size, feature_dim, feat_stride):
        super().__init__()
        self.filter_conv = nn.Conv2d(feature_dim, feature_dim, 3, padding=1)
        self.filter_pool = PrRoIPool2D(filter_size, filter_size,
                                       1 / feat_stride)

    def forward(self, feat, bb):
        num_images = feat.shape[0]
        feat = self.filter_conv(feat)
        bb = bb.clone()
        bb[:, 2:4] = bb[:, 0:2] + bb[:, 2:4]
        idx = torch.arange(bb.shape[0], dtype=torch.float32)[:, None]
        weights = self.filter_pool(feat, torch.cat((idx, bb), dim=1))
        if num_images > 1:
            weights = weights.mean(dim=0, keepdim=True)
        return weights


class DistanceMapOracle(nn.Module):
    def __init__(self, num_bins, bin_displacement=1.0):
        super().__init__()
        self.num_bins, self.bin_displacement = num_bins, bin_displacement

    def forward(self, center, output_sz):
        center = center.reshape(-1, 2)
        bins = torch.arange(self.num_bins,
                            dtype=torch.float32).reshape(1, -1, 1, 1)
        k0 = torch.arange(output_sz[0], dtype=torch.float32).reshape(1, 1, -1, 1)
        k1 = torch.arange(output_sz[1], dtype=torch.float32).reshape(1, 1, 1, -1)
        d0 = k0 - center[:, 0].reshape(-1, 1, 1, 1)
        d1 = k1 - center[:, 1].reshape(-1, 1, 1, 1)
        dist = (d0 * d0 + d1 * d1).sqrt()
        bin_diff = dist / self.bin_displacement - bins
        return torch.cat((F.relu(1.0 - bin_diff[:, :-1].abs()),
                          (1.0 + bin_diff[:, -1:]).clamp(0, 1)), dim=1)


def _apply_filter_t(feat, weights):
    pad = (weights.shape[-2] // 2, weights.shape[-1] // 2)
    return F.conv2d(feat, weights, padding=pad)


def _apply_feat_transpose_t(feat, residuals, w_shape):
    w = torch.zeros(w_shape, requires_grad=True)
    s = _apply_filter_t(feat.detach(), w)
    s.backward(residuals.detach())
    return w.grad.detach()


class SDGNOracle(nn.Module):
    """optimizer.py DiMPSteepestDescentGN, num_sequences=1; the feat
    transpose uses autograd (the unique transpose of the same linear map as
    the reference's _apply_feat_transpose_v3)."""

    def __init__(self, num_iter, feat_stride, num_dist_bins=5,
                 bin_displacement=1.0, min_filter_reg=1e-3, alpha_eps=0.0):
        super().__init__()
        self.num_iter, self.feat_stride = num_iter, feat_stride
        self.min_filter_reg, self.alpha_eps = min_filter_reg, alpha_eps
        self.log_step_length = nn.Parameter(torch.zeros(1))
        self.filter_reg = nn.Parameter(0.01 * torch.ones(1))
        self.distance_map = DistanceMapOracle(num_dist_bins, bin_displacement)
        self.label_map_predictor = nn.Conv2d(num_dist_bins, 1, 1, bias=False)
        self.target_mask_predictor = nn.Sequential(
            nn.Conv2d(num_dist_bins, 1, 1, bias=False), nn.Sigmoid())
        self.spatial_weight_predictor = nn.Conv2d(num_dist_bins, 1, 1,
                                                  bias=False)

    def forward(self, weights, feat, bb, sample_weight=None):
        num_images = feat.shape[0]
        filter_sz = (weights.shape[-2], weights.shape[-1])
        output_sz = (feat.shape[-2] + (weights.shape[-2] + 1) % 2,
                     feat.shape[-1] + (weights.shape[-1] + 1) % 2)
        step_length = torch.exp(self.log_step_length)
        reg = (self.filter_reg * self.filter_reg).clamp(
            min=self.min_filter_reg ** 2)
        offset = (torch.tensor(filter_sz, dtype=torch.float32) % 2) / 2.0
        center = ((bb[..., :2] + bb[..., 2:] / 2) /
                  self.feat_stride).reshape(-1, 2).flip((1,)) - offset
        dmap = self.distance_map(center, output_sz)
        label = self.label_map_predictor(dmap)[:, 0]
        mask = self.target_mask_predictor(dmap)[:, 0]
        spatial_w = self.spatial_weight_predictor(dmap)[:, 0]
        if sample_weight is None:
            sw = math.sqrt(1.0 / num_images) * spatial_w
        else:
            sw = sample_weight.sqrt().reshape(-1, 1, 1) * spatial_w
        for _ in range(self.num_iter):
            scores = _apply_filter_t(feat, weights)[:, 0]
            s_act = (1 - mask) / 2 * scores.abs() + (1 + mask) / 2 * scores
            s_mask = (1 - mask) / 2 * scores.sign() + (1 + mask) / 2
            residuals = sw * (s_act - label)
            mapped = (s_mask * (sw * residuals))[:, None]
            w_grad = _apply_feat_transpose_t(feat, mapped,
                                             weights.shape) + reg * weights
            s_grad = sw * (s_mask * _apply_filter_t(feat, w_grad)[:, 0])
            a_num = (w_grad * w_grad).sum()
            a_den = ((s_grad * s_grad).sum()
                     + (reg + self.alpha_eps) * a_num).clamp(1e-8)
            weights = weights - (step_length * a_num / a_den) * w_grad
        return weights


# ----------------------------------------------------------------- helpers
def _sd(module, prefix):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


def _randomize_bn(module):
    """Random affine + running stats so conversion of every BN leaf is
    actually load-bearing (torch init is all-ones/zeros)."""
    g = torch.Generator().manual_seed(7)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.weight.data.uniform_(0.5, 1.5, generator=g)
            m.bias.data.uniform_(-0.3, 0.3, generator=g)
            m.running_mean.uniform_(-0.2, 0.2, generator=g)
            m.running_var.uniform_(0.6, 1.4, generator=g)


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _convert(sd, variables):
    new_vars, report = convert_state_dict(sd, variables, strict=True,
                                          verbose=False,
                                          key_mapper=map_dimpnet_key)
    assert not report["shape_mismatch"]
    return new_vars


# ------------------------------------------------------------------- tests
FEAT_DIM, OUT_DIM, FS, STRIDE = 24, 16, 4, 16


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(3)


def test_clf_features_parity_dimp50_layout(rng):
    """num_blocks=0: bare final conv + InstanceL2Norm (dimpnet50)."""
    oracle = clf_features_oracle(FEAT_DIM, OUT_DIM, 0, FS).eval()
    x = torch.tensor(rng.standard_normal((2, FEAT_DIM, 9, 9)),
                     dtype=torch.float32)
    want = oracle(x).detach().numpy()

    model = D.ClfFeatures(FEAT_DIM, OUT_DIM, num_blocks=0, filter_size=FS)
    variables = model.init(jax.random.PRNGKey(0), _nhwc(x))
    variables = _convert(_sd(oracle, "classifier.feature_extractor"),
                         {"params": {"classifier": {"feature_extractor":
                                                    variables["params"]}}})
    got = model.apply({"params":
                       variables["params"]["classifier"]["feature_extractor"]},
                      _nhwc(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5, rtol=1e-4)


def test_clf_features_parity_dimp18_layout(rng):
    """num_blocks=1: BasicBlock + final conv + InstanceL2Norm (dimpnet18)."""
    oracle = clf_features_oracle(FEAT_DIM, OUT_DIM, 1, FS).eval()
    _randomize_bn(oracle)
    x = torch.tensor(rng.standard_normal((2, FEAT_DIM, 9, 9)),
                     dtype=torch.float32)
    want = oracle(x).detach().numpy()

    model = D.ClfFeatures(FEAT_DIM, OUT_DIM, num_blocks=1, filter_size=FS)
    variables = model.init(jax.random.PRNGKey(0), _nhwc(x))
    wrapped = {c: {"classifier": {"feature_extractor": variables[c]}}
               for c in variables}
    converted = _convert(_sd(oracle, "classifier.feature_extractor"), wrapped)
    got = model.apply({c: converted[c]["classifier"]["feature_extractor"]
                       for c in converted}, _nhwc(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5, rtol=1e-4)


def _boxes(rng, n, lo=8.0, hi=96.0):
    xy = rng.uniform(lo, hi * 0.5, (n, 2))
    wh = rng.uniform(hi * 0.25, hi * 0.45, (n, 2))
    return np.concatenate([xy, wh], axis=1).astype(np.float32)


def test_filter_initializer_parity(rng):
    oracle = FilterInitializerLinearOracle(FS, OUT_DIM, STRIDE).eval()
    feat = torch.tensor(rng.standard_normal((3, OUT_DIM, 9, 9)),
                        dtype=torch.float32)
    bb = torch.tensor(_boxes(rng, 3, hi=9 * STRIDE))
    want = oracle(feat, bb).detach().numpy()    # (1, C, fs, fs)

    model = D.FilterInitializerLinear(OUT_DIM, FS, STRIDE)
    variables = model.init(jax.random.PRNGKey(0), _nhwc(feat),
                           jnp.asarray(bb.numpy()))
    wrapped = {"params": {"classifier": {"filter_initializer":
                                         variables["params"]}}}
    converted = _convert(_sd(oracle, "classifier.filter_initializer"), wrapped)
    got = model.apply({"params":
                       converted["params"]["classifier"]["filter_initializer"]},
                      _nhwc(feat), jnp.asarray(bb.numpy()))
    np.testing.assert_allclose(np.asarray(got).transpose(2, 0, 1), want[0],
                               atol=1e-5, rtol=1e-4)


def test_sd_gn_optimizer_parity(rng):
    """Three unrolled SD-GN iterations with randomized learned scalars and
    bin predictors must match the torch oracle exactly."""
    oracle = SDGNOracle(num_iter=3, feat_stride=STRIDE).eval()
    with torch.no_grad():
        oracle.log_step_length.fill_(-0.3)
        oracle.filter_reg.fill_(0.05)
        g = torch.Generator().manual_seed(11)
        oracle.label_map_predictor.weight.uniform_(0.0, 1.0, generator=g)
        oracle.target_mask_predictor[0].weight.uniform_(-2.0, 2.0, generator=g)
        oracle.spatial_weight_predictor.weight.uniform_(0.5, 1.5, generator=g)

    feat = torch.tensor(rng.standard_normal((3, OUT_DIM, 9, 9)),
                        dtype=torch.float32)
    bb = torch.tensor(_boxes(rng, 3, hi=9 * STRIDE))
    w0 = torch.tensor(rng.standard_normal((1, OUT_DIM, FS, FS)) * 0.1,
                      dtype=torch.float32)
    sw = torch.tensor(rng.uniform(0.2, 1.0, (3,)), dtype=torch.float32)
    want = oracle(w0, feat, bb, sw).detach().numpy()[0]   # (C, fs, fs)

    model = D.DiMPSteepestDescentGN(num_iter=3, feat_stride=STRIDE)
    w0_j = jnp.asarray(w0.numpy()[0].transpose(1, 2, 0))
    args = (w0_j, _nhwc(feat), jnp.asarray(bb.numpy()),
            jnp.asarray(sw.numpy()))
    variables = model.init(jax.random.PRNGKey(0), *args)
    wrapped = {"params": {"classifier": {"filter_optimizer":
                                         variables["params"]}}}
    converted = _convert(_sd(oracle, "classifier.filter_optimizer"), wrapped)
    got = model.apply({"params":
                       converted["params"]["classifier"]["filter_optimizer"]},
                      *args)
    np.testing.assert_allclose(np.asarray(got).transpose(2, 0, 1), want,
                               atol=1e-4, rtol=1e-3)


def test_sd_gn_default_init_matches_reference():
    """Fresh flax params must equal the reference's documented init (gauss
    label, tanh mask, unit weight, log step, reg) — random-init tracking
    relies on these being meaningful."""
    model = D.DiMPSteepestDescentGN(num_iter=1)
    w = jnp.zeros((FS, FS, 8))
    feat = jnp.zeros((1, 9, 9, 8))
    bb = jnp.asarray([[10.0, 10.0, 40.0, 40.0]])
    p = model.init(jax.random.PRNGKey(0), w, feat, bb)["params"]
    d = np.arange(5, dtype=np.float32)
    gauss = np.exp(-0.5 * d ** 2)
    np.testing.assert_allclose(np.asarray(p["label_map_predictor"])[:, 0],
                               gauss - gauss.min(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p["target_mask_predictor"])[:, 0],
                               4.0 * np.tanh(2.0 - d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p["spatial_weight_predictor"]), 1.0)
    np.testing.assert_allclose(np.asarray(p["log_step_length"]), 0.0)
    np.testing.assert_allclose(np.asarray(p["filter_reg"]), 0.01)


def test_atom_iou_net_parity(rng):
    """Full modulation -> iou-feat -> predict path on two feature scales."""
    oracle = AtomIoUNetOracle().eval()
    _randomize_bn(oracle)
    B, P = 2, 3
    feat3_r = torch.tensor(rng.standard_normal((B, 128, 8, 8)),
                           dtype=torch.float32)
    feat4_r = torch.tensor(rng.standard_normal((B, 256, 4, 4)),
                           dtype=torch.float32)
    feat3_t = torch.tensor(rng.standard_normal((B, 128, 8, 8)),
                           dtype=torch.float32)
    feat4_t = torch.tensor(rng.standard_normal((B, 256, 4, 4)),
                           dtype=torch.float32)
    bb = torch.tensor(_boxes(rng, B, hi=60.0))
    prop = torch.tensor(
        np.stack([_boxes(rng, P, hi=60.0) for _ in range(B)]))
    mod = oracle.get_modulation([feat3_r, feat4_r], bb)
    iou_feat = oracle.get_iou_feat([feat3_t, feat4_t])
    want = oracle.predict_iou(mod, iou_feat, prop).detach().numpy()

    model = D.AtomIoUNet(input_dim=(128, 256))
    args = (_nhwc(feat3_r), _nhwc(feat4_r), _nhwc(feat3_t), _nhwc(feat4_t),
            jnp.asarray(bb.numpy()), jnp.asarray(prop.numpy()))
    variables = model.init(jax.random.PRNGKey(0), *args)
    wrapped = {c: {"bb_regressor": variables[c]} for c in variables}
    converted = _convert(_sd(oracle, "bb_regressor"), wrapped)
    got = model.apply({c: converted[c]["bb_regressor"] for c in converted},
                      *args)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_full_classifier_pipeline_parity(rng):
    """features -> initializer -> 2 optimizer iterations -> classify, as one
    converted DiMPClassifier (the tracker's actual call pattern)."""
    feats_o = clf_features_oracle(FEAT_DIM, OUT_DIM, 0, FS).eval()
    init_o = FilterInitializerLinearOracle(FS, OUT_DIM, STRIDE).eval()
    opt_o = SDGNOracle(num_iter=2, feat_stride=STRIDE).eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(13)
        opt_o.label_map_predictor.weight.uniform_(0.0, 1.0, generator=g)
        opt_o.target_mask_predictor[0].weight.uniform_(-2.0, 2.0, generator=g)
        opt_o.spatial_weight_predictor.weight.uniform_(0.5, 1.5, generator=g)

    x_train = torch.tensor(rng.standard_normal((3, FEAT_DIM, 9, 9)),
                           dtype=torch.float32)
    x_test = torch.tensor(rng.standard_normal((1, FEAT_DIM, 9, 9)),
                          dtype=torch.float32)
    bb = torch.tensor(_boxes(rng, 3, hi=9 * STRIDE))
    f_train = feats_o(x_train)
    f_test = feats_o(x_test)
    w = init_o(f_train, bb)
    w = opt_o(w, f_train, bb)
    want = _apply_filter_t(f_test, w)[:, 0].detach().numpy()

    model = D.DiMPClassifier(FEAT_DIM, OUT_DIM, num_blocks=0, filter_size=FS,
                             feat_stride=STRIDE, optim_iter=2)
    bb_j = jnp.asarray(bb.numpy())
    variables = model.init(jax.random.PRNGKey(0), _nhwc(x_train), bb_j)
    sd = {**_sd(feats_o, "classifier.feature_extractor"),
          **_sd(init_o, "classifier.filter_initializer"),
          **_sd(opt_o, "classifier.filter_optimizer")}
    wrapped = {c: {"classifier": variables[c]} for c in variables}
    converted = _convert(sd, wrapped)
    cvars = {c: converted[c]["classifier"] for c in converted}

    f_train_j = model.apply(cvars, _nhwc(x_train),
                            method="extract_classification_feat")
    f_test_j = model.apply(cvars, _nhwc(x_test),
                           method="extract_classification_feat")
    w_j = model.apply(cvars, f_train_j, bb_j, method="get_filter")
    got = model.apply(cvars, w_j, f_test_j, method="classify")
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


# ------------------------------------------------- full-checkpoint loading
def _resnet18_sd(prefix):
    """Synthesize a torchvision/pytracking-layout ResNet-18 state dict
    (external/AR/ltr/models/backbone/resnet.py:242) with random values."""
    g = np.random.default_rng(17)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{prefix}.{name}.weight"] = g.standard_normal(
            (o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{prefix}.{name}.weight"] = g.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{prefix}.{name}.bias"] = g.uniform(-0.2, 0.2, c).astype(np.float32)
        sd[f"{prefix}.{name}.running_mean"] = g.uniform(-0.2, 0.2, c).astype(np.float32)
        sd[f"{prefix}.{name}.running_var"] = g.uniform(0.6, 1.4, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for li, planes in enumerate((64, 128, 256, 512), start=1):
        for b in range(2):
            pre = f"layer{li}.{b}"
            conv(f"{pre}.conv1", planes, cin if b == 0 else planes, 3)
            bn(f"{pre}.bn1", planes)
            conv(f"{pre}.conv2", planes, planes, 3)
            bn(f"{pre}.bn2", planes)
            if b == 0 and cin != planes:
                conv(f"{pre}.downsample.0", planes, cin, 1)
                bn(f"{pre}.downsample.1", planes)
        cin = planes
    # published checkpoints keep the torchvision classification head
    # (ltr backbone retains fc); strict conversion must IGNORE it, not raise
    sd[f"{prefix}.fc.weight"] = g.standard_normal((1000, 512)).astype(np.float32)
    sd[f"{prefix}.fc.bias"] = g.standard_normal(1000).astype(np.float32)
    return sd


def _dimp18_classifier_sd():
    feats = clf_features_oracle(256, 256, 1, 4).eval()
    init = FilterInitializerLinearOracle(4, 256, 16).eval()
    opt = SDGNOracle(num_iter=5, feat_stride=16).eval()
    _randomize_bn(feats)
    return {**_sd(feats, "classifier.feature_extractor"),
            **_sd(init, "classifier.filter_initializer"),
            **_sd(opt, "classifier.filter_optimizer")}


def test_load_network_dimp18_strict_and_tracks():
    """A full dimpnet18-layout checkpoint (feature_extractor + classifier +
    bb_regressor) must convert strict=True into the tracker and track."""
    from multi_modal_tracking_tpu.classic.dimp import DiMPTracker
    trk = DiMPTracker(crop_size=96, refine=True, refine_steps=2,
                      memory_size=16, update_interval=2)
    sd = {**_resnet18_sd("feature_extractor"), **_dimp18_classifier_sd(),
          **_sd(AtomIoUNetOracle().eval(), "bb_regressor")}
    trk.load_network(sd, strict=True)    # raises on any unconverted key
    img = np.zeros((120, 160, 3), np.float32)
    img[40:70, 60:100] = 200.0
    trk.initialize(img, {"init_bbox": [60, 40, 40, 30]})
    for _ in range(3):
        out = trk.track(img)
    b = np.asarray(out["target_bbox"])
    assert np.isfinite(b).all() and b[2] > 0 and b[3] > 0


def test_load_network_atom_strict():
    """ATOMnet checkpoints carry feature_extractor + bb_regressor only."""
    from multi_modal_tracking_tpu.classic.atom import ATOMTracker
    trk = ATOMTracker(crop_size=96, refine=True, refine_steps=2,
                      num_cg_iter=2, memory_size=16)
    sd = {**_resnet18_sd("feature_extractor"),
          **_sd(AtomIoUNetOracle().eval(), "bb_regressor")}
    trk.load_network(sd, strict=True)
    img = np.zeros((120, 160, 3), np.float32)
    img[40:70, 60:100] = 200.0
    trk.initialize(img, {"init_bbox": [60, 40, 40, 30]})
    out = trk.track(img)
    assert np.isfinite(np.asarray(out["target_bbox"])).all()
