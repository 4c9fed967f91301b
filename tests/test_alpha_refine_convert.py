"""Alpha-Refine checkpoint parity: a reference-exact PyTorch ARnet_seg_mask
(resnet_seg ResNet-50 backbone, CorrNL neck, TSE/RRB/CAB SegNetwork with the
PyrUpBicubic2d upsampler) is built with the REFERENCE's parameter naming, its
state dict converted through utils/torch_convert.convert_alpha_refine, and
the flax AlphaRefineNet must reproduce the oracle's mask logits.

The correlation kernel is injected identically on both sides: the PrRoI pool
producing it is already oracle-tested in tests/test_prroi.py, and the
reference's CUDA PrRoIPool has no CPU torch twin to call here.

Oracle parity targets:
  external/AR/ltr/models/backbone/resnet_seg.py:48-190 (Bottleneck ResNet-50,
  deep-to-shallow layer renaming :115-120)
  external/AR/ltr/models/neck/CorrNL.py:84-117 (fuse_feat + corr_fun),
  neck_utils.py:14-31 (SEModule), :34-130 (NONLocalBlock2D sub_sampled)
  external/AR/ltr/models/head/seg_network.py:7-62 (TSE/CAB/RRB), :81-152
  (PyrUpBicubic2d + BackwardCompatibleUpsampler), :155-204 (SegNetwork)
  external/AR/ltr/models/AR_seg_mask/AR_seg_mask.py:64-86 (forward_test)
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.models.alpha_refine import build_alpha_refine
from multi_modal_tracking_tpu.utils.torch_convert import (convert_alpha_refine,
                                                          map_alpha_refine_key)

INPUT_SZ, POOL, OC = 128, 8, 64
B = 2

# --------------------------------------------------------------- torch oracle


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + r)


class _ResNet50Seg(nn.Module):
    """resnet_seg.ResNet(Bottleneck, [3,4,6,3]) with the seg renaming."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        out = {"layer1": x}
        x = self.layer1(x); out["layer2"] = x
        x = self.layer2(x); out["layer3"] = x
        x = self.layer3(x); out["layer4"] = x
        x = self.layer4(x); out["layer5"] = x
        return out


class _SEModule(nn.Module):
    def __init__(self, channels, reduction=4):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, channels // reduction, 1)
        self.fc2 = nn.Conv2d(channels // reduction, channels, 1)

    def forward(self, x):
        s = F.adaptive_avg_pool2d(x, 1)
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class _NonLocal2D(nn.Module):
    """NONLocalBlock2D(dimension=2, sub_sample=True, bn_layer=True)."""

    def __init__(self, channels):
        super().__init__()
        inter = channels // 2
        self.inter = inter
        self.theta = nn.Conv2d(channels, inter, 1)
        self.phi = nn.Sequential(nn.Conv2d(channels, inter, 1),
                                 nn.MaxPool2d(2))
        self.g = nn.Sequential(nn.Conv2d(channels, inter, 1), nn.MaxPool2d(2))
        self.W = nn.Sequential(nn.Conv2d(inter, channels, 1),
                               nn.BatchNorm2d(channels))

    def forward(self, x):
        b = x.shape[0]
        theta = self.theta(x).view(b, self.inter, -1).permute(0, 2, 1)
        phi = self.phi(x).view(b, self.inter, -1)
        g = self.g(x).view(b, self.inter, -1).permute(0, 2, 1)
        f = torch.softmax(torch.matmul(theta, phi), dim=-1)
        y = torch.matmul(f, g).permute(0, 2, 1).contiguous().view(
            b, self.inter, *x.shape[2:])
        return x + self.W(y)


class _CorrNL(nn.Module):
    def __init__(self, pool=POOL):
        super().__init__()
        self.channel_attention = _SEModule(pool * pool)
        self.spatial_attention = _NonLocal2D(pool * pool)

    def fuse_feat(self, kernel, feat):
        """CorrNL.fuse_feat with an injected ref kernel (corr_fun :101-117)."""
        outs = []
        for i in range(feat.shape[0]):
            ker = kernel[i:i + 1]
            c, p, q = ker.shape[1:]
            ker = ker.view(c, p * q).transpose(0, 1)[:, :, None, None]
            outs.append(F.conv2d(feat[i:i + 1], ker.contiguous()))
        corr = torch.cat(outs, 0)
        return self.spatial_attention(self.channel_attention(corr))


def _conv(ic, oc, k):
    return nn.Conv2d(ic, oc, k, padding=k // 2)


class _TSE(nn.Module):
    def __init__(self, fc, ic, oc):
        super().__init__()
        nc = ic + oc
        self.reduce = nn.Sequential(_conv(fc, oc, 1), nn.ReLU(), _conv(oc, oc, 1))
        self.transform = nn.Sequential(_conv(nc, nc, 3), nn.ReLU(),
                                       _conv(nc, nc, 3), nn.ReLU(),
                                       _conv(nc, oc, 3), nn.ReLU())

    def forward(self, ft, score, x=None):
        h = self.reduce(ft)
        hpool = F.adaptive_avg_pool2d(h, (1, 1)) if x is None else x
        if score.shape[-2:] != h.shape[-2:]:
            score = F.interpolate(score, h.shape[-2:], mode="bilinear",
                                  align_corners=False)
        return self.transform(torch.cat([h, score], dim=1)), hpool


class _RRB(nn.Module):
    def __init__(self, oc):
        super().__init__()
        self.conv1x1 = _conv(oc, oc, 1)
        self.bblock = nn.Sequential(_conv(oc, oc, 3), nn.BatchNorm2d(oc),
                                    nn.ReLU(),
                                    nn.Conv2d(oc, oc, 3, padding=1, bias=False))

    def forward(self, x):
        h = self.conv1x1(x)
        return F.relu(h + self.bblock(h))


class _CAB(nn.Module):
    def __init__(self, oc, deepest):
        super().__init__()
        self.convreluconv = nn.Sequential(_conv(2 * oc, oc, 1), nn.ReLU(),
                                          _conv(oc, oc, 1))
        self.deepest = deepest

    def forward(self, deeper, shallower):
        shallow_pool = F.adaptive_avg_pool2d(shallower, (1, 1))
        deeper_pool = deeper if self.deepest else F.adaptive_avg_pool2d(
            deeper, (1, 1))
        gate = self.convreluconv(torch.cat([shallow_pool, deeper_pool], dim=1))
        inputs = shallower * torch.sigmoid(gate)
        return inputs + F.interpolate(deeper, inputs.shape[-2:],
                                      mode="bilinear", align_corners=False)


class _PyrUpBicubic2d(nn.Module):
    """seg_network.py:81-133, verbatim filter construction."""

    def __init__(self, channels):
        super().__init__()
        self.channels = channels

        def kernel(d):
            x = d + torch.arange(-1, 3, dtype=torch.float32)
            x = torch.abs(x)
            a = -0.75
            f = ((x < 1).float() * ((a + 2) * x * x * x - (a + 3) * x * x + 1)
                 + ((x >= 1) * (x < 2)).float()
                 * (a * x * x * x - 5 * a * x * x + 8 * a * x - 4 * a))
            W = f.reshape(1, 1, 1, len(x)).float()
            return W, W.permute(0, 1, 3, 2)

        We, We_t = kernel(-0.25)
        Wo, Wo_t = kernel(-0.25 - 0.5)
        self.W00 = (We_t @ We).expand(channels, 1, 4, 4).contiguous()
        self.W01 = (We_t @ Wo).expand(channels, 1, 4, 4).contiguous()
        self.W10 = (Wo_t @ We).expand(channels, 1, 4, 4).contiguous()
        self.W11 = (Wo_t @ Wo).expand(channels, 1, 4, 4).contiguous()

    def forward(self, x):
        a = F.pad(x, (2, 2, 2, 2), "replicate")
        I00 = F.conv2d(a, self.W00, groups=self.channels)
        I01 = F.conv2d(a, self.W01, groups=self.channels)
        I10 = F.conv2d(a, self.W10, groups=self.channels)
        I11 = F.conv2d(a, self.W11, groups=self.channels)
        n, c, h, w = I11.shape
        J0 = torch.stack((I00, I01), dim=-1).view(n, c, h, 2 * w)
        J1 = torch.stack((I10, I11), dim=-1).view(n, c, h, 2 * w)
        out = torch.stack((J0, J1), dim=-2).view(n, c, 2 * h, 2 * w)
        return F.pad(out, (-1, -1, -1, -1))


class _Upsampler(nn.Module):
    """BackwardCompatibleUpsampler (seg_network.py:136-152)."""

    def __init__(self, in_channels):
        super().__init__()
        self.conv1 = _conv(in_channels, in_channels // 2, 3)
        self.up1 = _PyrUpBicubic2d(in_channels)
        self.conv2 = _conv(in_channels // 2, 1, 3)
        self.up2 = _PyrUpBicubic2d(in_channels // 2)

    def forward(self, x, image_size):
        x = self.up1(x)
        x = F.relu(self.conv1(x))
        x = self.up2(x)
        x = F.interpolate(x, image_size, mode="bilinear", align_corners=False)
        return self.conv2(x)


SEG_LAYERS = ("layer5", "layer4", "layer3", "layer2")
FT_CHANNELS = {"layer5": 2048, "layer4": 1024, "layer3": 512, "layer2": 256}


class _SegNetwork(nn.Module):
    def __init__(self, in_channels, oc):
        super().__init__()
        self.TSE = nn.ModuleDict()
        self.RRB1 = nn.ModuleDict()
        self.CAB = nn.ModuleDict()
        self.RRB2 = nn.ModuleDict()
        for L in SEG_LAYERS:
            self.TSE[L] = _TSE(FT_CHANNELS[L], in_channels, oc)
            self.RRB1[L] = _RRB(oc)
            self.CAB[L] = _CAB(oc, L == "layer5")
            self.RRB2[L] = _RRB(oc)
        self.project = _Upsampler(oc)

    def forward(self, scores, features, image_size):
        x = None
        for L in SEG_LAYERS:
            ft = features[L]
            s = F.interpolate(scores, ft.shape[-2:], mode="bilinear",
                              align_corners=False) \
                if scores.shape[-2:] != ft.shape[-2:] else scores
            h, hpool = self.TSE[L](ft, s, x)
            h = self.RRB1[L](h)
            h = self.CAB[L](hpool, h)
            x = self.RRB2[L](h)
        return self.project(x, image_size)


class _ARnetSegMask(nn.Module):
    def __init__(self):
        super().__init__()
        self.feature_extractor = _ResNet50Seg()
        self.neck = _CorrNL()
        self.refiner = _SegNetwork(POOL * POOL, OC)

    def forward_test(self, img, kernel, image_size):
        feats = self.feature_extractor(img)
        fusion = self.neck.fuse_feat(kernel, feats["layer4"])
        return self.refiner(fusion, feats, image_size)


# ------------------------------------------------------------------- fixtures


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    oracle = _ARnetSegMask()
    # randomise BN running stats so frozen-BN conversion is actually tested
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.6, 1.4)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.05)
    oracle.eval()

    net, variables, spec = build_alpha_refine(input_sz=INPUT_SZ,
                                              output_sz=INPUT_SZ)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables, report = convert_alpha_refine(sd, variables, strict=True,
                                             verbose=False)
    return oracle, net, variables, report


def test_every_oracle_key_maps(converted):
    oracle, _, _, report = converted
    unmapped = [k for k in oracle.state_dict()
                if not k.endswith("num_batches_tracked")
                and map_alpha_refine_key(k) is None]
    assert unmapped == []
    assert report["shape_mismatch"] == []
    # every flax param the oracle covers was actually written
    assert not any("feature_extractor" in p or "neck" in p or "refiner" in p
                   for p in report["missing"]), report["missing"][:10]


def test_mask_logit_parity(converted):
    oracle, net, variables, _ = converted
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, INPUT_SZ, INPUT_SZ, 3)).astype(np.float32)
    kernel = rng.standard_normal((B, POOL, POOL, 1024)).astype(np.float32)

    with torch.no_grad():
        want = oracle.forward_test(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(kernel).permute(0, 3, 1, 2),
            (INPUT_SZ, INPUT_SZ)).permute(0, 2, 3, 1).numpy()

    got = np.asarray(jax.jit(net.apply)(variables, jnp.asarray(img),
                                        jnp.asarray(kernel)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_backbone_feature_parity(converted):
    """Isolates the ResNet-50 conversion (torchvision layout: stride on the
    3x3, frozen BN folding, downsample naming)."""
    oracle, net, variables, _ = converted
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, INPUT_SZ, INPUT_SZ, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle.feature_extractor(
            torch.from_numpy(img).permute(0, 3, 1, 2))

    from multi_modal_tracking_tpu.models.resnet import seg_features

    def feats_fn(v, x):
        bound = net.bind(v)
        return seg_features(bound.feature_extractor(x))

    got = jax.jit(feats_fn)(variables, jnp.asarray(img))
    for L in ("layer2", "layer4", "layer5"):
        np.testing.assert_allclose(
            np.asarray(got[L]),
            want[L].permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3,
            err_msg=L)
