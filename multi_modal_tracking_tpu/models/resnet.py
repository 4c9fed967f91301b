"""Torchvision-layout ResNet feature extractors (flax, NHWC, frozen BN).

Parity targets:
  external/AR/ltr/models/backbone/resnet_seg.py — the Alpha-Refine seg
  backbone (ResNet-50, outputs renamed deep-to-shallow: 'layer1'=stem,
  'layer2'..'layer5'=torch layer1..layer4) used by ARnet_seg_mask
  (AR_seg_mask.py:96-130).
  external/AR/ltr/models/backbone/resnet.py:273 — the classic-tracker
  backbone (ResNet-18/50) behind ATOM/DiMP feature extraction.

The block/stage structure, strides (conv1 /2, maxpool /2, layer2-4 /2 each,
stride on the 3x3 conv of Bottleneck — torchvision "v1.5") and padding
arithmetic are exactly torchvision's, so published torch checkpoints convert
key-for-key (utils/torch_convert.convert_resnet). BatchNorm is frozen
(scale/bias params + batch_stats mean/var): the networks here always run
from converted trained weights, and a frozen BN is a constant per-channel
affine — free to fuse for XLA and identical to torch .eval() semantics.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.cvt import FrozenBatchNorm


def _conv(features: int, kernel: int, stride: int = 1, padding: int = 0,
          dtype=jnp.float32, name: str = None):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(padding, padding), (padding, padding)],
                   use_bias=False, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (resnet_seg.py:16-45): 3x3 -> 3x3, expansion 1."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x):
        out = _conv(self.planes, 3, self.stride, 1, self.dtype, "conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, 1, self.dtype, "conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            r = _conv(self.planes, 1, self.stride, 0, self.dtype, "down_conv")(x)
            r = FrozenBatchNorm(self.planes, dtype=self.dtype, name="down_bn")(r)
        else:
            r = x
        return nn.relu(out + r)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (resnet_seg.py:48-80): 1x1 -> 3x3(stride) ->
    1x1(x4), expansion 4."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x):
        out = _conv(self.planes, 1, 1, 0, self.dtype, "conv1")(x)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, 1, self.dtype, "conv2")(out)
        out = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, 0, self.dtype, "conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            r = _conv(self.planes * 4, 1, self.stride, 0, self.dtype,
                      "down_conv")(x)
            r = FrozenBatchNorm(self.planes * 4, dtype=self.dtype,
                                name="down_bn")(r)
        else:
            r = x
        return nn.relu(out + r)


class ResNet(nn.Module):
    """Feature-pyramid ResNet. Returns torch-named features:
      conv1  — post conv1+bn+relu+maxpool, /4, 64ch
      layer1 — /4;  layer2 — /8;  layer3 — /16;  layer4 — /32
    (strides with the default (1, 2, 2, 2) stage strides)."""
    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        feats = {}
        x = _conv(64, 7, 2, 3, self.dtype, "conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1): -inf padding, floor sizes.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats["conv1"] = x
        inplanes = 64
        for i, (planes, nblocks, stride) in enumerate(
                zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))):
            for j in range(nblocks):
                s = stride if j == 0 else 1
                down = (j == 0 and
                        (s != 1 or inplanes != planes * self.block.expansion))
                x = self.block(planes, stride=s, downsample=down,
                               dtype=self.dtype, name=f"layer{i+1}_{j}")(x)
            inplanes = planes * self.block.expansion
            feats[f"layer{i+1}"] = x
        return feats


# torchvision/pytracking input statistics: every published ResNet checkpoint
# was trained on (x/255 - mean)/std inputs (pytracking
# features/deep.py NetWithBackbone.preprocess_image, ltr Normalize transform)
# — the same stats the tracking loop uses; single definition in ops/crop.py.
from multi_modal_tracking_tpu.ops.crop import normalize_imagenet as imagenet_preprocess  # noqa: E402,F401


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), dtype=dtype)


def resnet34(dtype=jnp.float32) -> ResNet:
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), dtype=dtype)


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), dtype=dtype)


RESNET_OUT_CHANNELS = {
    BasicBlock: {"conv1": 64, "layer1": 64, "layer2": 128, "layer3": 256,
                 "layer4": 512},
    Bottleneck: {"conv1": 64, "layer1": 256, "layer2": 512, "layer3": 1024,
                 "layer4": 2048},
}


def seg_features(feats: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Rename torch layers to resnet_seg's deep-to-shallow scheme
    (resnet_seg.py:115-120): layer1=stem, layer2..layer5=torch layer1..4."""
    return {"layer1": feats["conv1"], "layer2": feats["layer1"],
            "layer3": feats["layer2"], "layer4": feats["layer3"],
            "layer5": feats["layer4"]}
