"""Alpha-Refine equivalent: box -> segmentation-mask refinement network.

Parity targets (external/AR/, the vendored Alpha-Refine used for VOT2020
mask submission — SURVEY §2.5):
  ltr/models/neck/CorrNL.py — PrRoI-pool the reference-frame features at the
  init box into a pool_size^2 kernel, pixel-correlate it against test-frame
  features (corr channels = pool_size^2), then SE channel attention and a
  non-local spatial attention block (:15-57).
  ltr/models/head/seg_network.py — decoder of TSE/RRB/CAB blocks over a
  feature pyramid with progressive upsampling to a full-resolution mask
  (:153-204).
  pytracking/ARcm_seg.py — runtime wrapper: initialize(frame, box) caches
  the reference kernel from a 2x crop; get_mask(frame, box) crops, fuses and
  decodes a mask in crop coords, pasted back by the caller (:19-69).
  VOT entry: pytracking/VOT2020_super_only_mask_384_HP/
  mixformer_alpha_seg_class.py:19-53 (tracker box -> AR mask, threshold .6).

TPU-first notes: NHWC feature maps; the pixel correlation is one einsum
(MXU); GroupNorm instead of BatchNorm (no cross-replica state, same
semantics train/eval); the reference kernel is an explicit array returned by
init_ref and threaded through jitted calls rather than module state.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.ops.prroi import prroi_pool


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="down")(x)
        return nn.relu(x + h)


class RefineBackbone(nn.Module):
    """ResNet-style pyramid: returns {layer1: /4, layer2: /8, layer3: /16}
    (the reference uses torchvision ResNet layers 1-3,
    ltr/models/backbone/resnet.py)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="gn_stem")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = {}
        x = ResBlock(64, dtype=self.dtype, name="layer1_0")(x)
        x = ResBlock(64, dtype=self.dtype, name="layer1_1")(x)
        feats["layer1"] = x                                        # /4
        x = ResBlock(128, stride=2, dtype=self.dtype, name="layer2_0")(x)
        x = ResBlock(128, dtype=self.dtype, name="layer2_1")(x)
        feats["layer2"] = x                                        # /8
        x = ResBlock(256, stride=2, dtype=self.dtype, name="layer3_0")(x)
        x = ResBlock(256, dtype=self.dtype, name="layer3_1")(x)
        feats["layer3"] = x                                        # /16
        return feats


class SEModule(nn.Module):
    """Squeeze-and-excitation channel attention (neck_utils SEModule)."""
    channels: int
    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))                       # (B, C)
        s = nn.relu(nn.Dense(self.channels // self.reduction, dtype=self.dtype)(s))
        s = jax.nn.sigmoid(nn.Dense(self.channels, dtype=self.dtype)(s))
        return x * s[:, None, None, :]


class NonLocal2D(nn.Module):
    """Non-local spatial attention (neck_utils NONLocalBlock2D): one
    softmax(QK^T)V attention over flattened positions with a residual."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inter = max(C // 2, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x).reshape(B, H * W, inter)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x).reshape(B, H * W, inter)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x).reshape(B, H * W, inter)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", theta, phi).astype(jnp.float32), axis=-1
        ).astype(self.dtype)
        y = jnp.einsum("bqk,bkc->bqc", attn, g).reshape(B, H, W, inter)
        y = nn.Conv(C, (1, 1), dtype=self.dtype, name="out")(y)
        return x + y


class CorrNeck(nn.Module):
    """Pixel correlation neck (CorrNL): PrRoI-pooled reference kernel x test
    features -> pool_size^2 correlation channels + SE + non-local."""
    pool_size: int = 8
    feat_stride: int = 16
    dtype: jnp.dtype = jnp.float32

    def get_ref_kernel(self, feat_ref: jax.Array, box_xywh: jax.Array) -> jax.Array:
        """feat_ref: (B, H, W, C) /16 features; box in crop-image coords.
        Returns kernel (B, pool, pool, C)."""
        B = feat_ref.shape[0]
        b = box_xywh.reshape(B, 4)
        xyxy = jnp.concatenate([b[:, :2], b[:, :2] + b[:, 2:]], axis=1)
        rois = jnp.concatenate(
            [jnp.arange(B, dtype=jnp.float32)[:, None], xyxy], axis=1)
        return prroi_pool(feat_ref.astype(jnp.float32), rois, self.pool_size,
                          self.pool_size, 1.0 / self.feat_stride).astype(self.dtype)

    @nn.compact
    def __call__(self, kernel: jax.Array, feat_test: jax.Array) -> jax.Array:
        """kernel: (B, p, p, C); feat_test: (B, H, W, C) ->
        (B, H, W, p*p) attended correlation map."""
        B, p, _, C = kernel.shape
        corr = jnp.einsum("bpqc,bhwc->bhwpq", kernel, feat_test)
        corr = corr.reshape(B, *feat_test.shape[1:3], p * p)
        corr = corr / jnp.sqrt(jnp.float32(C)).astype(corr.dtype)
        corr = SEModule(p * p, dtype=self.dtype, name="se")(corr)
        return NonLocal2D(p * p, dtype=self.dtype, name="nl")(corr)


class DecoderBlock(nn.Module):
    """TSE + RRB + CAB-style refinement at one pyramid level
    (seg_network.py:7-60 collapsed into one flax block)."""
    out_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, score, deeper: Optional[jax.Array]):
        B, H, W, _ = feat.shape
        score = jax.image.resize(score, (B, H, W, score.shape[-1]), "bilinear")
        h = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="reduce")(feat)
        h = jnp.concatenate([h, score], axis=-1)
        h = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                            dtype=self.dtype, name="mix")(h))
        if deeper is not None:
            up = jax.image.resize(deeper, (B, H, W, deeper.shape[-1]), "bilinear")
            # channel-attention fusion (CAB): gate from global context
            g = jnp.concatenate([up.mean(axis=(1, 2)), h.mean(axis=(1, 2))], axis=-1)
            g = jax.nn.sigmoid(nn.Dense(self.out_channels, dtype=self.dtype,
                                        name="gate")(g))
            h = h + up * g[:, None, None, :]
        r = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                            dtype=self.dtype, name="rrb1")(h))
        r = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="rrb2")(r)
        return nn.relu(h + r)


@dataclasses.dataclass(frozen=True)
class RefineSpec:
    input_sz: int = 256
    pool_size: int = 8
    out_channels: int = 32


class AlphaRefineNet(nn.Module):
    """Box -> mask refinement network (ARcm_seg's refine_network)."""
    spec: RefineSpec = RefineSpec()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = RefineBackbone(dtype=self.dtype)
        self.neck = CorrNeck(pool_size=self.spec.pool_size, dtype=self.dtype)
        self.dec3 = DecoderBlock(self.spec.out_channels, dtype=self.dtype)
        self.dec2 = DecoderBlock(self.spec.out_channels, dtype=self.dtype)
        self.dec1 = DecoderBlock(self.spec.out_channels, dtype=self.dtype)
        self.mask_conv = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype)

    def init_ref(self, patch_ref: jax.Array, box_xywh: jax.Array) -> jax.Array:
        """Reference branch (forward_ref): 2x crop around the init box ->
        correlation kernel (B, p, p, C)."""
        feats = self.backbone(patch_ref)
        return self.neck.get_ref_kernel(feats["layer3"], box_xywh)

    def __call__(self, patch_test: jax.Array, kernel: jax.Array) -> jax.Array:
        """Test branch (forward_test mode='mask'): crop + cached kernel ->
        (B, input_sz, input_sz, 1) mask logits."""
        feats = self.backbone(patch_test)
        score = self.neck(kernel, feats["layer3"])        # (B, /16, /16, p*p)
        x = self.dec3(feats["layer3"], score, None)
        x = self.dec2(feats["layer2"], score, x)
        x = self.dec1(feats["layer1"], score, x)
        B, H, W, _ = patch_test.shape
        x = jax.image.resize(x, (B, H, W, x.shape[-1]), "bilinear")
        return self.mask_conv(x)

    def forward_train(self, patch_ref, box_ref, patch_test):
        """Training forward: both branches in one call."""
        kernel = self.init_ref(patch_ref, box_ref)
        return self(patch_test, kernel)


class ARcmSeg:
    """Runtime wrapper (pytracking/ARcm_seg.py): host API over the jitted
    refine net. initialize caches the reference kernel; get_mask refines a
    tracker box into a full-image mask."""

    def __init__(self, variables, spec: RefineSpec = RefineSpec(),
                 search_factor: float = 2.0, dtype=jnp.float32):
        self.net = AlphaRefineNet(spec=spec, dtype=dtype)
        self.variables = variables
        self.spec = spec
        self.search_factor = search_factor
        self._init_jit = jax.jit(
            lambda v, p, b: self.net.apply(v, p, b, method=self.net.init_ref))
        self._mask_jit = jax.jit(
            lambda v, p, k: jax.nn.sigmoid(self.net.apply(v, p, k)))

    def _crop(self, frame: np.ndarray, box) -> Tuple[np.ndarray, float, tuple]:
        from multi_modal_tracking_tpu.train.data.processing_utils import sample_target
        crop, rf, _ = sample_target(frame, box, self.search_factor,
                                    self.spec.input_sz)
        return crop, rf

    def _box_in_crop(self, box, rf) -> np.ndarray:
        # box centred in the crop by construction of sample_target
        w, h = box[2] * rf, box[3] * rf
        c = self.spec.input_sz / 2.0
        return np.asarray([c - w / 2, c - h / 2, w, h], np.float32)

    def initialize(self, frame: np.ndarray, box) -> None:
        crop, rf = self._crop(frame, box)
        bic = self._box_in_crop(box, rf)
        self.kernel = self._init_jit(
            self.variables, jnp.asarray(crop, jnp.float32)[None] / 255.0,
            jnp.asarray(bic)[None])

    def get_mask(self, frame: np.ndarray, box) -> np.ndarray:
        """Returns a full-frame float mask in [0, 1] (caller thresholds,
        mixformer_alpha_seg_class.py uses 0.6)."""
        crop, rf = self._crop(frame, box)
        mask_crop = np.asarray(self._mask_jit(
            self.variables, jnp.asarray(crop, jnp.float32)[None] / 255.0,
            self.kernel))[0, :, :, 0]
        return self._paste(mask_crop, frame.shape[:2], box, rf)

    def _paste(self, mask_crop: np.ndarray, frame_hw, box, rf) -> np.ndarray:
        import cv2
        import math
        H, W = frame_hw
        x, y, w, h = [float(v) for v in box]
        crop_sz = math.ceil(math.sqrt(w * h) * self.search_factor)
        x1 = int(round(x + 0.5 * w - crop_sz * 0.5))
        y1 = int(round(y + 0.5 * h - crop_sz * 0.5))
        mask_big = cv2.resize(mask_crop, (crop_sz, crop_sz))
        out = np.zeros((H, W), np.float32)
        sx0, sy0 = max(0, -x1), max(0, -y1)
        dx0, dy0 = max(0, x1), max(0, y1)
        wcopy = min(crop_sz - sx0, W - dx0)
        hcopy = min(crop_sz - sy0, H - dy0)
        if wcopy > 0 and hcopy > 0:
            out[dy0:dy0 + hcopy, dx0:dx0 + wcopy] = \
                mask_big[sy0:sy0 + hcopy, sx0:sx0 + wcopy]
        return out


def build_alpha_refine(input_sz: int = 256, dtype=jnp.float32,
                       rng_seed: int = 0):
    """Initialise an AlphaRefineNet + variables (randomly initialised;
    trained weights load through utils/checkpoint.load_variables)."""
    spec = RefineSpec(input_sz=input_sz)
    net = AlphaRefineNet(spec=spec, dtype=dtype)
    p = jnp.zeros((1, input_sz, input_sz, 3), jnp.float32)
    b = jnp.asarray([[96.0, 96.0, 64.0, 64.0]])
    variables = jax.jit(lambda r: net.init(r, p, b, p,
                                           method=net.forward_train))(
        jax.random.PRNGKey(rng_seed))
    return net, variables, spec
