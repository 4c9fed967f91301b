"""Alpha-Refine: box -> segmentation-mask refinement network, at reference
fidelity (checkpoint-convertible).

Parity targets (external/AR/, the vendored Alpha-Refine used for VOT2020
mask submission — SURVEY §2.5):
  ltr/models/AR_seg_mask/AR_seg_mask.py:96-130 ARnet_seg_mask_resnet50 —
  resnet_seg ResNet-50 backbone (features renamed deep-to-shallow:
  layer1=stem .. layer5=torch layer4), CorrNL neck on 'layer4' (/16),
  SegNetwork refiner over (layer5, layer4, layer3, layer2).
  ltr/models/neck/CorrNL.py — PrRoI-pool the reference-frame features at the
  init box into a pool^2 kernel, pixel-correlate against test features
  (corr channels = pool^2, no scaling), SE channel attention, non-local
  spatial attention (sub_sampled phi/g, BN'd output projection).
  ltr/models/head/seg_network.py — TSE/RRB/CAB decoder over the feature
  pyramid + BackwardCompatibleUpsampler (PyrUpBicubic2d 2x stages).
  pytracking/ARcm_seg.py — runtime wrapper: anisotropic SE crops
  (processing_utils_SE.sample_target_SE), ImageNet normalisation,
  initialize caches the reference kernel, get_mask pastes the crop mask
  back into frame coords (map_mask_back).
  VOT entry: pytracking/VOT2020_super_only_mask_384_HP/
  mixformer_alpha_seg_class.py:19-53 (tracker box -> AR mask, threshold .6,
  input_sz 384).

TPU-first notes: NHWC feature maps; the pixel correlation is one einsum
(MXU); BatchNorm is frozen (constant affine — checkpoint inference
semantics, XLA-fusable); the reference kernel is an explicit array returned
by init_ref and threaded through jitted calls rather than module state; the
bicubic 2x upsampler is four depthwise 4x4 convs + interleave, exactly
PyrUpBicubic2d's filter bank.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.cvt import FrozenBatchNorm
from multi_modal_tracking_tpu.models.resnet import resnet50, seg_features
from multi_modal_tracking_tpu.ops.prroi import prroi_pool


def _interp(t: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """F.interpolate(..., mode='bilinear', align_corners=False) equivalent
    (head/utils.py interpolate): half-pixel sampling, no antialias."""
    if t.shape[1:3] == tuple(hw):
        return t
    return jax.image.resize(t, (t.shape[0], hw[0], hw[1], t.shape[-1]),
                            "bilinear", antialias=False)


class SEModule(nn.Module):
    """Squeeze-and-excitation (neck_utils.py SEModule): 1x1 conv bottleneck
    over the global-average vector; biases as in the reference convs."""
    channels: int
    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))                       # adaptive_avg_pool(1)
        s = nn.relu(nn.Dense(self.channels // self.reduction,
                             dtype=self.dtype, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(self.channels, dtype=self.dtype,
                                    name="fc2")(s))
        return x * s[:, None, None, :]


class NonLocalBlock2D(nn.Module):
    """neck_utils.py NONLocalBlock2D (dimension=2, sub_sample=True,
    bn_layer=True): softmax(theta phi^T) g attention with 2x2-maxpooled
    phi/g and a BN'd output projection, residual."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inter = max(C // 2, 1)
        conv = lambda n: nn.Conv(inter, (1, 1), dtype=self.dtype, name=n)
        theta = conv("theta")(x).reshape(B, H * W, inter)
        phi = nn.max_pool(conv("phi")(x), (2, 2), strides=(2, 2))
        g = nn.max_pool(conv("g")(x), (2, 2), strides=(2, 2))
        hw2 = phi.shape[1] * phi.shape[2]
        phi = phi.reshape(B, hw2, inter)
        g = g.reshape(B, hw2, inter)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", theta, phi).astype(jnp.float32), axis=-1
        ).astype(x.dtype)
        y = jnp.einsum("bqk,bkc->bqc", attn, g).reshape(B, H, W, inter)
        y = nn.Conv(C, (1, 1), dtype=self.dtype, name="w_conv")(y)
        y = FrozenBatchNorm(C, dtype=self.dtype, name="w_bn")(y)
        return x + y


class CorrNL(nn.Module):
    """Pixel-correlation neck (CorrNL.py): PrRoI-pooled reference kernel
    1x1-conv'd over test features -> pool^2 channels (exact dot products,
    unscaled: corr_fun :101-117), SE, non-local."""
    pool_size: int = 8
    feat_stride: int = 16
    dtype: jnp.dtype = jnp.float32

    def get_ref_kernel(self, feat_ref: jax.Array, box_xywh: jax.Array) -> jax.Array:
        """feat_ref: (B, H, W, C) /16 features; box xywh in crop-image
        coords (CorrNL.get_ref_kernel). Returns kernel (B, p, p, C)."""
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
        (B, H, W, p*p) attended correlation map (CorrNL.fuse_feat)."""
        B, p, _, C = kernel.shape
        corr = jnp.einsum("bpqc,bhwc->bhwpq", kernel, feat_test)
        corr = corr.reshape(B, *feat_test.shape[1:3], p * p)
        corr = SEModule(p * p, dtype=self.dtype, name="channel_attention")(corr)
        return NonLocalBlock2D(p * p, dtype=self.dtype,
                               name="spatial_attention")(corr)


def _conv(features, kernel, dtype, name, use_bias=True):
    return nn.Conv(features, (kernel, kernel),
                   padding=[(kernel // 2, kernel // 2)] * 2,
                   use_bias=use_bias, dtype=dtype, name=name)


class TSE(nn.Module):
    """Target-specific encoder (seg_network.py TSE): reduce the backbone
    feature, concat the (resized) score map, transform. relu() in the
    reference is LeakyReLU(0) == ReLU."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ft, score, x: Optional[jax.Array]):
        oc = self.out_channels
        h = _conv(oc, 1, self.dtype, "reduce0")(ft)
        h = _conv(oc, 1, self.dtype, "reduce2")(nn.relu(h))
        hpool = h.mean(axis=(1, 2), keepdims=True) if x is None else x
        h = jnp.concatenate([h, _interp(score, h.shape[1:3])], axis=-1)
        nc = h.shape[-1]
        h = nn.relu(_conv(nc, 3, self.dtype, "transform0")(h))
        h = nn.relu(_conv(nc, 3, self.dtype, "transform2")(h))
        h = nn.relu(_conv(oc, 3, self.dtype, "transform4")(h))
        return h, hpool


class RRB(nn.Module):
    """Residual refinement block (seg_network.py RRB, use_bn=True):
    conv1x1 -> [conv3 BN relu conv3(no bias)] residual."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        h = _conv(oc, 1, self.dtype, "conv1x1")(x)
        r = _conv(oc, 3, self.dtype, "bblock0")(h)
        r = FrozenBatchNorm(oc, dtype=self.dtype, name="bblock1")(r)
        r = _conv(oc, 3, self.dtype, "bblock3", use_bias=False)(nn.relu(r))
        return nn.relu(h + r)


class CAB(nn.Module):
    """Channel-attention fusion (seg_network.py CAB): gate the shallower
    stream from pooled deep+shallow context, add the upsampled deeper."""
    out_channels: int
    deepest: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, deeper, shallower):
        oc = self.out_channels
        shallow_pool = shallower.mean(axis=(1, 2), keepdims=True)
        deeper_pool = deeper if self.deepest else deeper.mean(
            axis=(1, 2), keepdims=True)
        g = jnp.concatenate([shallow_pool, deeper_pool], axis=-1)
        g = _conv(oc, 1, self.dtype, "convreluconv0")(g)
        g = _conv(oc, 1, self.dtype, "convreluconv2")(nn.relu(g))
        out = shallower * jax.nn.sigmoid(g)
        return out + _interp(deeper, out.shape[1:3])


def _bicubic_taps(d: float) -> np.ndarray:
    """PyrUpBicubic2d.kernel (seg_network.py:87-96): 4-tap Keys cubic,
    a = -0.75, at offset d."""
    x = np.abs(d + np.arange(-1, 3, dtype=np.float64))
    a = -0.75
    f = ((x < 1) * ((a + 2) * x**3 - (a + 3) * x**2 + 1)
         + ((x >= 1) & (x < 2)) * (a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a))
    return f.astype(np.float32)


_W_EVEN = _bicubic_taps(-0.25)
_W_ODD = _bicubic_taps(-0.75)


def pyr_up_bicubic(x: jax.Array) -> jax.Array:
    """PyrUpBicubic2d (seg_network.py:81-133): exact 2x bicubic upsample via
    four depthwise 4x4 filters on a replicate-padded input, phase
    interleave, crop 1."""
    B, H, W, C = x.shape
    a = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    outs = {}
    for rname, rk in (("e", _W_EVEN), ("o", _W_ODD)):
        for cname, ck in (("e", _W_EVEN), ("o", _W_ODD)):
            w = jnp.asarray(np.outer(rk, ck))[:, :, None, None]
            w = jnp.tile(w, (1, 1, 1, C)).astype(x.dtype)
            outs[rname + cname] = jax.lax.conv_general_dilated(
                a, w, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
    h1, w1 = H + 1, W + 1
    j0 = jnp.stack([outs["ee"], outs["eo"]], axis=3).reshape(B, h1, 2 * w1, C)
    j1 = jnp.stack([outs["oe"], outs["oo"]], axis=3).reshape(B, h1, 2 * w1, C)
    out = jnp.stack([j0, j1], axis=2).reshape(B, 2 * h1, 2 * w1, C)
    return out[:, 1:-1, 1:-1, :]


class Upsampler(nn.Module):
    """BackwardCompatibleUpsampler (seg_network.py:136-152): PyrUp 2x ->
    conv+relu -> PyrUp 2x -> bilinear to image size -> conv to 1 channel."""
    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, image_size: Tuple[int, int]):
        x = pyr_up_bicubic(x)
        x = nn.relu(_conv(self.in_channels // 2, 3, self.dtype, "conv1")(x))
        x = pyr_up_bicubic(x)
        x = _interp(x, image_size)
        return _conv(1, 3, self.dtype, "conv2")(x)


SEG_LAYERS = ("layer5", "layer4", "layer3", "layer2")


class SegNetwork(nn.Module):
    """seg_network.py SegNetwork: deep-to-shallow TSE/RRB/CAB/RRB decoding
    over (layer5..layer2), then the bicubic upsampler projection."""
    in_channels: int = 64        # score channels = pool_size^2
    out_channels: int = 64       # refnet nchannels (AR_seg_mask.py:113)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, scores, features: Dict[str, jax.Array],
                 image_size: Tuple[int, int]):
        x = None
        for L in SEG_LAYERS:
            ft = features[L]
            s = _interp(scores, ft.shape[1:3])
            h, hpool = TSE(self.out_channels, dtype=self.dtype,
                           name=f"TSE_{L}")(ft, s, x)
            h = RRB(self.out_channels, dtype=self.dtype, name=f"RRB1_{L}")(h)
            h = CAB(self.out_channels, deepest=(L == "layer5"),
                    dtype=self.dtype, name=f"CAB_{L}")(hpool, h)
            x = RRB(self.out_channels, dtype=self.dtype, name=f"RRB2_{L}")(h)
        return Upsampler(self.out_channels, dtype=self.dtype,
                         name="project")(x, image_size)


@dataclasses.dataclass(frozen=True)
class RefineSpec:
    input_sz: int = 256
    pool_size: int = 8
    out_channels: int = 64       # decoder nchannels
    output_sz: Optional[int] = None   # None -> pool_size*2*16 (AR_seg_mask.py:125)

    @property
    def mask_sz(self) -> int:
        return self.output_sz or self.pool_size * 2 * 16


class AlphaRefineNet(nn.Module):
    """ARnet_seg_mask (AR_seg_mask.py): ResNet-50 seg backbone + CorrNL +
    SegNetwork. Flax submodule names mirror the torch state-dict families
    (feature_extractor / neck / refiner) for utils.torch_convert."""
    spec: RefineSpec = RefineSpec()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feature_extractor = resnet50(dtype=self.dtype)
        self.neck = CorrNL(pool_size=self.spec.pool_size, dtype=self.dtype)
        self.refiner = SegNetwork(in_channels=self.spec.pool_size ** 2,
                                  out_channels=self.spec.out_channels,
                                  dtype=self.dtype)

    def init_ref(self, patch_ref: jax.Array, box_xywh: jax.Array) -> jax.Array:
        """Reference branch (forward_ref): normalised crop + box in crop
        coords -> correlation kernel (B, p, p, C)."""
        feats = seg_features(self.feature_extractor(patch_ref))
        return self.neck.get_ref_kernel(feats["layer4"], box_xywh)

    def __call__(self, patch_test: jax.Array, kernel: jax.Array) -> jax.Array:
        """Test branch (forward_test mode='mask'): -> (B, out, out, 1) mask
        LOGITS at spec.mask_sz (the reference applies sigmoid outside)."""
        feats = seg_features(self.feature_extractor(patch_test))
        score = self.neck(kernel, feats["layer4"])
        return self.refiner(score, feats, (self.spec.mask_sz,) * 2)

    def forward_train(self, patch_ref, box_ref, patch_test):
        """Training forward: both branches in one call (forward())."""
        kernel = self.init_ref(patch_ref, box_ref)
        return self(patch_test, kernel)


# ---------------------------------------------------------------------------
# Host-side SE crop utilities (ltr/data/processing_utils_SE.py)
# ---------------------------------------------------------------------------

def sample_target_se(im: np.ndarray, box, search_area_factor: float,
                     output_sz: int, pad_mode: str = "constant"
                     ) -> Tuple[np.ndarray, float, float]:
    """sample_target_SE (:15-64): anisotropic crop ws=ceil(f*w), hs=ceil(f*h)
    centred on the box, padded (note the reference's x2-W+1 pad quirk),
    resized to a square output. Returns (crop, h_rsz_f, w_rsz_f)."""
    import cv2
    x, y, w, h = [float(v) for v in box]
    ws, hs = math.ceil(search_area_factor * w), math.ceil(search_area_factor * h)
    if ws < 1 or hs < 1:
        raise ValueError("Too small bounding box.")
    x1 = round(x + 0.5 * w - ws * 0.5)
    y1 = round(y + 0.5 * h - hs * 0.5)
    x2, y2 = x1 + ws, y1 + hs
    x1_pad, x2_pad = max(0, -x1), max(x2 - im.shape[1] + 1, 0)
    y1_pad, y2_pad = max(0, -y1), max(y2 - im.shape[0] + 1, 0)
    crop = im[y1 + y1_pad:y2 - y2_pad, x1 + x1_pad:x2 - x2_pad]
    border = cv2.BORDER_CONSTANT if pad_mode == "constant" else cv2.BORDER_REPLICATE
    crop = cv2.copyMakeBorder(crop, y1_pad, y2_pad, x1_pad, x2_pad, border)
    rsz = cv2.resize(crop, (output_sz, output_sz))
    if rsz.ndim == 2:
        rsz = rsz[..., None]
    return rsz, output_sz / hs, output_sz / ws


def transform_box_to_crop_se(box, rf_h: float, rf_w: float,
                             crop_sz: int) -> np.ndarray:
    """transform_image_to_crop_SE (:114-145) with box_extract == box_in (the
    only way ARcm_seg calls it): centre at (crop_sz-1)/2, scale by the
    anisotropic resize factors, clamp to [0, crop_sz]."""
    x, y, w, h = [float(v) for v in box]
    cx = (crop_sz - 1) / 2.0
    cy = (crop_sz - 1) / 2.0
    bw, bh = w * rf_w, h * rf_h
    x1 = np.clip(cx - 0.5 * bw, 0, crop_sz)
    y1 = np.clip(cy - 0.5 * bh, 0, crop_sz)
    x2 = np.clip(cx + 0.5 * bw, 0, crop_sz)
    y2 = np.clip(cy + 0.5 * bh, 0, crop_sz)
    return np.asarray([x1, y1, x2 - x1, y2 - y1], np.float32)


def map_mask_back(frame_hw: Tuple[int, int], box, search_area_factor: float,
                  mask: np.ndarray) -> np.ndarray:
    """map_mask_back (:66-111): resize the crop mask to the anisotropic crop
    window and paste into a zero full-frame canvas."""
    import cv2
    H, W = frame_hw
    x, y, w, h = [float(v) for v in box]
    ws, hs = math.ceil(search_area_factor * w), math.ceil(search_area_factor * h)
    x1 = round(x + 0.5 * w - ws * 0.5)
    y1 = round(y + 0.5 * h - hs * 0.5)
    x2, y2 = x1 + ws, y1 + hs
    x1_pad, x2_pad = max(0, -x1), max(x2 - W + 1, 0)
    y1_pad, y2_pad = max(0, -y1), max(y2 - H + 1, 0)
    base = np.zeros((H + y1_pad + y2_pad, W + x1_pad + x2_pad), np.float32)
    mask_rsz = cv2.resize(mask, (ws, hs))
    base[y1 + y1_pad:y2 + y1_pad, x1 + x1_pad:x2 + x1_pad] = mask_rsz
    return base[y1_pad:y1_pad + H, x1_pad:x1_pad + W]


_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ARcmSeg:
    """Runtime wrapper (pytracking/ARcm_seg.py): host API over the jitted
    refine net. initialize caches the reference kernel; get_mask refines a
    tracker box into a full-image mask in [0, 1] (caller thresholds;
    mixformer_alpha_seg_class.py uses 0.6)."""

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

    def _preprocess(self, patch: np.ndarray) -> jax.Array:
        """ARcm_seg.img_preprocess: /255, ImageNet mean/std."""
        norm = (patch.astype(np.float32) / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
        return jnp.asarray(norm)[None]

    def initialize(self, frame: np.ndarray, box) -> None:
        crop, h_f, w_f = sample_target_se(frame, box, self.search_factor,
                                          self.spec.input_sz)
        bic = transform_box_to_crop_se(box, h_f, w_f, self.spec.input_sz)
        self.kernel = self._init_jit(self.variables, self._preprocess(crop),
                                     jnp.asarray(bic)[None])

    def get_mask(self, frame: np.ndarray, box) -> np.ndarray:
        crop, _, _ = sample_target_se(frame, box, self.search_factor,
                                      self.spec.input_sz)
        mask_crop = np.asarray(self._mask_jit(
            self.variables, self._preprocess(crop), self.kernel))[0, :, :, 0]
        return map_mask_back(frame.shape[:2], box, self.search_factor,
                             mask_crop)


def build_alpha_refine(input_sz: int = 256, dtype=jnp.float32,
                       rng_seed: int = 0, pool_size: int = 8,
                       output_sz: Optional[int] = None):
    """Initialise an AlphaRefineNet + variables (randomly initialised;
    trained AR checkpoints load through utils/torch_convert
    .convert_alpha_refine + utils/checkpoint.load_variables)."""
    spec = RefineSpec(input_sz=input_sz, pool_size=pool_size,
                      output_sz=output_sz)
    net = AlphaRefineNet(spec=spec, dtype=dtype)
    p = jnp.zeros((1, input_sz, input_sz, 3), jnp.float32)
    b = jnp.asarray([[input_sz * 0.375, input_sz * 0.375,
                      input_sz * 0.25, input_sz * 0.25]])
    variables = jax.jit(lambda r: net.init(r, p, b, p,
                                           method=net.forward_train))(
        jax.random.PRNGKey(rng_seed))
    return net, variables, spec
