"""ATOM-style tracker: online discriminative classifier + IoUNet box
refinement.

Parity target: external/AR/pytracking/tracker/atom/atom.py (:1-836) and
ltr/models/bbreg/atom_iou_net.py — the vendored pytracking ATOM:
  - a two-layer online classifier whose filter is (re-)optimized with
    Gauss-Newton CG over a sample memory of augmented target crops,
  - an IoU-prediction network (reference-branch modulation vectors from
    PrRoI-pooled features; test branch scores candidate boxes) maximised at
    track time by gradient ascent on the box coordinates — the very op the
    reference needs exact PrRoI gradients for,
  - a simple motion model (classifier peak -> displaced box).

TPU-first redesign: the sample memory is a static-shape ring buffer pytree;
filter optimization is classic.optimization.gauss_newton_cg (one XLA
program, while the reference re-enters Python per CG step); IoU ascent uses
jax.grad through ops/prroi.prroi_pool (closed-form integral gradients —
no custom CUDA); every step is jitted with static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.classic.dcf import (gauss_label_2d, hann2d,
                                                  max2d, subpixel_peak)
from multi_modal_tracking_tpu.classic.augmentation import InitAugmenter
from multi_modal_tracking_tpu.classic.optimization import solve_normal_equations
from multi_modal_tracking_tpu.models.resnet import resnet18
from multi_modal_tracking_tpu.ops.crop import crop_resize
from multi_modal_tracking_tpu.ops.prroi import prroi_pool


class IoUNet(nn.Module):
    """atom_iou_net.py AtomIoUNet: reference branch pools the target box into
    modulation vectors; test branch pools candidate boxes and predicts IoU
    as <modulation * test_feat> -> MLP."""
    feat_dim: int = 256
    pool_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_feat, ref_box_xyxy, test_feat, cand_boxes_xyxy,
                 spatial_scale: float):
        """ref_feat/test_feat: (1, H, W, C); ref_box (4,); cand (N, 4).
        Returns predicted IoU logits (N,)."""
        ref = nn.Conv(self.feat_dim, (3, 3), padding=1, dtype=self.dtype,
                      name="conv_ref")(ref_feat)
        test = nn.Conv(self.feat_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_test")(test_feat)
        roi_r = jnp.concatenate([jnp.zeros((1, 1)), ref_box_xyxy[None]], axis=1)
        mod = prroi_pool(ref, roi_r, self.pool_size, self.pool_size,
                         spatial_scale)                       # (1, p, p, C)
        mod = mod.reshape(1, -1)
        mod = nn.Dense(self.feat_dim, dtype=self.dtype, name="fc_mod")(mod)

        n = cand_boxes_xyxy.shape[0]
        rois = jnp.concatenate([jnp.zeros((n, 1)), cand_boxes_xyxy], axis=1)
        pooled = prroi_pool(test, rois, self.pool_size, self.pool_size,
                            spatial_scale)                    # (N, p, p, C)
        pooled = nn.Dense(self.feat_dim, dtype=self.dtype, name="fc_test")(
            pooled.reshape(n, -1))
        x = pooled * mod                                      # modulation
        x = nn.relu(nn.Dense(self.feat_dim, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(1, dtype=self.dtype, name="fc_iou")(x)[:, 0]


class ATOMState(NamedTuple):
    filt: jax.Array           # (fh, fw, C) classifier filter
    samples: jax.Array        # (M, h, w, C) feature sample memory
    labels: jax.Array         # (M, h, w) gaussian targets
    weights: jax.Array        # (M,) sample weights (0 = empty slot)
    mem_ptr: jax.Array        # scalar int ring pointer
    center: jax.Array         # (2,) target centre (y, x) image px
    target_sz: jax.Array      # (2,) target (h, w) image px


@dataclasses.dataclass
class ATOMTracker:
    """Host wrapper with the framework tracker API (initialize/track)."""
    search_factor: float = 5.0
    crop_size: int = 288                # features at /16 -> 18x18
    filter_size: int = 4
    memory_size: int = 16
    learning_rate: float = 0.01
    reg: float = 0.1
    num_gn_iter: int = 2
    num_cg_iter: int = 5
    update_interval: int = 10
    sigma_factor: float = 0.25          # label sigma in target-size units
    refine: bool = True                 # IoUNet gradient-ascent refinement
    refine_steps: int = 5
    refine_lr: float = 1.0
    rng_seed: int = 0
    augmentation: Optional[dict] = None  # None -> DEFAULT_AUGMENTATION; {} off
    random_shift_factor: float = 1.0 / 3.0

    def __post_init__(self):
        # torchvision-layout ResNet-18 (reference ATOM's backbone,
        # external/AR/ltr/models/backbone/resnet.py): 'layer3' = 256ch /16.
        # Published torch weights convert via load_backbone().
        self.backbone = resnet18()
        self.iou_net = IoUNet()
        # init-sample augmentation (atom.py:473-523 generate_init_samples)
        self.augmenter = InitAugmenter(
            self.crop_size, spec=self.augmentation,
            random_shift_factor=self.random_shift_factor, seed=self.rng_seed)
        if self.augmenter.num_samples > self.memory_size:
            raise ValueError(
                f"memory_size={self.memory_size} < augmented init batch "
                f"{self.augmenter.num_samples}")
        z = jnp.zeros((1, self.crop_size, self.crop_size, 3))
        self._bb_vars = jax.jit(self.backbone.init)(
            jax.random.PRNGKey(self.rng_seed), z)
        feat = jax.eval_shape(lambda v, x: self.backbone.apply(v, x)["layer3"],
                              self._bb_vars, z)
        self._feat_hw = feat.shape[1:3]
        self._feat_c = feat.shape[3]
        self._scale = self._feat_hw[0] / self.crop_size
        box = jnp.asarray([0.0, 0.0, 10.0, 10.0])
        self._iou_vars = jax.jit(self.iou_net.init)(
            jax.random.PRNGKey(self.rng_seed + 1),
            jnp.zeros((1, *self._feat_hw, self._feat_c)), box,
            jnp.zeros((1, *self._feat_hw, self._feat_c)), box[None],
            self._scale)
        self._init_jit = jax.jit(self._init_fn)
        self._track_jit = jax.jit(self._track_fn)
        self._optim_jit = jax.jit(self._optimize_filter)

    def load_backbone(self, state_dict) -> None:
        """Warm-start the feature extractor from a torchvision/pytracking
        ResNet state dict (external/AR/ltr/models/backbone/resnet.py layout;
        {torch_key: np.ndarray} as from torch_convert.load_torch_state_dict)."""
        from multi_modal_tracking_tpu.utils.torch_convert import convert_resnet
        self._bb_vars, _ = convert_resnet(state_dict, self._bb_vars,
                                          strict=False, verbose=False)

    # ----------------------------------------------------------- device fns
    def _features(self, image, center, size) -> Tuple[jax.Array, jax.Array]:
        box = jnp.stack([center[1] - size[1] / 2.0, center[0] - size[0] / 2.0,
                         size[1], size[0]])
        crop, rf = crop_resize(image, box, self.search_factor, self.crop_size)
        feat = self.backbone.apply(self._bb_vars, crop[None] / 255.0)["layer3"]
        return feat, 1.0 / rf           # image px per crop px

    def _apply_filter(self, filt, samples) -> jax.Array:
        """conv2d of the filter over (M, h, w, C) samples -> (M, h, w)."""
        return jax.lax.conv_general_dilated(
            samples, filt[..., None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    def _optimize_filter(self, state: ATOMState) -> ATOMState:
        w = jnp.sqrt(jnp.maximum(state.weights, 0.0))[:, None, None]

        def residual(filt):
            r = (self._apply_filter(filt, state.samples) - state.labels) * w
            return {"data": r, "reg": jnp.sqrt(self.reg) * filt}

        filt = state.filt
        for _ in range(self.num_gn_iter):   # linear problem: GN == repeated CG
            filt = solve_normal_equations(residual, filt,
                                          num_iter=self.num_cg_iter)
        return state._replace(filt=filt)

    def _label(self, center_rc) -> jax.Array:
        h, w = self._feat_hw
        sigma = self.sigma_factor * jnp.sqrt(h * w) / self.search_factor
        return gauss_label_2d(h, w, sigma, center_rc)

    def _init_fn(self, image, box_xywh) -> ATOMState:
        center = jnp.asarray([box_xywh[1] + box_xywh[3] / 2.0,
                              box_xywh[0] + box_xywh[2] / 2.0])
        size = jnp.asarray([box_xywh[3], box_xywh[2]])
        # augmented init batch (atom.py:473-523): one crop, A transformed
        # copies, ONE batched backbone forward, + feature-dropout copies.
        box = jnp.stack([center[1] - size[1] / 2.0, center[0] - size[0] / 2.0,
                         size[1], size[0]])
        crop, _ = crop_resize(image, box, self.search_factor, self.crop_size)
        aug = self.augmenter(crop)                       # (A_img, H, W, 3)
        feats = self.backbone.apply(self._bb_vars, aug / 255.0)["layer3"]
        feats = self.augmenter.augment_features(
            feats, jax.random.PRNGKey(self.rng_seed + 2))  # (A, h, w, C)
        A = self.augmenter.num_samples
        h, w = self._feat_hw
        # per-sample label centres follow each transform's target shift
        centers = jnp.asarray([h / 2.0, w / 2.0])[None] + \
            jnp.asarray(self.augmenter.shifts) * self._scale
        aug_labels = jax.vmap(self._label)(centers)      # (A, h, w)
        samples = jnp.zeros((self.memory_size, h, w, self._feat_c),
                            feats.dtype).at[:A].set(feats)
        labels = jnp.zeros((self.memory_size, h, w)).at[:A].set(aug_labels)
        # uniform init weights (pytracking init_sample_weights = 1/A)
        weights = jnp.zeros((self.memory_size,)).at[:A].set(1.0 / A)
        filt = jnp.zeros((self.filter_size, self.filter_size, self._feat_c))
        st = ATOMState(filt=filt, samples=samples, labels=labels,
                       weights=weights, mem_ptr=jnp.asarray(A, jnp.int32),
                       center=center, target_sz=size)
        return self._optimize_filter(st)

    def _refine_box(self, ref_feat, ref_box, test_feat, box_xyxy) -> jax.Array:
        """IoUNet gradient ascent on box coords (atom.py optimize_boxes):
        fixed-step ascent of the predicted IoU, box in feature-crop px."""
        def iou_of(b):
            return self.iou_net.apply(self._iou_vars, ref_feat, ref_box,
                                      test_feat, b[None], self._scale)[0]

        def step(b, _):
            g = jax.grad(iou_of)(b)
            # step relative to box size, like the reference's box_lr scaling
            wh = jnp.concatenate([b[2:] - b[:2]] * 2)
            return b + self.refine_lr * g * wh, None

        b, _ = jax.lax.scan(step, box_xyxy, None, length=self.refine_steps)
        return b

    def _track_fn(self, state: ATOMState, image, ref_feat, ref_box):
        feat, px = self._features(image, state.center, state.target_sz)
        score = self._apply_filter(state.filt, feat)[0]
        score = score * hann2d(*self._feat_hw)
        conf, peak = max2d(score)
        peak = subpixel_peak(score, peak)
        h, w = self._feat_hw
        disp = (peak - jnp.asarray([h / 2.0, w / 2.0])) * (1.0 / self._scale) * px
        center = state.center + disp

        # candidate box in feature coords for IoU refinement
        fs = self._scale / px           # feature px per image px
        c_feat = jnp.asarray([h / 2.0, w / 2.0]) + disp * fs
        sz_feat = state.target_sz * fs
        box_xyxy = jnp.asarray([c_feat[1] - sz_feat[1] / 2, c_feat[0] - sz_feat[0] / 2,
                                c_feat[1] + sz_feat[1] / 2, c_feat[0] + sz_feat[0] / 2])
        if self.refine:
            box_xyxy = self._refine_box(ref_feat, ref_box, feat,
                                        box_xyxy / self._scale) * self._scale
            c_feat = jnp.asarray([(box_xyxy[1] + box_xyxy[3]) / 2,
                                  (box_xyxy[0] + box_xyxy[2]) / 2])
            sz_new = jnp.asarray([box_xyxy[3] - box_xyxy[1],
                                  box_xyxy[2] - box_xyxy[0]])
            center = state.center + (c_feat - jnp.asarray([h / 2.0, w / 2.0])) / fs
            target_sz = jnp.clip(sz_new / fs, 4.0, None)
        else:
            target_sz = state.target_sz

        # memory insert at ring pointer
        lbl_center = jnp.asarray([h / 2.0, w / 2.0]) + \
            (center - state.center) * fs
        # the A augmented init samples are never overwritten (pytracking's
        # update_memory keeps all num_init_samples protected for the whole
        # sequence); the ring wraps into slots A..M-1
        M = self.memory_size
        A = min(self.augmenter.num_samples, M - 1)
        ptr = jnp.where(state.mem_ptr < M, state.mem_ptr,
                        A + (state.mem_ptr - M) % (M - A))
        samples = jax.lax.dynamic_update_index_in_dim(state.samples, feat[0], ptr, 0)
        labels = jax.lax.dynamic_update_index_in_dim(
            state.labels, self._label(lbl_center), ptr, 0)
        # exponential forgetting (atom.py update_memory): old weights decay,
        # the new sample enters at lr, frame 0 stays anchored
        weights = (state.weights * (1.0 - self.learning_rate)).at[ptr].set(
            self.learning_rate)
        weights = weights.at[0].max(0.25)
        new_st = ATOMState(filt=state.filt, samples=samples, labels=labels,
                           weights=weights, mem_ptr=state.mem_ptr + 1,
                           center=center, target_sz=target_sz)
        return new_st, conf

    # --------------------------------------------------------------- host API
    def initialize(self, image: np.ndarray, info: dict):
        img = jnp.asarray(np.asarray(image), jnp.float32)
        self._state = self._init_jit(img, jnp.asarray(info["init_bbox"],
                                                      jnp.float32))
        # reference branch for IoUNet modulation, cached for the sequence
        feat, _ = jax.jit(self._features)(img, self._state.center,
                                          self._state.target_sz)
        h, w = self._feat_hw
        # the target sits centred in the crop at 1/search_factor of its extent
        ext = jnp.asarray([w, h]) / self.search_factor
        self._ref_feat = feat
        self._ref_box = jnp.asarray([w / 2 - ext[0] / 2, h / 2 - ext[1] / 2,
                                     w / 2 + ext[0] / 2, h / 2 + ext[1] / 2]) / self._scale
        self._frame = 0

    def track(self, image: np.ndarray, info: Optional[dict] = None) -> dict:
        self._frame += 1
        img = jnp.asarray(np.asarray(image), jnp.float32)
        self._state, conf = self._track_jit(self._state, img,
                                            self._ref_feat, self._ref_box)
        if self._frame % self.update_interval == 0:
            self._state = self._optim_jit(self._state)
        c = np.asarray(self._state.center)
        s = np.asarray(self._state.target_sz)
        return {"target_bbox": [float(c[1] - s[1] / 2), float(c[0] - s[0] / 2),
                                float(s[1]), float(s[0])],
                "pred_score": float(conf)}
