"""ATOM-style tracker: online discriminative classifier + IoUNet box
refinement.

Parity target: external/AR/pytracking/tracker/atom/atom.py (:1-836) and
ltr/models/bbreg/atom_iou_net.py — the vendored pytracking ATOM:
  - a two-layer online classifier whose filter is (re-)optimized with
    Gauss-Newton CG over a sample memory of augmented target crops,
  - the reference-exact AtomIoUNet (classic/dimpnet.py): reference-branch
    modulation vectors from PrRoI-pooled layer2/layer3 features, test branch
    scores jittered candidate boxes, maximised at track time by gradient
    ascent on the box coordinates — the very op the reference needs exact
    PrRoI gradients for (atom.py:700-760 optimize_boxes/refine_target_box),
  - a simple motion model (classifier peak -> displaced box).

Published ATOM checkpoints (ltr/models/bbreg/atom.py ATOMnet:
feature_extractor + bb_regressor) convert via load_network().

TPU-first redesign: the sample memory is a static-shape ring buffer pytree;
filter optimization is classic.optimization.gauss_newton_cg (one XLA
program, while the reference re-enters Python per CG step); IoU ascent uses
jax.grad through ops/prroi.prroi_pool (closed-form integral gradients —
no custom CUDA); the proposal jitter + ascent + top-k average is one
static-shape vmapped program; every step is jitted.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.classic.dcf import (FLAG_HARD_NEGATIVE,
                                                  FLAG_NORMAL, FLAG_NOT_FOUND,
                                                  FLAG_UNCERTAIN,
                                                  gauss_label_2d, hann2d,
                                                  localize_advanced, max2d,
                                                  subpixel_peak)
from multi_modal_tracking_tpu.classic.augmentation import InitAugmenter
from multi_modal_tracking_tpu.classic.common import (FLAG_NAMES as _FLAG_NAMES,
                                                     combine_nets as _combine,
                                                     protected_ring_insert,
                                                     split_nets as _split)
from multi_modal_tracking_tpu.classic.dimpnet import AtomIoUNet
from multi_modal_tracking_tpu.classic.optimization import solve_normal_equations
from multi_modal_tracking_tpu.models.resnet import (imagenet_preprocess,
                                                    resnet18)
from multi_modal_tracking_tpu.ops.crop import crop_resize


def refine_box_iounet(iou_net: AtomIoUNet, iou_vars, iou_feat, modulation,
                      box_xywh: jax.Array, rng: jax.Array, *,
                      num_random: int = 9, jitter_pos: float = 0.1,
                      jitter_sz: float = 0.5, steps: int = 5,
                      step_length: float = 1.0, step_decay: float = 1.0,
                      topk: int = 3, max_aspect_ratio: float = 6.0):
    """pytracking refine_target_box (dimp.py:651-712, atom.py:700-772):
    jitter num_random proposals around the predicted box (uniform centre +
    size noise scaled by sqrt(area), sizes clamped at min_edge/3),
    gradient-ascend the predicted IoU on all of them (steps x step_length
    with multiplicative decay, coordinate steps scaled by box size), drop
    boxes with aspect ratio outside (1/max_ar, max_ar), then average the
    top-k survivors by final IoU. All proposals keep a static shape: the
    aspect filter masks IoUs to -inf instead of slicing, and when every box
    is filtered the input box is returned unchanged (reference early-return
    at dimp.py:688). box_xywh in crop px; returns (refined box xywh,
    mean top-k IoU)."""
    sq = jnp.sqrt(jnp.maximum(box_xywh[2] * box_xywh[3], 1.0))
    factor = jnp.stack([jitter_pos * sq, jitter_pos * sq,
                        jitter_sz * sq, jitter_sz * sq])
    noise = (jax.random.uniform(rng, (num_random, 4)) - 0.5) * factor
    min_edge = jnp.minimum(box_xywh[2], box_xywh[3]) / 3.0
    new_sz = jnp.maximum(box_xywh[2:] + noise[:, 2:], min_edge)
    new_c = box_xywh[:2] + box_xywh[2:] / 2.0 + noise[:, :2]
    jittered = jnp.concatenate([new_c - new_sz / 2.0, new_sz], axis=1)
    props = jnp.concatenate([box_xywh[None], jittered], axis=0)  # (P, 4)

    def iou_of(batch_props):
        return iou_net.apply(iou_vars, modulation, iou_feat,
                             batch_props[None], method="predict_iou")[0]

    def ascend(carry, _):
        props, step = carry
        ious, g = jax.vjp(iou_of, props)
        grad = g(jnp.ones_like(ious))[0]
        scale = jnp.concatenate([props[:, 2:], props[:, 2:]], axis=1)
        return (props + step * grad * scale, step * step_decay), None

    (props, _), _ = jax.lax.scan(ascend, (props, jnp.float32(step_length)),
                                 None, length=steps)
    props = props.at[:, 2:].set(jnp.maximum(props[:, 2:], 1.0))
    ar = props[:, 2] / props[:, 3]
    valid = (ar < max_aspect_ratio) & (ar > 1.0 / max_aspect_ratio)
    ious = jnp.where(valid, iou_of(props), -jnp.inf)
    k = min(topk, props.shape[0])
    top_iou, top_idx = jax.lax.top_k(ious, k)
    sel = valid[top_idx].astype(props.dtype)
    denom = jnp.maximum(jnp.sum(sel), 1.0)
    best = jnp.sum(props[top_idx] * sel[:, None], axis=0) / denom
    mean_iou = jnp.sum(jnp.where(sel > 0, top_iou, 0.0)) / denom
    any_valid = jnp.any(valid)
    best = jnp.where(any_valid, best, box_xywh)
    return best, jnp.where(any_valid, mean_iou, 0.0)


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
    # scale pyramid for the classifier localisation: reference runs one
    # scale when the IoUNet estimates size (default.py:54) and
    # 1.02**arange(-2,3) in the no-IoUNet config (multiscale_no_iounet.py);
    # the best-scale factor updates target_sz when refine=False
    scale_factors: Tuple[float, ...] = (1.0,)
    refine_steps: int = 5
    refine_lr: float = 1.0
    num_random_boxes: int = 9           # num_init_random_boxes
    iounet_topk: int = 3                # iounet_k
    rng_seed: int = 0
    augmentation: Optional[dict] = None  # None -> DEFAULT_AUGMENTATION; {} off
    random_shift_factor: float = 1.0 / 3.0
    # advanced localisation (atom.py:341-404 + default.py:77-85): distractor /
    # hard-negative / lost detection gating state + memory updates
    advanced_localization: bool = True
    target_not_found_threshold: float = 0.25
    distractor_threshold: float = 0.8
    hard_negative_threshold: float = 0.5
    target_neighborhood_scale: float = 2.2
    displacement_scale: float = 0.8
    hard_negative_learning_rate: float = 0.02
    hard_negative_cg_iter: int = 5      # hard_negative_CG_iter

    def __post_init__(self):
        # torchvision-layout ResNet-18 (reference ATOM's backbone,
        # external/AR/ltr/models/backbone/resnet.py): 'layer3' = 256ch /16.
        # Published torch weights convert via load_network()/load_backbone().
        self.backbone = resnet18()
        # reference-exact AtomIoUNet over (layer2 /8, layer3 /16)
        self.iou_net = AtomIoUNet(input_dim=(128, 256))
        # init-sample augmentation (atom.py:473-523 generate_init_samples)
        self.augmenter = InitAugmenter(
            self.crop_size, spec=self.augmentation,
            random_shift_factor=self.random_shift_factor, seed=self.rng_seed)
        if self.augmenter.num_samples >= self.memory_size:
            # need >= 1 free slot: the ring wraps into slots A..M-1 and must
            # never clobber the protected init samples (pytracking keeps all
            # num_init_samples for the whole sequence)
            raise ValueError(
                f"memory_size={self.memory_size} must exceed the augmented "
                f"init batch {self.augmenter.num_samples}")
        z = jnp.zeros((1, self.crop_size, self.crop_size, 3))
        self._bb_vars = jax.jit(self.backbone.init)(
            jax.random.PRNGKey(self.rng_seed), z)
        shapes = jax.eval_shape(self.backbone.apply, self._bb_vars, z)
        self._feat_hw = shapes["layer3"].shape[1:3]
        self._feat_c = shapes["layer3"].shape[3]
        self._l2_hw = shapes["layer2"].shape[1:3]
        self._scale = self._feat_hw[0] / self.crop_size
        box = jnp.asarray([10.0, 10.0, 40.0, 40.0])
        self._iou_vars = jax.jit(self.iou_net.init)(
            jax.random.PRNGKey(self.rng_seed + 1),
            jnp.zeros((1, *self._l2_hw, 128)),
            jnp.zeros((1, *self._feat_hw, self._feat_c)),
            jnp.zeros((1, *self._l2_hw, 128)),
            jnp.zeros((1, *self._feat_hw, self._feat_c)),
            box[None], box[None, None])
        # network variables are passed as jit ARGUMENTS (never closed over:
        # closure params inline into the HLO — CLAUDE.md remote-compile
        # limit — and would silently pin pre-load_network weights)
        self._init_jit = jax.jit(self._init_fn)
        self._track_jit = jax.jit(self._track_fn)
        self._mod_jit = jax.jit(self._modulation)
        self._optim_jit = jax.jit(self._optimize_filter)
        # hard-negative reaction: one extra CG run with more iterations
        # (atom.py:285-286 filter_optimizer.run(hard_negative_CG_iter))
        self._optim_hn_jit = jax.jit(lambda st: self._optimize_filter(
            st, num_gn_iter=1, num_cg_iter=self.hard_negative_cg_iter))

    def load_backbone(self, state_dict) -> None:
        """Warm-start the feature extractor from a torchvision/pytracking
        ResNet state dict (external/AR/ltr/models/backbone/resnet.py layout;
        {torch_key: np.ndarray} as from torch_convert.load_torch_state_dict)."""
        from multi_modal_tracking_tpu.utils.torch_convert import convert_resnet
        self._bb_vars, _ = convert_resnet(state_dict, self._bb_vars,
                                          strict=False, verbose=False)

    def load_network(self, state_dict, strict: bool = True) -> None:
        """Load a full ATOMnet checkpoint (ltr/models/bbreg/atom.py:
        feature_extractor.* + bb_regressor.*) into the backbone and the
        IoUNet via torch_convert.convert_dimpnet."""
        from multi_modal_tracking_tpu.utils.torch_convert import convert_dimpnet
        combined = _combine({"backbone": self._bb_vars,
                             "bb_regressor": self._iou_vars})
        converted, _ = convert_dimpnet(state_dict, combined, strict=strict,
                                       verbose=False)
        split = _split(converted, ("backbone", "bb_regressor"))
        self._bb_vars = split["backbone"]
        self._iou_vars = split["bb_regressor"]

    # ----------------------------------------------------------- device fns
    def _features(self, bb_vars, image, center, size):
        """Crop + backbone. Returns ({'layer2','layer3'}, px-per-crop-px)."""
        box = jnp.stack([center[1] - size[1] / 2.0, center[0] - size[0] / 2.0,
                         size[1], size[0]])
        crop, rf = crop_resize(image, box, self.search_factor, self.crop_size)
        feats = self.backbone.apply(bb_vars, imagenet_preprocess(crop[None]))
        return feats, 1.0 / rf           # image px per crop px

    def _features_pyramid(self, bb_vars, image, center, size):
        """One crop per scale factor, ONE batched backbone forward.
        Returns ({'layer2','layer3'} with leading scale dim, (S,) px)."""
        box = jnp.stack([center[1] - size[1] / 2.0, center[0] - size[0] / 2.0,
                         size[1], size[0]])
        crops, pxs = [], []
        for sc in self.scale_factors:    # static unroll (few scales)
            crop, rf = crop_resize(image, box, self.search_factor * sc,
                                   self.crop_size)
            crops.append(crop)
            pxs.append(1.0 / rf)
        feats = self.backbone.apply(bb_vars,
                                    imagenet_preprocess(jnp.stack(crops)))
        return feats, jnp.stack(pxs)

    def _apply_filter(self, filt, samples) -> jax.Array:
        """conv2d of the filter over (M, h, w, C) samples -> (M, h, w)."""
        return jax.lax.conv_general_dilated(
            samples, filt[..., None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    def _optimize_filter(self, state: ATOMState,
                         num_gn_iter: Optional[int] = None,
                         num_cg_iter: Optional[int] = None) -> ATOMState:
        w = jnp.sqrt(jnp.maximum(state.weights, 0.0))[:, None, None]

        def residual(filt):
            r = (self._apply_filter(filt, state.samples) - state.labels) * w
            return {"data": r, "reg": jnp.sqrt(self.reg) * filt}

        filt = state.filt
        gn = self.num_gn_iter if num_gn_iter is None else num_gn_iter
        cg = self.num_cg_iter if num_cg_iter is None else num_cg_iter
        for _ in range(gn):                 # linear problem: GN == repeated CG
            filt = solve_normal_equations(residual, filt, num_iter=cg)
        return state._replace(filt=filt)

    def _label(self, center_rc) -> jax.Array:
        h, w = self._feat_hw
        sigma = self.sigma_factor * jnp.sqrt(h * w) / self.search_factor
        return gauss_label_2d(h, w, sigma, center_rc)

    def _init_fn(self, bb_vars, image, box_xywh) -> ATOMState:
        center = jnp.asarray([box_xywh[1] + box_xywh[3] / 2.0,
                              box_xywh[0] + box_xywh[2] / 2.0])
        size = jnp.asarray([box_xywh[3], box_xywh[2]])
        # augmented init batch (atom.py:473-523): one crop, A transformed
        # copies, ONE batched backbone forward, + feature-dropout copies.
        box = jnp.stack([center[1] - size[1] / 2.0, center[0] - size[0] / 2.0,
                         size[1], size[0]])
        crop, _ = crop_resize(image, box, self.search_factor, self.crop_size)
        aug = self.augmenter(crop)                       # (A_img, H, W, 3)
        feats = self.backbone.apply(bb_vars,
                                    imagenet_preprocess(aug))["layer3"]
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

    def _modulation(self, nets, image, center, size):
        """Reference-branch modulation vectors from the init frame
        (atom.py init_iou_net): target box in crop px."""
        feats, px = self._features(nets["bb"], image, center, size)
        sz_crop = size / px                              # (h, w) crop px
        c = self.crop_size / 2.0
        box = jnp.stack([c - sz_crop[1] / 2.0, c - sz_crop[0] / 2.0,
                         sz_crop[1], sz_crop[0]])
        return self.iou_net.apply(nets["iou"], feats["layer2"],
                                  feats["layer3"], box[None],
                                  method="get_modulation")

    def _track_fn(self, nets, state: ATOMState, image, modulation,
                  frame_idx=0):
        feats, pxs = self._features_pyramid(nets["bb"], image, state.center,
                                            state.target_sz)
        scores = self._apply_filter(state.filt, feats["layer3"])  # (S, h, w)
        scores = scores * hann2d(*self._feat_hw)[None]
        # best scale by peak response (atom.py:322-323), then localise on it
        best = jnp.argmax(scores.max(axis=(1, 2)))
        score = scores[best]
        feat = feats["layer3"][best][None]
        px = pxs[best]
        scale_best = jnp.take(jnp.asarray(self.scale_factors), best)
        h, w = self._feat_hw
        fs = 1.0 / px                   # crop px per image px
        if self.advanced_localization:
            disp_sc, flag, conf = localize_advanced(
                score, state.target_sz * fs * self._scale,
                not_found_threshold=self.target_not_found_threshold,
                distractor_threshold=self.distractor_threshold,
                hard_negative_threshold=self.hard_negative_threshold,
                target_neighborhood_scale=self.target_neighborhood_scale,
                displacement_scale=self.displacement_scale)
            peak = disp_sc + jnp.asarray([(h - 1) / 2.0, (w - 1) / 2.0])
        else:
            conf, peak = max2d(score)
            peak = subpixel_peak(score, peak)
            flag = jnp.asarray(FLAG_NORMAL, jnp.int32)
        found = flag != FLAG_NOT_FOUND
        # update_flag (atom.py:270): insert into memory only on confident
        # frames (normal / hard-negative)
        update_ok = found & (flag != FLAG_UNCERTAIN)
        disp = (peak - jnp.asarray([h / 2.0, w / 2.0])) * (1.0 / self._scale) * px
        center = state.center + disp

        # candidate box in crop px for IoU refinement
        c_crop = jnp.asarray([self.crop_size / 2.0, self.crop_size / 2.0]) + \
            disp * fs
        sz_crop = state.target_sz * fs
        if self.refine:
            box = jnp.stack([c_crop[1] - sz_crop[1] / 2.0,
                             c_crop[0] - sz_crop[0] / 2.0,
                             sz_crop[1], sz_crop[0]])
            iou_feat = self.iou_net.apply(nets["iou"],
                                          feats["layer2"][best][None],
                                          feats["layer3"][best][None],
                                          method="get_iou_feat")
            # fold on the frame index, NOT mem_ptr: the ring pointer freezes
            # on non-updating (uncertain/not-found) frames, which would reuse
            # the same proposal jitter for the whole stretch — pytracking
            # draws fresh proposals every frame (atom.py refine_target_box)
            rng = jax.random.fold_in(jax.random.PRNGKey(self.rng_seed + 3),
                                     frame_idx)
            refined, _ = refine_box_iounet(
                self.iou_net, nets["iou"], iou_feat, modulation, box, rng,
                num_random=self.num_random_boxes, steps=self.refine_steps,
                step_length=self.refine_lr, topk=self.iounet_topk)
            c_new = jnp.asarray([refined[1] + refined[3] / 2.0,
                                 refined[0] + refined[2] / 2.0])
            center = state.center + \
                (c_new - jnp.asarray([self.crop_size / 2.0] * 2)) * px
            target_sz = jnp.clip(jnp.asarray([refined[3], refined[2]]) * px,
                                 4.0, None)
        else:
            # no IoUNet: the best pyramid scale sets the size
            # (atom.py:252-253 update_state(new_pos, sample_scales[ind]))
            target_sz = state.target_sz * scale_best
        # position/scale update gated on the flag (atom.py:247-252: state is
        # frozen when NOT_FOUND; uncertain still moves the position because
        # update_scale_when_uncertain defaults True)
        center = jnp.where(found, center, state.center)
        target_sz = jnp.where(found, target_sz, state.target_sz)

        # gated protected-ring memory insert (classic/common.py)
        lbl_center = jnp.asarray([h / 2.0, w / 2.0]) + \
            (center - state.center) * fs * self._scale
        (samples, labels), weights, mem_ptr = protected_ring_insert(
            state.mem_ptr, update_ok, flag,
            [(state.samples, feat[0]), (state.labels, self._label(lbl_center))],
            state.weights, memory_size=self.memory_size,
            n_protected=min(self.augmenter.num_samples, self.memory_size - 1),
            learning_rate=self.learning_rate,
            hard_negative_learning_rate=self.hard_negative_learning_rate)
        new_st = ATOMState(filt=state.filt, samples=samples, labels=labels,
                           weights=weights, mem_ptr=mem_ptr,
                           center=center, target_sz=target_sz)
        return new_st, conf, flag

    # --------------------------------------------------------------- host API
    @property
    def _nets(self):
        return {"bb": self._bb_vars, "iou": self._iou_vars}

    def initialize(self, image: np.ndarray, info: dict):
        img = jnp.asarray(np.asarray(image), jnp.float32)
        self._state = self._init_jit(self._bb_vars, img,
                                     jnp.asarray(info["init_bbox"],
                                                 jnp.float32))
        # reference branch for IoUNet modulation, cached for the sequence
        self._mod = self._mod_jit(self._nets, img, self._state.center,
                                  self._state.target_sz)
        self._frame = 0

    def track(self, image: np.ndarray, info: Optional[dict] = None) -> dict:
        self._frame += 1
        img = jnp.asarray(np.asarray(image), jnp.float32)
        self._state, conf, flag = self._track_jit(
            self._nets, self._state, img, self._mod,
            jnp.asarray(self._frame, jnp.int32))
        flag = int(flag)
        # filter refresh (atom.py:285-289): immediate boosted run on a hard
        # negative, otherwise the periodic schedule (train_skipping)
        if flag == FLAG_HARD_NEGATIVE:
            self._state = self._optim_hn_jit(self._state)
        elif self._frame % self.update_interval == 0:
            self._state = self._optim_jit(self._state)
        c = np.asarray(self._state.center)
        s = np.asarray(self._state.target_sz)
        return {"target_bbox": [float(c[1] - s[1] / 2), float(c[0] - s[0] / 2),
                                float(s[1]), float(s[0])],
                "pred_score": float(conf), "flag": _FLAG_NAMES[flag]}


