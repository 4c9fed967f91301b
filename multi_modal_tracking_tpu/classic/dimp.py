"""DiMP tracker: learned discriminative filter prediction + IoUNet box
refinement, driving the reference-fidelity modules in classic/dimpnet.py.

Parity target: external/AR/pytracking/tracker/dimp/dimp.py (:1-865) with
ltr/models/tracking/dimpnet.py (dimpnet18/dimpnet50):
  - classification features from the backbone's layer3 through the learned
    feature extractor (residual block(s) + conv + InstanceL2Norm),
  - filter INITIALIZED by FilterInitializerLinear (learned 3x3 conv + PrRoI
    pool of the target region, dimp.py init_classifier),
  - filter REFINED by the learned DiMPSteepestDescentGN (label/mask/weight
    maps predicted from distance bins, learned step length + filter reg)
    — net_opt_iter steps at init, net_opt_update_iter per memory update
    (dimp.py update_classifier),
  - sample memory with exponential forgetting and protected init samples,
  - AtomIoUNet box refinement shared with ATOM (jittered proposals +
    gradient ascent + top-k average, dimp.py refine_target_box).

Published DiMPnet checkpoints (feature_extractor + classifier +
bb_regressor) convert via load_network().

TPU-first: the whole per-frame step (crop -> backbone -> classify ->
localise -> IoU ascent -> memory insert) is ONE jitted device function; the
SD-GN refinement is a lax.scan unroll inside another; memory is a
static-shape ring buffer; PrRoI gradients are closed-form (ops/prroi.py)."""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.classic.atom import refine_box_iounet
from multi_modal_tracking_tpu.classic.common import (FLAG_NAMES as _FLAG_NAMES,
                                                     combine_nets as _combine,
                                                     protected_ring_insert,
                                                     split_nets as _split)
from multi_modal_tracking_tpu.classic.augmentation import InitAugmenter
from multi_modal_tracking_tpu.classic.dcf import (FLAG_HARD_NEGATIVE,
                                                  FLAG_NORMAL, FLAG_NOT_FOUND,
                                                  FLAG_UNCERTAIN, hann2d,
                                                  localize_advanced, max2d,
                                                  subpixel_peak)
from multi_modal_tracking_tpu.classic.dimpnet import AtomIoUNet, DiMPClassifier
from multi_modal_tracking_tpu.models.resnet import (imagenet_preprocess,
                                                    resnet18, resnet50)
from multi_modal_tracking_tpu.ops.crop import crop_resize

# (backbone ctor, layer3 ch, layer2 ch, clf feature_dim, clf out_dim,
#  clf residual blocks) per dimpnet assembly (dimpnet.py:100-198)
_ARCH = {
    "resnet18": (resnet18, 256, 128, 256, 256, 1),
    "resnet50": (resnet50, 1024, 512, 256, 512, 0),
}


class DiMPState(NamedTuple):
    filt: jax.Array           # (fs, fs, Cclf) classification filter
    samples: jax.Array        # (M, h', w', Cclf) classification features
    boxes: jax.Array          # (M, 4) per-sample target xywh in crop px
    weights: jax.Array        # (M,) sample weights (0 = empty slot)
    mem_ptr: jax.Array        # scalar int ring pointer
    center: jax.Array         # (2,) target centre (y, x) image px
    target_sz: jax.Array      # (2,) target (h, w) image px


@dataclasses.dataclass
class DiMPTracker:
    """Host wrapper with the framework tracker API (initialize/track)."""
    arch: str = "resnet18"              # "resnet50" for dimp50 checkpoints
    search_factor: float = 5.0          # search_area_scale
    crop_size: int = 288                # image_sample_size (18*16)
    filter_size: int = 4
    memory_size: int = 16               # sample_memory_size (ref: 50)
    learning_rate: float = 0.01
    init_opt_iter: int = 10             # net_opt_iter
    update_opt_iter: int = 2            # net_opt_update_iter
    update_interval: int = 20           # train_skipping
    window_output: bool = False         # dimp50 default
    refine: bool = True
    refine_steps: int = 5               # box_refinement_iter
    refine_lr: float = 1.0              # box_refinement_step_length
    num_random_boxes: int = 9           # num_init_random_boxes
    iounet_topk: int = 3                # iounet_k
    rng_seed: int = 0
    augmentation: Optional[dict] = None
    random_shift_factor: float = 1.0 / 3.0
    # advanced localisation (dimp.py:239-304 + dimp50.py:42-49)
    advanced_localization: bool = True
    target_not_found_threshold: float = 0.25
    distractor_threshold: float = 0.8
    hard_negative_threshold: float = 0.5
    target_neighborhood_scale: float = 2.2
    displacement_scale: float = 0.8
    hard_negative_learning_rate: float = 0.02
    hn_opt_iter: int = 1                # net_opt_hn_iter

    def __post_init__(self):
        ctor, l3c, l2c, fdim, odim, nblocks = _ARCH[self.arch]
        self.backbone = ctor()
        self.classifier = DiMPClassifier(
            feature_dim=fdim, out_dim=odim, num_blocks=nblocks,
            filter_size=self.filter_size, feat_stride=16,
            optim_iter=self.init_opt_iter)
        self.iou_net = AtomIoUNet(input_dim=(l2c, l3c))
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
        self._l2_hw = shapes["layer2"].shape[1:3]
        self._scale = self._feat_hw[0] / self.crop_size   # feat px / crop px
        self._clf_c = odim
        l3 = jnp.zeros((1, *self._feat_hw, l3c))
        bb0 = jnp.asarray([[100.0, 100.0, 60.0, 60.0]])
        self._clf_vars = jax.jit(self.classifier.init)(
            jax.random.PRNGKey(self.rng_seed + 1), l3, bb0)
        self._iou_vars = jax.jit(self.iou_net.init)(
            jax.random.PRNGKey(self.rng_seed + 2),
            jnp.zeros((1, *self._l2_hw, l2c)), l3,
            jnp.zeros((1, *self._l2_hw, l2c)), l3,
            bb0, bb0[:, None])
        # network variables are passed as jit ARGUMENTS (never closed over:
        # closure params inline into the HLO — CLAUDE.md remote-compile
        # limit — and would silently pin pre-load_network weights)
        self._init_jit = jax.jit(self._init_fn)
        self._track_jit = jax.jit(self._track_fn)
        self._update_jit = jax.jit(self._update_fn)
        # hard-negative reaction (dimp.py:619-620: net_opt_hn_iter SD steps
        # with the boosted-lr memory, run immediately on the flagged frame)
        self._update_hn_jit = jax.jit(
            lambda nets, st: self._update_fn(nets, st,
                                             num_iter=self.hn_opt_iter))
        self._mod_jit = jax.jit(self._modulation)

    @property
    def _nets(self):
        return {"bb": self._bb_vars, "clf": self._clf_vars,
                "iou": self._iou_vars}

    def load_network(self, state_dict, strict: bool = True) -> None:
        """Load a full DiMPnet checkpoint (dimpnet.py assembly:
        feature_extractor.* + classifier.* + bb_regressor.*)."""
        from multi_modal_tracking_tpu.utils.torch_convert import convert_dimpnet
        combined = _combine({"backbone": self._bb_vars,
                             "classifier": self._clf_vars,
                             "bb_regressor": self._iou_vars})
        converted, _ = convert_dimpnet(state_dict, combined, strict=strict,
                                       verbose=False)
        split = _split(converted, ("backbone", "classifier", "bb_regressor"))
        self._bb_vars = split["backbone"]
        self._clf_vars = split["classifier"]
        self._iou_vars = split["bb_regressor"]

    # ----------------------------------------------------------- device fns
    def _features(self, nets, image, center, size):
        box = jnp.stack([center[1] - size[1] / 2.0, center[0] - size[0] / 2.0,
                         size[1], size[0]])
        crop, rf = crop_resize(image, box, self.search_factor, self.crop_size)
        feats = self.backbone.apply(nets["bb"], imagenet_preprocess(crop[None]))
        clf = self.classifier.apply(nets["clf"], feats["layer3"],
                                    method="extract_classification_feat")
        return feats, clf, 1.0 / rf      # image px per crop px

    def _target_box_crop(self, size_img, px, shift_yx=None):
        """Target xywh in crop px, centred (+ optional (row, col) shift)."""
        sz = size_img / px               # (h, w) crop px
        c = self.crop_size / 2.0
        dy = 0.0 if shift_yx is None else shift_yx[0]
        dx = 0.0 if shift_yx is None else shift_yx[1]
        return jnp.stack([c + dx - sz[1] / 2.0, c + dy - sz[0] / 2.0,
                          sz[1], sz[0]])

    def _init_fn(self, nets, image, box_xywh) -> DiMPState:
        center = jnp.asarray([box_xywh[1] + box_xywh[3] / 2.0,
                              box_xywh[0] + box_xywh[2] / 2.0])
        size = jnp.asarray([box_xywh[3], box_xywh[2]])
        box = jnp.stack([center[1] - size[1] / 2.0, center[0] - size[0] / 2.0,
                         size[1], size[0]])
        crop, rf = crop_resize(image, box, self.search_factor, self.crop_size)
        aug = self.augmenter(crop)                       # (A_img, H, W, 3)
        l3 = self.backbone.apply(nets["bb"],
                                 imagenet_preprocess(aug))["layer3"]
        clf = self.classifier.apply(nets["clf"], l3,
                                    method="extract_classification_feat")
        clf = self.augmenter.augment_features(
            clf, jax.random.PRNGKey(self.rng_seed + 3))  # (A, h', w', C)
        A = self.augmenter.num_samples
        px = 1.0 / rf
        boxes = jnp.stack([self._target_box_crop(size, px, s)
                           for s in self.augmenter.shifts])      # (A, 4)
        # learned init: FilterInitializerLinear + net_opt_iter SD-GN steps
        # (dimp.py init_classifier; sample_weight None -> sqrt(1/A)*spatial)
        filt = self.classifier.apply(nets["clf"], clf, boxes,
                                     None, self.init_opt_iter,
                                     method="get_filter")
        h, w = clf.shape[1:3]
        samples = jnp.zeros((self.memory_size, h, w, self._clf_c),
                            clf.dtype).at[:A].set(clf)
        box_mem = jnp.zeros((self.memory_size, 4)).at[:A].set(boxes)
        weights = jnp.zeros((self.memory_size,)).at[:A].set(1.0 / A)
        return DiMPState(filt=filt, samples=samples, boxes=box_mem,
                         weights=weights, mem_ptr=jnp.asarray(A, jnp.int32),
                         center=center, target_sz=size)

    def _update_fn(self, nets, state: DiMPState,
                   num_iter: Optional[int] = None) -> DiMPState:
        """update_classifier: learned SD-GN steps over the weighted memory
        (net_opt_update_iter on the periodic schedule, net_opt_hn_iter on a
        hard-negative frame)."""
        filt = self.classifier.apply(
            nets["clf"], state.filt, state.samples, state.boxes,
            state.weights,
            self.update_opt_iter if num_iter is None else num_iter,
            method="optimize_filter")
        return state._replace(filt=filt)

    def _modulation(self, nets, image, center, size):
        feats, _, px = self._features(nets, image, center, size)
        box = self._target_box_crop(size, px)
        return self.iou_net.apply(nets["iou"], feats["layer2"],
                                  feats["layer3"], box[None],
                                  method="get_modulation")

    def _track_fn(self, nets, state: DiMPState, image, modulation,
                  frame_idx=0):
        feats, clf_feat, px = self._features(nets, image, state.center,
                                             state.target_sz)
        score = self.classifier.apply(nets["clf"], state.filt, clf_feat,
                                      method="classify")[0]  # (sh, sw)
        sh, sw = score.shape
        if self.window_output:
            score = score * hann2d(sh, sw)
        fs = 1.0 / px                    # crop px per image px
        sc = jnp.asarray([(sh - 1) / 2.0, (sw - 1) / 2.0])
        if self.advanced_localization:
            disp_sc, flag, conf = localize_advanced(
                score, state.target_sz * fs * self._scale,
                not_found_threshold=self.target_not_found_threshold,
                distractor_threshold=self.distractor_threshold,
                hard_negative_threshold=self.hard_negative_threshold,
                target_neighborhood_scale=self.target_neighborhood_scale,
                displacement_scale=self.displacement_scale)
        else:
            conf, peak = max2d(score)
            disp_sc = subpixel_peak(score, peak) - sc
            flag = jnp.asarray(FLAG_NORMAL, jnp.int32)
        found = flag != FLAG_NOT_FOUND
        update_ok = found & (flag != FLAG_UNCERTAIN)   # dimp.py:135
        disp = disp_sc * (1.0 / self._scale) * px
        center = state.center + disp
        if self.refine:
            c_crop = jnp.asarray([self.crop_size / 2.0] * 2) + disp * fs
            sz_crop = state.target_sz * fs
            box = jnp.stack([c_crop[1] - sz_crop[1] / 2.0,
                             c_crop[0] - sz_crop[0] / 2.0,
                             sz_crop[1], sz_crop[0]])
            iou_feat = self.iou_net.apply(nets["iou"], feats["layer2"],
                                          feats["layer3"],
                                          method="get_iou_feat")
            # fold on the frame index, NOT mem_ptr (frozen on non-updating
            # frames -> identical proposal jitter reused for the stretch;
            # pytracking samples fresh proposals every frame)
            rng = jax.random.fold_in(jax.random.PRNGKey(self.rng_seed + 4),
                                     frame_idx)
            best, _ = refine_box_iounet(
                self.iou_net, nets["iou"], iou_feat, modulation, box, rng,
                num_random=self.num_random_boxes, steps=self.refine_steps,
                step_length=self.refine_lr, topk=self.iounet_topk)
            c_new = jnp.asarray([best[1] + best[3] / 2.0,
                                 best[0] + best[2] / 2.0])
            center = state.center + \
                (c_new - jnp.asarray([self.crop_size / 2.0] * 2)) * px
            target_sz = jnp.clip(jnp.asarray([best[3], best[2]]) * px,
                                 4.0, None)
        else:
            target_sz = state.target_sz
        # position/scale frozen when NOT_FOUND (dimp.py:123-130)
        center = jnp.where(found, center, state.center)
        target_sz = jnp.where(found, target_sz, state.target_sz)

        # memory insert (dimp.py update_memory): protected init samples,
        # ring over the rest, exponential forgetting, anchored slot 0;
        # skipped entirely on not-found/uncertain frames (dimp.py:139),
        # boosted lr on hard negatives (dimp.py:137)
        new_box = self._target_box_crop(
            target_sz, px, (center - state.center) * fs)
        (samples, boxes), weights, mem_ptr = protected_ring_insert(
            state.mem_ptr, update_ok, flag,
            [(state.samples, clf_feat[0]), (state.boxes, new_box)],
            state.weights, memory_size=self.memory_size,
            n_protected=min(self.augmenter.num_samples, self.memory_size - 1),
            learning_rate=self.learning_rate,
            hard_negative_learning_rate=self.hard_negative_learning_rate)
        new_st = DiMPState(filt=state.filt, samples=samples, boxes=boxes,
                           weights=weights,
                           mem_ptr=mem_ptr,
                           center=center, target_sz=target_sz)
        return new_st, conf, flag

    # --------------------------------------------------------------- host API
    def initialize(self, image: np.ndarray, info: dict):
        img = jnp.asarray(np.asarray(image), jnp.float32)
        self._state = self._init_jit(self._nets, img,
                                     jnp.asarray(info["init_bbox"],
                                                 jnp.float32))
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
        # filter refresh (dimp.py update_classifier): immediate short run on a
        # hard negative; otherwise the train_skipping schedule, and only on
        # frames whose sample entered the memory (update_flag)
        if flag == FLAG_HARD_NEGATIVE:
            self._state = self._update_hn_jit(self._nets, self._state)
        elif flag == FLAG_NORMAL and self._frame % self.update_interval == 0:
            self._state = self._update_jit(self._nets, self._state)
        c = np.asarray(self._state.center)
        s = np.asarray(self._state.target_sz)
        return {"target_bbox": [float(c[1] - s[1] / 2), float(c[0] - s[0] / 2),
                                float(s[1]), float(s[0])],
                "pred_score": float(conf), "flag": _FLAG_NAMES[flag]}
