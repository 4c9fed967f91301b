"""Training path for the Alpha-Refine (box -> mask) network.

Parity target: external/AR/ltr/ — the vendored training library Alpha-Refine
was trained with: actors/segm.py-style actor (reference branch = template
crop + box, test branch = search crop + ground-truth mask), losses = binary
cross-entropy + a soft-IoU (Lovasz-stand-in) term on the mask logits,
AdamW over the refine net, samplers drawing (ref, test) pairs.

TPU-first: one jitted train step (loss + grads + optax update) over the
flax AlphaRefineNet; mask targets are (B, H, W, 1) float arrays; batches are
host-staged numpy like the main tracker trainer. Datasets with only box
annotations bootstrap rectangle masks (AR's box2seg initialisation).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from multi_modal_tracking_tpu.models.alpha_refine import AlphaRefineNet


def box_to_mask(box_xywh: np.ndarray, h: int, w: int) -> np.ndarray:
    """Rectangle mask from a box (AR box2seg bootstrap for box-only data)."""
    m = np.zeros((h, w), np.float32)
    x0 = int(round(max(box_xywh[0], 0)))
    y0 = int(round(max(box_xywh[1], 0)))
    x1 = int(round(min(box_xywh[0] + box_xywh[2], w)))
    y1 = int(round(min(box_xywh[1] + box_xywh[3], h)))
    if x1 > x0 and y1 > y0:
        m[y0:y1, x0:x1] = 1.0
    return m


def mask_losses(logits: jax.Array, target: jax.Array,
                bce_weight: float = 1.0, iou_weight: float = 1.0
                ) -> Tuple[jax.Array, dict]:
    """BCE + soft-IoU on (B, H, W, 1) logits vs {0,1} targets (the reference
    trains seg_network with BCE + Lovasz hinge; soft-IoU is the smooth,
    XLA-friendly surrogate of the Lovasz extension)."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(logits, target).mean()
    p = jax.nn.sigmoid(logits)
    inter = (p * target).sum(axis=(1, 2, 3))
    union = (p + target - p * target).sum(axis=(1, 2, 3))
    soft_iou = 1.0 - (inter / jnp.maximum(union, 1e-6)).mean()
    loss = bce_weight * bce + iou_weight * soft_iou
    return loss, {"mask_bce": bce, "mask_soft_iou": soft_iou}


class RefineTrainState(NamedTuple):
    variables: dict
    opt_state: optax.OptState
    step: jax.Array


def make_refine_train_step(net: AlphaRefineNet, tx: optax.GradientTransformation):
    """Jitted (state, batch) -> (state, metrics). Batch keys:
    ref_images (B,S,S,3) float 0..1, ref_boxes (B,4) crop-coord xywh,
    test_images (B,S,S,3), test_masks (B,S,S,1) in {0,1}."""

    def loss_fn(variables, batch):
        logits = net.apply(variables, batch["ref_images"], batch["ref_boxes"],
                           batch["test_images"], method=net.forward_train)
        target = batch["test_masks"]
        if target.shape[1:3] != logits.shape[1:3]:
            # net emits masks at spec.mask_sz (AR_seg_mask.py output_size),
            # which can differ from the crop size the sampler rasterised at
            target = (jax.image.resize(
                target, (target.shape[0],) + logits.shape[1:3] + (1,),
                "bilinear") > 0.5).astype(jnp.float32)
        return mask_losses(logits, target)

    @jax.jit
    def step(state: RefineTrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.variables, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.variables)
        variables = optax.apply_updates(state.variables, updates)
        metrics = dict(metrics, loss=loss)
        return RefineTrainState(variables, opt_state, state.step + 1), metrics

    return step


def build_refine_trainer(input_sz: int = 256, lr: float = 1e-3,
                         weight_decay: float = 1e-4, rng_seed: int = 0,
                         dtype=jnp.float32):
    """Net + AdamW + jitted step, ready for a host batch loop
    (the ltr run_training equivalent, minus the dataset plumbing that
    train/builders.py provides)."""
    from multi_modal_tracking_tpu.models.alpha_refine import build_alpha_refine
    net, variables, spec = build_alpha_refine(input_sz=input_sz, dtype=dtype,
                                              rng_seed=rng_seed)
    tx = optax.adamw(lr, weight_decay=weight_decay)
    state = RefineTrainState(variables=variables, opt_state=tx.init(variables),
                             step=jnp.asarray(0))
    return net, spec, state, make_refine_train_step(net, tx)


def batch_from_box_dataset(samples, input_sz: int, rng: np.random.Generator):
    """Host-side batch builder: each sample is (ref_img, ref_box, test_img,
    test_box_or_mask) in full-image coords; crops both frames 2x around the
    box and rasterises the target mask.

    Crop geometry is the ANISOTROPIC sample_target_se — the same window the
    ARcmSeg inference wrapper feeds the net (ARcm_seg.py crops ws=2w x hs=2h
    squashed to a square; AR's ltr trained with the matching SE processing).
    Training on square sample_target crops would show the net undistorted
    images it never sees at inference."""
    from multi_modal_tracking_tpu.models.alpha_refine import (
        _IMAGENET_MEAN, _IMAGENET_STD, sample_target_se,
        transform_box_to_crop_se)

    def _norm(img):   # ARcm_seg.img_preprocess normalisation
        return ((img.astype(np.float32) / 255.0) - _IMAGENET_MEAN) / _IMAGENET_STD

    ref_images, ref_boxes, test_images, test_masks = [], [], [], []
    for ref_img, ref_box, test_img, test_tgt in samples:
        crop_r, hf_r, wf_r = sample_target_se(ref_img, ref_box, 2.0, input_sz)
        ref_boxes.append(transform_box_to_crop_se(ref_box, hf_r, wf_r,
                                                  input_sz))
        ref_images.append(_norm(crop_r))
        if isinstance(test_tgt, np.ndarray) and test_tgt.ndim == 2:
            # real mask: crop it with the same window as the image
            box = _mask_box(test_tgt)
            crop_t, _, _ = sample_target_se(test_img, box, 2.0, input_sz)
            m, _, _ = sample_target_se(test_tgt[..., None].repeat(3, -1) * 255.0,
                                       box, 2.0, input_sz)
            mask = (m[..., :1] > 127).astype(np.float32)
        else:
            box = np.asarray(test_tgt, np.float32)
            crop_t, hf_t, wf_t = sample_target_se(test_img, box, 2.0, input_sz)
            bic = transform_box_to_crop_se(box, hf_t, wf_t, input_sz)
            mask = box_to_mask(bic, input_sz, input_sz)[..., None]
        test_images.append(_norm(crop_t))
        test_masks.append(mask)
    return {"ref_images": np.stack(ref_images),
            "ref_boxes": np.stack(ref_boxes),
            "test_images": np.stack(test_images),
            "test_masks": np.stack(test_masks)}


def _mask_box(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.asarray([0.0, 0.0, mask.shape[1], mask.shape[0]], np.float32)
    return np.asarray([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                       ys.max() - ys.min() + 1], np.float32)
