"""ECO-style discriminative correlation-filter tracker.

Parity target: external/AR/pytracking/tracker/eco/eco.py (:1-384) — the
vendored pytracking ECO: multi-channel features, factorized filter learned
by conjugate gradient in the Fourier domain, sample memory with exponential
forgetting, scale pyramid localisation.

TPU-first redesign: the whole tracker is three jitted pure functions
(extract+learn, localise, update) over a `ECOState` pytree. Filter learning
solves the regularised normal equations with classic.optimization
.conjugate_gradient in the rfft domain (the reference's CG runs per-element
torch ops in Python; here one XLA program). Static shapes throughout:
fixed crop size, fixed number of scales, fixed CG iterations.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.classic.dcf import (fft2, gauss_label_2d, hann2d,
                                                  ifft2, max2d, subpixel_peak)
from multi_modal_tracking_tpu.classic.optimization import conjugate_gradient


def default_features(patch: jax.Array) -> jax.Array:
    """Feature map for a (H, W, 3) float patch in [0,1] -> (C, h, w) with a
    cell size of 4 (mean-pooled): color channels, grayscale, |dx|, |dy|.
    Stands in for the reference's HOG/CN/conv features (eco.py params) while
    staying dependency-free and fully jittable."""
    gray = patch.mean(axis=-1)
    dy = jnp.abs(jnp.diff(gray, axis=0, prepend=gray[:1]))
    dx = jnp.abs(jnp.diff(gray, axis=1, prepend=gray[:, :1]))
    feats = jnp.concatenate([patch.transpose(2, 0, 1),
                             gray[None], dx[None], dy[None]], axis=0)
    C, H, W = feats.shape
    cell = 4
    f = feats.reshape(C, H // cell, cell, W // cell, cell).mean(axis=(2, 4))
    return f - f.mean(axis=(1, 2), keepdims=True)


class ECOState(NamedTuple):
    filter_f: jax.Array      # (C, h, w//2+1) complex rfft-domain filter
    sample_xf: jax.Array     # (C, h, w//2+1) running weighted sample
    sample_w: jax.Array      # scalar accumulated weight
    yf: jax.Array            # (h, w//2+1) label spectrum
    center: jax.Array        # (2,) target centre (y, x) image px
    target_sz: jax.Array     # (2,) target (h, w) image px


@dataclasses.dataclass
class ECOTracker:
    """Host wrapper with the framework tracker API (initialize/track).

    features: 'handcrafted' (default_features, dependency-free) or a ResNet-18
    layer ('conv1' @ /4 64ch, 'layer3' @ /16 256ch) — the deep option of the
    reference's feature stack (pytracking features/deep.py ResNet18m1 pulls
    a shallow conv layer + layer3; here both come from the standard
    torchvision ResNet-18 so `load_backbone()` converts published weights).
    A custom feature_fn overrides both."""
    search_factor: float = 4.0
    crop_size: int = 224               # square crop, features at /4 -> 56
    output_sigma_factor: float = 1. / 12
    reg: float = 0.05
    learning_rate: float = 0.012
    num_cg_iter: int = 5
    scale_factors: Tuple[float, ...] = (0.97, 1.0, 1.03)
    update_interval: int = 5
    features: str = "handcrafted"
    rng_seed: int = 0
    feature_fn: Callable[[jax.Array], jax.Array] = \
        dataclasses.field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self.feature_fn is None:
            if self.features == "handcrafted":
                self.feature_fn = default_features
            elif self.features in ("conv1", "layer3"):
                self.feature_fn = self._make_resnet_features(self.features)
            else:
                raise ValueError(f"unknown features '{self.features}'")
        z = jnp.zeros((self.crop_size, self.crop_size, 3))
        fshape = jax.eval_shape(self.feature_fn, z).shape   # (C, h, w)
        self._feat_sz = fshape[-1]
        self._cell = self.crop_size / self._feat_sz
        self._frame = 0
        self._learn = jax.jit(self._learn_fn)
        self._localise = jax.jit(self._localise_fn)
        self._update = jax.jit(self._update_fn)

    def _make_resnet_features(self, layer: str):
        from multi_modal_tracking_tpu.models.resnet import resnet18
        self.backbone = resnet18()
        self._bb_vars = jax.jit(self.backbone.init)(
            jax.random.PRNGKey(self.rng_seed),
            jnp.zeros((1, self.crop_size, self.crop_size, 3)))

        def fn(patch):
            f = self.backbone.apply(self._bb_vars, patch[None])[layer][0]
            f = f.transpose(2, 0, 1)                  # (C, h, w)
            return f - f.mean(axis=(1, 2), keepdims=True)

        return fn

    def load_backbone(self, state_dict) -> None:
        """Warm-start the deep-feature ResNet from a torchvision/pytracking
        state dict (features='conv1'|'layer3' only)."""
        if not hasattr(self, "backbone"):
            raise ValueError("load_backbone requires features='conv1'|'layer3'")
        from multi_modal_tracking_tpu.utils.torch_convert import convert_resnet
        self._bb_vars, _ = convert_resnet(state_dict, self._bb_vars,
                                          strict=False, verbose=False)

    # ----------------------------------------------------------- device fns
    def _crop(self, image: jax.Array, center: jax.Array, size: jax.Array,
              scale: float = 1.0) -> Tuple[jax.Array, jax.Array]:
        """Square `search_factor`-padded crop around the target resized to
        crop_size (ops/crop.py device crop), plus image-px-per-crop-px."""
        from multi_modal_tracking_tpu.ops.crop import crop_resize
        box = jnp.stack([center[1] - size[1] / 2.0, center[0] - size[0] / 2.0,
                         size[1], size[0]])
        crop, rf = crop_resize(image, box, self.search_factor * scale,
                               self.crop_size)
        return crop, 1.0 / rf

    def _learn_fn(self, state: ECOState) -> ECOState:
        """CG solve of (S_xx + reg) f = S_xy in the rfft domain, per channel
        with cross-channel coupling through the data term (eco.py
        filter optimization)."""
        xf = state.sample_xf / jnp.maximum(state.sample_w, 1e-8)
        yf = state.yf

        def A(f):
            # (sum_c conj(x_c) x_c') f — rank-1 per-pixel operator + reg
            resp = jnp.sum(xf * f, axis=0, keepdims=True)   # X^H-free forward
            return jnp.conj(xf) * resp + self.reg * f

        b = jnp.conj(xf) * yf[None]
        res = conjugate_gradient(A, b, x0=state.filter_f,
                                 num_iter=self.num_cg_iter)
        return state._replace(filter_f=res.x)

    def _localise_fn(self, state: ECOState, image: jax.Array):
        """Scale-pyramid correlation -> new centre + size."""
        win = hann2d(self._feat_sz, self._feat_sz)

        def score_at(scale):
            crop, px = self._crop(image, state.center, state.target_sz, scale)
            x = self.feature_fn(crop / 255.0) * win[None]
            # learning solves sum_c xf_c f_c ~= yf, so the response on a new
            # sample is sum_c xf'_c f_c (NO conjugate: the shift theorem then
            # moves the peak by the target displacement; a conj here reflects
            # the appearance phase and mislocalises asymmetric targets —
            # regression-tested in test_classic_eco.py)
            s = ifft2(jnp.sum(state.filter_f * fft2(x), axis=0),
                      x.shape[-2:])
            s = jnp.fft.fftshift(s, axes=(-2, -1))
            return s, px

        scores, pxs = [], []
        for sc in self.scale_factors:    # static unroll (3 scales)
            s, px = score_at(sc)
            scores.append(s)
            pxs.append(px)
        scores = jnp.stack(scores)
        pxs = jnp.stack(pxs)
        maxes = scores.max(axis=(-2, -1))
        best = jnp.argmax(maxes)
        score = scores[best]
        _, peak = max2d(score)
        peak = subpixel_peak(score, peak)
        h, w = score.shape
        disp = (peak - jnp.asarray([h // 2, w // 2], jnp.float32)) * \
            self._cell * pxs[best]
        new_center = state.center + disp
        new_sz = state.target_sz * jnp.take(jnp.asarray(self.scale_factors), best)
        return new_center, new_sz, maxes[best]

    def _update_fn(self, state: ECOState, image: jax.Array) -> ECOState:
        """Exponential sample-memory update (the reference's sample space
        with a single merged component) + CG refinement."""
        crop, _ = self._crop(image, state.center, state.target_sz)
        win = hann2d(self._feat_sz, self._feat_sz)
        xf = fft2(self.feature_fn(crop / 255.0) * win[None])
        lr = self.learning_rate
        new_sample = state.sample_xf * (1 - lr) + xf * lr * jnp.maximum(state.sample_w, 1.0)
        new_w = state.sample_w * (1 - lr) + lr * jnp.maximum(state.sample_w, 1.0)
        state = state._replace(sample_xf=new_sample, sample_w=new_w)
        return self._learn_fn(state)

    # --------------------------------------------------------------- host API
    def initialize(self, image: np.ndarray, info: dict):
        box = np.asarray(info["init_bbox"], np.float32)
        center = jnp.asarray([box[1] + box[3] / 2.0, box[0] + box[2] / 2.0])
        target_sz = jnp.asarray([box[3], box[2]])
        img = jnp.asarray(image, jnp.float32)
        crop, _ = self._crop(img, center, target_sz)
        win = hann2d(self._feat_sz, self._feat_sz)
        x = self.feature_fn(crop / 255.0) * win[None]
        xf = fft2(x)
        fsz = self._feat_sz
        sigma = jnp.sqrt(jnp.prod(target_sz)) / self._cell / \
            (jnp.sqrt(jnp.prod(target_sz)) * self.search_factor / self.crop_size)
        sigma = jnp.maximum(sigma * self.output_sigma_factor, 1.0)
        y = gauss_label_2d(fsz, fsz, sigma,
                           jnp.asarray([fsz / 2.0, fsz / 2.0]))
        yf = fft2(jnp.fft.ifftshift(y))
        st = ECOState(filter_f=jnp.zeros_like(xf), sample_xf=xf,
                      sample_w=jnp.asarray(1.0), yf=yf,
                      center=center, target_sz=target_sz)
        self._state = jax.block_until_ready(self._learn(st))
        self._frame = 0

    def track(self, image: np.ndarray, info: Optional[dict] = None) -> dict:
        self._frame += 1
        img = jnp.asarray(np.asarray(image), jnp.float32)
        center, sz, conf = self._localise(self._state, img)
        self._state = self._state._replace(center=center, target_sz=sz)
        if self._frame % self.update_interval == 0:
            self._state = self._update(self._state, img)
        c = np.asarray(center)
        s = np.asarray(sz)
        return {"target_bbox": [float(c[1] - s[1] / 2), float(c[0] - s[0] / 2),
                                float(s[1]), float(s[0])],
                "pred_score": float(conf)}
