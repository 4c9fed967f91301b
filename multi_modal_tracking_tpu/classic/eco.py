"""ECO-style discriminative correlation-filter tracker.

Parity target: external/AR/pytracking/tracker/eco/eco.py (:1-384) + optim.py
— the vendored pytracking ECO: MULTI-BANK features (the reference default
runs a shallow and a deep bank with per-bank labels/learning rates and fuses
their score spectra by Fourier-upsampled weighted sum, eco.py:247-287
'weightedsum'), the FACTORIZED convolution (a learned (C, compressed_dim)
projection per bank — the "Efficient Convolution Operators" idea —
PCA-initialised from the init-frame feature covariance at eco.py:109-113 and
jointly optimised with the filter by Gauss-Newton CG over the
FactorizedConvProblem at :152-158), a sample memory with min-weight
replacement and exponential weight bookkeeping (update_sample_weights
:346-370), augmented init samples, and Fourier-domain sample recentring
(fourier.shift_fs :118-129, :225-227).

TPU-first redesign: the tracker is three jitted pure functions over an
`ECOState` pytree whose per-bank leaves are tuples — init (augment + PCA +
joint guarded-LM optimization per bank in one program), track-step (per-bank
score spectra -> pad_rfft2 to the common grid -> weighted sum -> one ifft ->
localisation + per-bank recentred memory inserts), and filter refinement
(per-bank weighted normal equations by CG). The reference re-enters Python
per GN/CG iteration; here both loops are lax.scans. Static shapes
throughout: fixed crop size, fixed scale count, fixed memory slots, fixed
iteration counts. The spatial reg_filter window (dcf.get_reg_filter,
eco.py:81-83) is applied in its mathematically equivalent spatial form —
penalty residual fft2(W * ifft2(f)) with W the sparsified, DC-corrected
window on the feature grid (classic/dcf.py reg_window; tap parity vs the
imported reference in tests/test_eco_reg_window.py); the init augmentation
is ECO's own zoo (parameter/eco/default.py:53-57). Design substitution: the
joint bilinear optimization is stabilised by accept/reject
Levenberg-Marquardt damping instead of the reference's hand-tuned block
preconditioner (see _init_fn).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.classic.augmentation import InitAugmenter
from multi_modal_tracking_tpu.classic.dcf import (fft2, gauss_label_2d, hann2d,
                                                  ifft2, max2d, pad_rfft2,
                                                  subpixel_peak)
from multi_modal_tracking_tpu.classic.optimization import (
    conjugate_gradient, solve_normal_equations)

# per-bank (output_sigma_factor, learning_rate, translation_weight) when
# MULTIPLE banks run together (parameter/eco/default.py:36-50: shallow
# 1/16 / 0.025 / 0.4, deep 1/4 / 0.0075 / 0.6)
_MULTI_BANK_DEFAULTS = {
    "handcrafted": (1.0 / 16, 0.025, 0.4),
    "conv1": (1.0 / 16, 0.025, 0.4),
    "layer3": (1.0 / 4, 0.0075, 0.6),
}

# per-bank (reg_window_min, reg_window_edge, reg_sparsity_threshold) —
# parameter/eco/default.py:79-90 (shallow vs deep values, power 2 for both)
_REG_WINDOW_DEFAULTS = {
    "handcrafted": (1e-4, 10e-3, 0.05),
    "conv1": (1e-4, 10e-3, 0.05),
    "custom": (1e-4, 10e-3, 0.05),
    "layer3": (10e-4, 50e-3, 0.1),
}


def default_features(patch: jax.Array) -> jax.Array:
    """Feature map for a (H, W, 3) float patch in [0,1] -> (C, h, w) with a
    cell size of 4 (mean-pooled): color channels, grayscale, |dx|, |dy|.
    Stands in for the reference's HOG/CN features (eco.py params) while
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


def fourier_shift(xf: jax.Array, shift_yx: jax.Array, h: int, w: int) -> jax.Array:
    """Translate rfft2-domain samples so content at +shift moves to the
    origin (fourier.shift_fs): multiplies by e^{+i w . shift}. xf (..., h,
    w//2+1); shift in feature px (dy, dx)."""
    ky = jnp.fft.fftfreq(h).astype(jnp.float32)[:, None]
    kx = jnp.fft.rfftfreq(w).astype(jnp.float32)[None, :]
    phase = jnp.exp(2j * jnp.pi * (ky * shift_yx[0] + kx * shift_yx[1]))
    return xf * phase


class ECOState(NamedTuple):
    filter_f: Tuple[jax.Array, ...]   # per bank (Cp, h, w//2+1)
    proj: Tuple[jax.Array, ...]       # per bank (C, Cp)
    samples_f: Tuple[jax.Array, ...]  # per bank (K, Cp, h, w//2+1)
    weights: Tuple[jax.Array, ...]    # per bank (K,)
    prev_ind: Tuple[jax.Array, ...]   # per bank scalar int32 (-1 = none)
    yf: Tuple[jax.Array, ...]         # per bank (h, w//2+1) label spectrum
    reg_w: Tuple[jax.Array, ...]      # per bank (h, w) spatial reg window
    center: jax.Array                 # (2,) target centre (y, x) image px
    target_sz: jax.Array              # (2,) target (h, w) image px


@dataclasses.dataclass
class _Bank:
    name: str
    sigma_factor: float
    learning_rate: float
    weight: float
    feat_c: int = 0
    feat_sz: int = 0
    cdim: int = 0


@dataclasses.dataclass
class ECOTracker:
    """Host wrapper with the framework tracker API (initialize/track).

    features: '+'-joined bank names — 'handcrafted' (default_features,
    dependency-free), 'conv1' (/4 64ch) and 'layer3' (/16 256ch) from one
    torchvision-layout ResNet-18 (pytracking features/deep.py ResNet18m1;
    `load_backbone()` converts published weights). 'conv1+layer3' mirrors
    the reference's default shallow+deep configuration with per-bank labels
    and learning rates and weighted score fusion. A custom feature_fn
    overrides everything with a single bank."""
    search_factor: float = 4.0
    crop_size: int = 224               # square crop, features at /4 -> 56
    output_sigma_factor: float = 1. / 12
    use_reg_window: bool = True        # spatial reg_filter (eco.py:81-83)
    reg: float = 0.05                  # scalar fallback (use_reg_window=False)
    learning_rate: float = 0.012
    num_cg_iter: int = 5               # CG_iter per train update
    scale_factors: Tuple[float, ...] = (0.97, 1.0, 1.03)
    update_interval: int = 5           # train_skipping
    features: str = "handcrafted"
    rng_seed: int = 0
    feature_fn: Callable[[jax.Array], jax.Array] = \
        dataclasses.field(default=None)  # type: ignore[assignment]
    # factorized convolution (eco.py:67,109-113,152-158)
    compressed_dim: Optional[int] = None   # None -> per-bank heuristic
    update_projection: bool = True         # update_projection_matrix
    projection_reg: float = 5e-8
    init_gn_iter: int = 10                 # init_GN_iter
    init_cg_per_gn: int = 10               # init_CG_iter // init_GN_iter
    # sample space (eco.py:339-370)
    sample_memory_size: int = 50
    augmentation: Optional[dict] = None    # None -> shared default recipe
    random_shift_factor: float = 0.0       # ECO shifts are explicit in spec

    def __post_init__(self):
        names = self.features.split("+")
        if self.feature_fn is not None:
            names = ["custom"]
        if any(n in ("conv1", "layer3") for n in names):
            from multi_modal_tracking_tpu.models.resnet import resnet18
            self.backbone = resnet18()
            self._bb_vars = jax.jit(self.backbone.init)(
                jax.random.PRNGKey(self.rng_seed),
                jnp.zeros((1, self.crop_size, self.crop_size, 3)))
        self.banks = []
        for n in names:
            if len(names) == 1:
                osf, lr, wt = (self.output_sigma_factor, self.learning_rate,
                               1.0)
            elif n in _MULTI_BANK_DEFAULTS:
                osf, lr, wt = _MULTI_BANK_DEFAULTS[n]
            else:
                raise ValueError(f"unknown bank '{n}' in multi-bank mode")
            if n not in ("handcrafted", "conv1", "layer3", "custom"):
                raise ValueError(f"unknown features '{n}'")
            self.banks.append(_Bank(n, osf, lr, wt))
        z = jnp.zeros((self.crop_size, self.crop_size, 3))
        shapes = jax.eval_shape(self._extract,
                                getattr(self, "_bb_vars", {}), z)
        for b, sh in zip(self.banks, shapes):
            b.feat_c, b.feat_sz = sh.shape[0], sh.shape[-1]
            if self.compressed_dim is not None:
                b.cdim = min(self.compressed_dim, b.feat_c)
            elif b.feat_c <= 8:                 # reference ratios: 16 of
                b.cdim = max(b.feat_c // 2 + 1, 3)  # ~41 shallow, 64 of 256
            elif b.feat_c <= 64:
                b.cdim = 16
            else:
                b.cdim = 64
        # common (finest) output grid for score fusion (eco.py output_sz)
        self._feat_sz = max(b.feat_sz for b in self.banks)
        self._cell = self.crop_size / self._feat_sz
        from multi_modal_tracking_tpu.classic.augmentation import ECO_AUGMENTATION
        self.augmenter = InitAugmenter(
            self.crop_size,
            spec=ECO_AUGMENTATION if self.augmentation is None
            else self.augmentation,
            random_shift_factor=self.random_shift_factor, seed=self.rng_seed)
        if self.augmenter.num_samples > self.sample_memory_size:
            raise ValueError(
                f"sample_memory_size={self.sample_memory_size} < augmented "
                f"init batch {self.augmenter.num_samples}")
        if self.augmenter.num_samples < 5 and self.update_projection:
            # the bilinear joint problem is ill-posed on a near-single
            # sample (P can fit it exactly with an arbitrarily large
            # filter); the reference only ever runs it on the full
            # augmentation zoo
            self.update_projection = False
        self._frame = 0
        # backbone variables are passed as jit ARGUMENTS (never closed over:
        # closure params inline into the HLO — CLAUDE.md remote-compile
        # limit — and would silently pin pre-load_backbone weights)
        self._init = jax.jit(self._init_fn)
        self._track_step = jax.jit(self._track_step_fn)
        self._learn = jax.jit(self._learn_fn)

    # ------------------------------------------------------------- features
    def _extract(self, bb_vars, crop: jax.Array) -> Tuple[jax.Array, ...]:
        """(H, W, 3) float crop [0,255] -> per-bank (C, h, w), one backbone
        forward shared across deep banks."""
        from multi_modal_tracking_tpu.models.resnet import imagenet_preprocess
        out = []
        resnet_feats = None
        for b in self.banks:
            if b.name in ("conv1", "layer3"):
                if resnet_feats is None:
                    resnet_feats = self.backbone.apply(
                        bb_vars, imagenet_preprocess(crop[None]))
                f = resnet_feats[b.name][0].transpose(2, 0, 1)
                out.append(f - f.mean(axis=(1, 2), keepdims=True))
            elif b.name == "custom":
                out.append(self.feature_fn(crop / 255.0))
            else:
                out.append(default_features(crop / 255.0))
        return tuple(out)

    def load_backbone(self, state_dict) -> None:
        """Warm-start the deep-feature ResNet from a torchvision/pytracking
        state dict (banks using 'conv1'/'layer3' only)."""
        if not hasattr(self, "backbone"):
            raise ValueError("load_backbone requires a conv1/layer3 bank")
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

    @staticmethod
    def _compress(xf: jax.Array, proj: jax.Array) -> jax.Array:
        """Project rfft-domain features (..., C, h, wf) -> (..., Cp, h, wf)
        (projection is spatial-linear so it commutes with the FFT,
        eco.py project_sample :302-309)."""
        return jnp.einsum("...chw,cp->...phw", xf, proj.astype(xf.dtype))

    def _learn_bank(self, filt, zf, w, yf, reg_w, num_iter):
        """FilterOptim (optim.py): CG on the weighted normal equations over
        the compressed sample memory, projection fixed.  The regulariser is
        the SPATIAL window: the reference convolves the filter spectrum with
        the sparsified window's DFT taps (optim.py:52-67); multiplying the
        spatial filter by the window is the same operator on one grid, so
        the normal equations gain fft2(W^2 * ifft2(f))."""
        w = w[:, None, None]
        w2 = reg_w * reg_w
        hw = reg_w.shape

        def A(f):
            resp = jnp.einsum("kphw,phw->khw", zf, f)
            out = jnp.einsum("khw,kphw->phw", w * resp, jnp.conj(zf))
            return out + fft2(w2[None] * ifft2(f, hw))

        b = jnp.einsum("khw,kphw->phw",
                       w * jnp.broadcast_to(yf, zf.shape[:1] + yf.shape),
                       jnp.conj(zf))
        return conjugate_gradient(A, b, x0=filt, num_iter=num_iter).x

    def _learn_fn(self, state: ECOState) -> ECOState:
        filt = tuple(
            self._learn_bank(f, zf, w, yf, rw, self.num_cg_iter)
            for f, zf, w, yf, rw in zip(state.filter_f, state.samples_f,
                                        state.weights, state.yf, state.reg_w))
        return state._replace(filter_f=filt)

    def _reg_window_bank(self, bank: _Bank, target_sz: jax.Array) -> jax.Array:
        """Per-bank spatial regularization window on the feature grid
        (eco.py:81-83 get_reg_filter at the same target/support ratio), or a
        flat sqrt(reg) window when use_reg_window=False — which makes every
        downstream reg term collapse to the scalar Tikhonov exactly."""
        h = w = bank.feat_sz
        if not self.use_reg_window:
            return jnp.full((h, w), jnp.sqrt(self.reg), jnp.float32)
        from multi_modal_tracking_tpu.classic.dcf import reg_window
        wmin, wedge, thr = _REG_WINDOW_DEFAULTS[bank.name]
        # target size in feature cells: crop side covers
        # search_factor * sqrt(area) image px -> feat_sz cells
        tgt_feat = target_sz * bank.feat_sz / (
            self.search_factor * jnp.sqrt(target_sz.prod()))
        return reg_window(h, w, tgt_feat, window_min=wmin, window_edge=wedge,
                          sparsity_threshold=thr)

    def _init_bank(self, bank: _Bank, feats: jax.Array, reg_w: jax.Array):
        """Augmented per-bank init: PCA projection -> guarded-LM joint
        (filter, projection) optimization -> compressed init samples.
        feats (A, C, h, w) -> (filter, proj, zf0, yf)."""
        A_n, C, h, w = feats.shape
        x_mat = feats.transpose(1, 0, 2, 3).reshape(C, -1)
        x_mat = x_mat - x_mat.mean(axis=1, keepdims=True)
        _, vecs = jnp.linalg.eigh(x_mat @ x_mat.T)          # ascending
        proj0 = vecs[:, ::-1][:, :bank.cdim]                # (C, Cp)

        win = hann2d(h, w)
        xf = fft2(feats * win[None, None])                  # (A, C, h, wf)
        # recentre augmented samples whose transform displaced the target
        # (eco.py:118-125 "Shift the samples back")
        cell = self.crop_size / bank.feat_sz
        shifts = jnp.asarray(self.augmenter.shifts) / cell  # feat px
        xf = jax.vmap(lambda s, sh: fourier_shift(s, sh, h, w))(xf, shifts)

        sigma = jnp.maximum(bank.feat_sz / self.search_factor *
                            bank.sigma_factor, 1.0)
        y = gauss_label_2d(h, w, sigma, jnp.asarray([h / 2.0, w / 2.0]))
        yf = fft2(jnp.fft.ifftshift(y))

        f0 = jnp.zeros((bank.cdim, h, w // 2 + 1), xf.dtype)
        sw = jnp.sqrt(1.0 / A_n)
        if not self.update_projection:
            filt, proj = f0, proj0
        else:
            # Joint (filter, projection) Gauss-Newton over the bilinear
            # factorized-convolution objective (FactorizedConvProblem,
            # eco.py:153-158). The raw objective is scale-degenerate
            # ((f/a, aP) leaves the data term unchanged, so with
            # projection_reg ~ 5e-8 it rewards blowing P up until the filter
            # regulariser is voided); the reference holds this off with a
            # hand-tuned block preconditioner whose heavy P diagonal
            # (optim.py:31, precond_proj_param = 35 x label energy) keeps P
            # near its PCA init. Here the damping is Levenberg-Marquardt:
            # zero-valued residual rows lam * base * (x - stop_gradient(x))
            # add damping to every linearised solve without changing the
            # objective, and each GN step is ACCEPTED only if the true
            # objective decreased (else the step is rejected and lam grows)
            # — monotone by construction, no tuned per-bin preconditioner.
            base_p = jnp.sqrt(35.0 * (2.0 * jnp.sum(jnp.abs(yf) ** 2) / C +
                                      self.projection_reg))
            base_f = jnp.sqrt(jnp.mean(reg_w ** 2))

            def residual(v):
                f, P = v["f"], v["P"]
                zf = self._compress(xf, P)
                r = jnp.einsum("kphw,phw->khw", zf, f) - yf[None]
                # spatial-window filter penalty (FactorizedConvProblem's
                # reg_filter convolution, optim.py:52-67, on one grid)
                return {"data": sw * r,
                        "reg_f": fft2(reg_w[None] * ifft2(f, reg_w.shape)),
                        "reg_P": jnp.sqrt(self.projection_reg) * P}

            def objective(v):
                return sum(jnp.sum(jnp.abs(r) ** 2)
                           for r in jax.tree_util.tree_leaves(residual(v)))

            def gn_step(carry, _):
                v, obj_v, lam = carry

                def damped(vv):
                    sg = jax.lax.stop_gradient
                    return {**residual(vv),
                            "damp_f": lam * base_f * (vv["f"] - sg(vv["f"])),
                            "damp_P": lam * base_p * (vv["P"] - sg(vv["P"]))}

                v_new = solve_normal_equations(damped, v,
                                               num_iter=self.init_cg_per_gn)
                obj_new = objective(v_new)
                ok = obj_new < obj_v
                v = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), v_new, v)
                obj_v = jnp.where(ok, obj_new, obj_v)
                lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1.0), lam * 4.0)
                return (v, obj_v, lam), None

            v0 = {"f": f0, "P": proj0}
            (v, _, _), _ = jax.lax.scan(
                gn_step, (v0, objective(v0), jnp.float32(1.0)),
                None, length=self.init_gn_iter)
            filt, proj = v["f"], v["P"]
        return filt, proj, self._compress(xf, proj), yf

    def _init_fn(self, bb_vars, image, box_xywh) -> ECOState:
        """Augmented init batch -> per-bank PCA + joint factorized
        optimization (eco.py:106-177) -> seeded sample memories."""
        center = jnp.asarray([box_xywh[1] + box_xywh[3] / 2.0,
                              box_xywh[0] + box_xywh[2] / 2.0])
        target_sz = jnp.asarray([box_xywh[3], box_xywh[2]])
        crop, _ = self._crop(image, center, target_sz)
        aug = self.augmenter(crop)                           # (A_img, H, W, 3)
        feats = jax.vmap(lambda c: self._extract(bb_vars, c))(aug)
        A_n = self.augmenter.num_samples
        K = self.sample_memory_size
        filt, proj, samples, weights, yfs, regs, prev = [], [], [], [], [], [], []
        for bank, fb in zip(self.banks, feats):
            # feature-dropout copies of the identity sample (NHWC helper)
            fb = self.augmenter.augment_features(
                fb.transpose(0, 2, 3, 1),
                jax.random.PRNGKey(self.rng_seed + 2)).transpose(0, 3, 1, 2)
            reg_w = self._reg_window_bank(bank, target_sz)
            f, P, zf0, yf = self._init_bank(bank, fb, reg_w)
            filt.append(f)
            proj.append(P)
            samples.append(jnp.zeros((K,) + zf0.shape[1:],
                                     zf0.dtype).at[:A_n].set(zf0))
            weights.append(jnp.zeros((K,)).at[:A_n].set(1.0 / A_n))
            yfs.append(yf)
            regs.append(reg_w)
            prev.append(jnp.asarray(-1, jnp.int32))
        st = ECOState(filter_f=tuple(filt), proj=tuple(proj),
                      samples_f=tuple(samples), weights=tuple(weights),
                      prev_ind=tuple(prev), yf=tuple(yfs), reg_w=tuple(regs),
                      center=center, target_sz=target_sz)
        if not self.update_projection:
            # fixed-projection init still gets the INIT CG budget
            # (params.init_CG_iter = init_gn_iter * init_cg_per_gn = 100,
            # eco/default.py:25), not the 5-iteration per-update budget —
            # a zero-seeded filter after 5 CG steps is near-flat and drifts
            init_cg = self.init_gn_iter * self.init_cg_per_gn
            filt = tuple(
                self._learn_bank(f, zf, w, yf, rw, init_cg)
                for f, zf, w, yf, rw in zip(st.filter_f, st.samples_f,
                                            st.weights, st.yf, st.reg_w))
            st = st._replace(filter_f=filt)
        return st

    def _track_step_fn(self, bb_vars, state: ECOState, image: jax.Array):
        """Scale-pyramid localisation on the fused score + Fourier-recentred
        per-bank memory inserts (eco.py track :190-230), one program."""
        H = W = self._feat_sz

        def fused_score_at(scale):
            crop, px = self._crop(image, state.center, state.target_sz, scale)
            feats = self._extract(bb_vars, crop)
            score_f = jnp.zeros((H, W // 2 + 1), jnp.complex64)
            zfs = []
            for bank, fb, P, f in zip(self.banks, feats, state.proj,
                                      state.filter_f):
                h = w = bank.feat_sz
                win = hann2d(h, w)
                zf = self._compress(fft2(fb * win[None]), P)   # (Cp, h, wf)
                zfs.append(zf)
                # learning solves sum_p zf_p f_p ~= yf, so the response on a
                # new sample is sum_p zf'_p f_p (NO conjugate: the shift
                # theorem then moves the peak by the target displacement; a
                # conj here reflects the appearance phase and mislocalises
                # asymmetric targets — regression-tested in
                # test_classic_eco.py). Spectra are Fourier-upsampled to the
                # common grid and weight-summed ('weightedsum' fusion,
                # eco.py:250-252).
                sf = jnp.sum(zf * f, axis=0)
                score_f = score_f + bank.weight * \
                    pad_rfft2(sf, (H, W), (h, w)).astype(jnp.complex64)
            s = jnp.fft.fftshift(ifft2(score_f, (H, W)), axes=(-2, -1))
            return s, zfs, px

        scores, zfs_all, pxs = [], [], []
        for sc in self.scale_factors:    # static unroll (few scales)
            s, zfs, px = fused_score_at(sc)
            scores.append(s)
            zfs_all.append(zfs)
            pxs.append(px)
        scores = jnp.stack(scores)
        pxs = jnp.stack(pxs)
        maxes = scores.max(axis=(-2, -1))
        best = jnp.argmax(maxes)
        score = scores[best]
        conf, peak = max2d(score)
        peak = subpixel_peak(score, peak)
        disp_feat = peak - jnp.asarray([H // 2, W // 2], jnp.float32)
        disp = disp_feat * self._cell * pxs[best]
        new_center = state.center + disp
        new_sz = state.target_sz * jnp.take(jnp.asarray(self.scale_factors),
                                            best)

        # per-bank memory insert: recentre the best-scale sample on the
        # estimated position (eco.py:225-227), then min-weight replacement
        # with exponential bookkeeping (update_sample_weights :346-370)
        samples_t, weights_t, prev_t = [], [], []
        for bi, bank in enumerate(self.banks):
            zf_b = jnp.stack([zfs_all[si][bi]
                              for si in range(len(self.scale_factors))])
            h = w = bank.feat_sz
            zf_new = fourier_shift(zf_b[best],
                                   disp_feat * (bank.feat_sz / self._feat_sz),
                                   h, w)
            wts = state.weights[bi]
            r_ind = jnp.argmin(wts).astype(jnp.int32)
            lr = bank.learning_rate
            first = state.prev_ind[bi] < 0
            w_first = (wts / (1.0 - lr)).at[r_ind].set(lr)
            prev = jnp.clip(state.prev_ind[bi], 0, None)
            w_next = wts.at[r_ind].set(wts[prev] / (1.0 - lr))
            wts = jnp.where(first, w_first, w_next)
            wts = wts / jnp.sum(wts)
            samples_t.append(jax.lax.dynamic_update_index_in_dim(
                state.samples_f[bi], zf_new, r_ind, 0))
            weights_t.append(wts)
            prev_t.append(r_ind)
        new_st = state._replace(samples_f=tuple(samples_t),
                                weights=tuple(weights_t),
                                prev_ind=tuple(prev_t),
                                center=new_center, target_sz=new_sz)
        return new_st, conf

    # --------------------------------------------------------------- host API
    def initialize(self, image: np.ndarray, info: dict):
        img = jnp.asarray(np.asarray(image), jnp.float32)
        self._state = jax.block_until_ready(
            self._init(getattr(self, "_bb_vars", {}), img,
                       jnp.asarray(info["init_bbox"], jnp.float32)))
        self._frame = 0

    def track(self, image: np.ndarray, info: Optional[dict] = None) -> dict:
        self._frame += 1
        img = jnp.asarray(np.asarray(image), jnp.float32)
        self._state, conf = self._track_step(getattr(self, "_bb_vars", {}),
                                             self._state, img)
        if self._frame % self.update_interval == 0:
            self._state = self._learn(self._state)
        c = np.asarray(self._state.center)
        s = np.asarray(self._state.target_sz)
        return {"target_bbox": [float(c[1] - s[1] / 2), float(c[0] - s[0] / 2),
                                float(s[1]), float(s[0])],
                "pred_score": float(conf)}
