"""DiMP-style tracker: model-predicted discriminative filter + steepest
descent refinement.

Parity target: external/AR/pytracking/tracker/dimp/dimp.py (:1-865) and
upstream ltr/models/target_classifier/ (initializer + optimizer modules):
  - filter INITIALIZED by pooling the target region of the init-frame
    features (the reference's FilterInitializer: PrRoI pool + norm),
  - filter REFINED by steepest descent with exact step length on the
    regularised least-squares classification objective (the reference's
    learned SteepestDescentGN unrolls the same alpha = r^T r / r^T A r
    update with learned per-step weights),
  - localisation + memory + IoUNet box refinement shared with ATOM.

TPU-first: the initializer pool is ops/prroi.prroi_pool; steepest descent is
classic.optimization.steepest_descent_quadratic over the normal-equation
operator, all inside one jitted program.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.classic.atom import ATOMState, ATOMTracker
from multi_modal_tracking_tpu.classic.optimization import steepest_descent_quadratic
from multi_modal_tracking_tpu.ops.prroi import prroi_pool


@dataclasses.dataclass
class DiMPTracker(ATOMTracker):
    """ATOM skeleton with the DiMP filter predictor; same tracker API."""
    num_sd_iter: int = 6

    def _init_filter_from_target(self, feat: jax.Array) -> jax.Array:
        """FilterInitializer: PrRoI-pool the (centred) target region to the
        filter size; the target occupies 1/search_factor of the crop."""
        h, w = self._feat_hw
        ext_w, ext_h = w / self.search_factor, h / self.search_factor
        roi = jnp.asarray([[0.0, w / 2 - ext_w / 2, h / 2 - ext_h / 2,
                            w / 2 + ext_w / 2, h / 2 + ext_h / 2]])
        filt = prroi_pool(feat, roi, self.filter_size, self.filter_size,
                          1.0)[0]                       # (fs, fs, C)
        return filt / jnp.maximum(jnp.linalg.norm(filt), 1e-6)

    def _optimize_filter(self, state: ATOMState) -> ATOMState:
        """Steepest descent on 0.5||W(Xf - y)||^2 + 0.5 reg||f||^2, i.e. the
        quadratic A f = b with A = X^T W X + reg I, b = X^T W y (dimp's
        optimizer module). Exact line search per step; num_sd_iter static."""
        w = jnp.maximum(state.weights, 0.0)[:, None, None]

        def X(filt):
            return self._apply_filter(filt, state.samples)

        def Xt(resid):
            # transpose of the correlation operator via vjp
            _, vjp = jax.vjp(X, jnp.zeros((self.filter_size, self.filter_size,
                                           self._feat_c)))
            return vjp(resid)[0]

        def A(filt):
            return Xt(X(filt) * w) + self.reg * filt

        b = Xt(state.labels * w)
        filt = steepest_descent_quadratic(A, b, state.filt,
                                          num_iter=self.num_sd_iter)
        return state._replace(filt=filt)

    def _init_fn(self, image, box_xywh) -> ATOMState:
        st = super()._init_fn(image, box_xywh)
        # super() already ran _optimize_filter from a zero init; re-seed with
        # the pooled target filter and refine (initializer + optimizer).
        filt0 = self._init_filter_from_target(st.samples[:1])
        st = st._replace(filt=filt0)
        return self._optimize_filter(st)
