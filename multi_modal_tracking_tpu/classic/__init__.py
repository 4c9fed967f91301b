"""TPU-native equivalents of the Alpha-Refine-vendored pytracking base
trackers and their optimization library (external/AR/pytracking/).

The reference vendors a full pytracking snapshot (DiMP, ATOM, ECO + a
Conjugate-Gradient optimization library) as the substrate Alpha-Refine was
trained/evaluated in. Here those are re-designed as functional JAX programs:
pure pytree solvers with `lax.while_loop`/`lax.fori_loop` control flow,
jit-compiled filter optimization, and FFT correlation on device.
"""
from multi_modal_tracking_tpu.classic.optimization import (conjugate_gradient,
                                                           gauss_newton_cg,
                                                           gradient_descent_l2)


def build_classic_tracker(name: str, **kwargs):
    """Factory over the classic tracker zoo ('eco' | 'atom' | 'dimp')."""
    if name == "eco":
        from multi_modal_tracking_tpu.classic.eco import ECOTracker
        return ECOTracker(**kwargs)
    if name == "atom":
        from multi_modal_tracking_tpu.classic.atom import ATOMTracker
        return ATOMTracker(**kwargs)
    if name == "dimp":
        from multi_modal_tracking_tpu.classic.dimp import DiMPTracker
        return DiMPTracker(**kwargs)
    raise ValueError(f"unknown classic tracker '{name}'")
