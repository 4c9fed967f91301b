"""ECO spatial regularization window vs the GENUINE reference get_reg_filter.

Imports the actual ``external/AR/pytracking/libs/dcf.py`` (old-torch
``torch.rfft``/``torch.irfft`` restored via shims) and checks that our
``classic/dcf.py reg_window`` agrees with the reference's cropped DFT taps:
reconstructing the full spectrum from the reference's sparse taps and
inverse-transforming must give exactly our spatial window, for both the
shallow and the deep parameter sets (parameter/eco/default.py:79-90), on odd
and even grids.  Also pins the scalar fallback and the ECO integration
surface (state carries per-bank windows; flat window == scalar Tikhonov).
"""
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.classic.dcf import fft2, ifft2, reg_window

from tests import reference_oracle

AR_ROOT = "/root/reference/external/AR"


@pytest.fixture(scope="module")
def ref_dcf():
    reference_oracle.install()
    if AR_ROOT not in sys.path:
        sys.path.insert(0, AR_ROOT)
    # old-torch one-sided FFT API used by get_reg_filter (dcf.py:134,139)
    if not hasattr(torch, "rfft"):
        def _old_rfft(x, signal_ndim, normalized=False, onesided=True):
            assert signal_ndim == 2 and onesided and not normalized
            return torch.view_as_real(torch.fft.rfftn(x, dim=(-2, -1)))

        def _old_irfft(x, signal_ndim, normalized=False, onesided=True,
                       signal_sizes=None):
            assert signal_ndim == 2 and onesided and not normalized
            return torch.fft.irfftn(torch.view_as_complex(x.contiguous()),
                                    s=signal_sizes, dim=(-2, -1))

        torch.rfft = _old_rfft
        torch.irfft = _old_irfft
    import pytracking
    import pytracking.libs.complex as plx_complex
    pytracking.complex = plx_complex
    import pytracking.libs.fourier as plx_fourier
    pytracking.fourier = plx_fourier
    import pytracking.libs.dcf as dcf_mod
    return dcf_mod


def _ref_taps_to_window(taps: np.ndarray, h: int, w: int) -> np.ndarray:
    """Reconstruct the spatial window from the reference's cropped taps.

    get_reg_filter returns real taps cropped around DC after rfftshift2 of
    the row axis and mirror-extension of the column axis
    (dcf.py:141-151): rows span symmetric freqs around 0, cols span
    [-(right-1), right-1]."""
    th, tw = taps.shape[-2:]
    taps = taps.reshape(th, tw)
    right = (tw + 1) // 2
    full = np.zeros((h, w // 2 + 1), np.complex128)
    for i in range(th):
        kr = i - th // 2                     # row frequency index
        for j in range(tw):
            kc = j - (right - 1)             # column frequency index
            if kc < 0:
                # negative column freq of a real signal: conjugate-symmetric
                # partner at (-kr, -kc); skip (mirrored copy of kept taps)
                continue
            full[kr % h, kc] += taps[i, j]
    win = np.fft.irfft2(full, s=(h, w)) * (h * w)
    # reference taps are in centred-row layout; our window is origin-at-0
    return np.roll(win, (-((h - 1) // 2), -((w - 1) // 2)), axis=(0, 1))


@pytest.mark.parametrize("hw", [(63, 63), (56, 56), (31, 47)])
@pytest.mark.parametrize("bank", ["shallow", "deep"])
def test_reg_window_matches_reference_taps(ref_dcf, hw, bank):
    h, w = hw
    if bank == "shallow":
        wmin, wedge, thr = 1e-4, 10e-3, 0.05
    else:
        wmin, wedge, thr = 10e-4, 50e-3, 0.1
    target = (12.0, 9.0)

    params = types.SimpleNamespace(
        use_reg_window=True, reg_window_min=wmin, reg_window_edge=wedge,
        reg_window_power=2, reg_sparsity_threshold=thr)
    taps = ref_dcf.get_reg_filter(torch.tensor([float(h), float(w)]),
                                  torch.tensor(list(target)), params).numpy()
    want = _ref_taps_to_window(taps, h, w)

    got = np.asarray(reg_window(h, w, jnp.asarray(target), window_min=wmin,
                                window_edge=wedge, sparsity_threshold=thr))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_scalar_fallback_is_exact_tikhonov():
    """A flat sqrt(reg) window makes fft2(W^2 * ifft2(f)) == reg * f."""
    rng = np.random.default_rng(0)
    h, w = 16, 16
    f_spatial = rng.standard_normal((3, h, w)).astype(np.float32)
    f = fft2(jnp.asarray(f_spatial))
    regv = 0.05
    W = jnp.full((h, w), jnp.sqrt(regv))
    got = fft2((W * W)[None] * ifft2(f, (h, w)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(regv * f),
                               atol=1e-6)


def test_eco_state_carries_reg_windows():
    """ECO init builds per-bank windows shaped like the feature grid, edges
    heavier than the centre (the bowl), min at window_min."""
    from multi_modal_tracking_tpu.classic.eco import ECOTracker
    trk = ECOTracker(crop_size=96, sample_memory_size=32,
                     init_gn_iter=2, init_cg_per_gn=2)
    img = np.random.default_rng(0).integers(
        0, 255, (120, 160, 3), np.uint8).astype(np.float32)
    trk.initialize(img, {"init_bbox": np.array([60.0, 40.0, 24.0, 24.0])})
    st = trk._state
    (rw,) = st.reg_w
    h = w = trk.banks[0].feat_sz
    assert rw.shape == (h, w)
    rw = np.asarray(rw)
    # origin layout: target (centre) is cheap, far field expensive (on a
    # small sparsified grid the origin sits near — not exactly at — the
    # corrected minimum)
    assert rw[0, 0] < 0.1 * rw[h // 2, w // 2]
    assert abs(rw.min() - 1e-4) < 5e-4
