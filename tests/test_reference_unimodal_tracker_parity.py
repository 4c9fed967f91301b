"""Unimodal (TIR / Prompt) tracker-loop parity vs the GENUINE reference.

Completes the stress matrix of test_reference_tracker_loop_parity.py for the
unimodal eval modes: the reference's evaluation driver feeds the tracker a
JET-mapped TIR frame (mode TIR) or the 0.95*RGB + 0.05*JET(TIR) float blend
(mode Prompt) (lib/test/evaluation/tracker.py:155-190), and the genuine
``lib/test/tracker/mixformer_vit.py MixFormer`` loop runs on it.  Our
RGBTrackerJit applies the same mode transform on device; trajectories must
match over a 48-frame stress sequence.
"""
import types

import cv2
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict

from tests import reference_oracle
from tests.test_reference_tracker_loop_parity import _frames, N_FRAMES

T_SZ, S_SZ = 112, 192
UPDATE_INTERVAL = 9
TEMPLATE_FACTOR, SEARCH_FACTOR = 2.0, 4.5
N_USE = 48


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    reference_oracle.install()
    import importlib
    mod = importlib.import_module("lib.models.mixformer_vit.mixformer")
    ref_cfg = reference_oracle.load_reference_config("mixformer_vit", "baseline")
    ref_cfg.MODEL.BACKBONE.PRETRAINED = False
    ref_cfg.DATA.SEARCH.SIZE = S_SZ
    ref_cfg.DATA.TEMPLATE.SIZE = T_SZ
    ref_cfg.TEST.UPDATE_INTERVALS.SYNTH = [UPDATE_INTERVAL]
    torch.manual_seed(0)
    net = mod.build_mixformer_vit(ref_cfg, train=False)
    ckpt = tmp_path_factory.mktemp("ref_ckpt_uni") / "vit.pth.tar"
    torch.save({"net": net.state_dict()}, ckpt)

    trk_mod = importlib.import_module("lib.test.tracker.mixformer_vit")
    params = types.SimpleNamespace(
        cfg=ref_cfg, checkpoint=str(ckpt),
        template_factor=TEMPLATE_FACTOR, template_size=T_SZ,
        search_factor=SEARCH_FACTOR, search_size=S_SZ,
        save_all_boxes=False, vis_search=0, debug=False)

    from multi_modal_tracking_tpu.eval.params import get_parameters
    cfg = get_parameters("mixformer_vit", "baseline").cfg
    cfg.DATA.SEARCH.SIZE = S_SZ
    cfg.DATA.TEMPLATE.SIZE = T_SZ
    from multi_modal_tracking_tpu.models.build import build_model
    model = build_model("mixformer_vit", cfg)
    tz = jnp.zeros((1, T_SZ, T_SZ, 3), jnp.float32)
    sz = jnp.zeros((1, S_SZ, S_SZ, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), tz, tz, sz)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    variables, report = convert_state_dict(sd, variables, verbose=False)
    assert not report["shape_mismatch"] and not report["missing"]
    return trk_mod, params, model, variables


def _driver_frame(mode, fv, fi):
    """lib/test/evaluation/tracker.py:155-190 frame preparation."""
    if mode == "TIR":
        return cv2.applyColorMap(np.ascontiguousarray(fi), cv2.COLORMAP_JET)
    image_i = cv2.applyColorMap(np.ascontiguousarray(fi), cv2.COLORMAP_JET)
    return 0.95 * fv + 0.05 * image_i          # float, exactly as the driver


@pytest.mark.parametrize("mode", ["TIR", "Prompt"])
def test_unimodal_mode_trajectory_parity(pair, mode):
    trk_mod, params, model, variables = pair
    fv, fi, init_box = _frames(seed=3)
    fv, fi = fv[:N_USE], fi[:N_USE]

    ref = trk_mod.MixFormer(params, "synth")
    assert ref.update_intervals == [UPDATE_INTERVAL]
    ref.initialize(_driver_frame(mode, fv[0], fi[0]),
                   {"init_bbox": list(init_box)})
    want = np.asarray([ref.track(_driver_frame(mode, fv[t], fi[t]))["target_bbox"]
                       for t in range(1, N_USE)], np.float32)

    from multi_modal_tracking_tpu.tracking.tracker import RGBTrackerJit
    ours = RGBTrackerJit(model=model, variables=variables,
                         template_factor=TEMPLATE_FACTOR, template_size=T_SZ,
                         search_factor=SEARCH_FACTOR, search_size=S_SZ,
                         update_interval=UPDATE_INTERVAL, mode=mode)
    ours.initialize([fv[0], fi[0]], {"init_bbox": init_box})
    got = np.asarray([ours.track([fv[t], fi[t]])["target_bbox"]
                      for t in range(1, N_USE)], np.float32)

    np.testing.assert_allclose(got[:8], want[:8], atol=0.1, rtol=0)
    np.testing.assert_allclose(got, want, atol=0.75, rtol=0)
