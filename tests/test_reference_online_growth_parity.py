"""Growing-ring online tracker loop parity vs the GENUINE reference.

The reference's multi-template online tracker GROWS its buffer: it starts at
[template], torch.cat-appends the committed candidate until the buffer holds
``online_size`` templates, and only then starts replacing at forget_id
(lib/test/tracker/mixformer_vit_online.py:116-126 — identical logic in
mixformer_cvt_online.py:152-162).  Our OnlineTrackerJit keeps a STATIC ring
of ``online_size`` slots plus an ``n_filled`` counter whose slot_mask makes
unfilled slots invisible to every attention.  This test runs the genuine
imported reference loop with online_size=3 and a short update interval so
the trajectory crosses: the 1-slot phase, both append commits, the
full-buffer phase, and two forget_id replacement wraps — and requires the
trajectories to match throughout.
"""
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict

from tests import reference_oracle
from tests.test_reference_tracker_loop_parity import _frames

T_SZ, S_SZ = 112, 192
UPDATE_INTERVAL = 5
ONLINE_SIZE = 3
TEMPLATE_FACTOR, SEARCH_FACTOR = 2.0, 4.5
N_USE = 40


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    reference_oracle.install()
    import importlib
    mod = importlib.import_module("lib.models.mixformer_vit.mixformer_online")
    ref_cfg = reference_oracle.load_reference_config("mixformer_vit_online",
                                                     "baseline")
    ref_cfg.MODEL.BACKBONE.PRETRAINED = False
    ref_cfg.DATA.SEARCH.SIZE = S_SZ
    ref_cfg.DATA.TEMPLATE.SIZE = T_SZ
    ref_cfg.TEST.UPDATE_INTERVALS.SYNTH = [UPDATE_INTERVAL]
    ref_cfg.TEST.ONLINE_SIZES.SYNTH = [ONLINE_SIZE]
    torch.manual_seed(0)
    net = mod.build_mixformer_vit_online_score(ref_cfg, train=False)
    ckpt = tmp_path_factory.mktemp("ref_ckpt_growth") / "vit_online.pth.tar"
    torch.save({"net": net.state_dict()}, ckpt)

    trk_mod = importlib.import_module("lib.test.tracker.mixformer_vit_online")
    params = types.SimpleNamespace(
        cfg=ref_cfg, checkpoint=str(ckpt),
        template_factor=TEMPLATE_FACTOR, template_size=T_SZ,
        search_factor=SEARCH_FACTOR, search_size=S_SZ,
        save_all_boxes=False, vis_attn=0, debug=False)

    from multi_modal_tracking_tpu.eval.params import get_parameters
    cfg = get_parameters("mixformer_vit_online", "baseline").cfg
    cfg.DATA.SEARCH.SIZE = S_SZ
    cfg.DATA.TEMPLATE.SIZE = T_SZ
    from multi_modal_tracking_tpu.models.build import build_model
    model = build_model("mixformer_vit_online", cfg)
    tz = jnp.zeros((1, T_SZ, T_SZ, 3), jnp.float32)
    sz = jnp.zeros((1, S_SZ, S_SZ, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), tz, tz, sz)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    variables, report = convert_state_dict(sd, variables, verbose=False)
    assert not report["shape_mismatch"] and not report["missing"]
    return trk_mod, params, model, variables


def test_growing_ring_trajectory_parity(pair):
    trk_mod, params, model, variables = pair
    fv, fi, init_box = _frames(seed=7)
    fv = fv[:N_USE]

    ref = trk_mod.MixFormerOnline(params, "synth")
    assert ref.online_size == ONLINE_SIZE
    assert ref.update_interval == UPDATE_INTERVAL
    ref.initialize(fv[0], {"init_bbox": list(init_box)})
    # reference buffer starts at ONE template (the growth gap under test)
    assert ref.online_template.shape[0] == 1
    want, ref_sizes = [], []
    for t in range(1, N_USE):
        want.append(ref.track(fv[t])["target_bbox"])
        ref_sizes.append(int(ref.online_template.shape[0]))
    want = np.asarray(want, np.float32)
    # the sequence must actually cross growth AND replacement wrap phases
    assert ref_sizes[UPDATE_INTERVAL - 1] == 2          # first append
    assert ref_sizes[-1] == ONLINE_SIZE                 # fully grown
    assert ref.online_forget_id > 0                     # wrapped replacements

    from multi_modal_tracking_tpu.tracking.tracker import OnlineTrackerJit
    ours = OnlineTrackerJit(model=model, variables=variables,
                            template_factor=TEMPLATE_FACTOR, template_size=T_SZ,
                            search_factor=SEARCH_FACTOR, search_size=S_SZ,
                            update_interval=UPDATE_INTERVAL,
                            online_size=ONLINE_SIZE, mode="RGB")
    ours.initialize(fv[0], {"init_bbox": init_box})
    got = []
    our_sizes = []
    for t in range(1, N_USE):
        got.append(ours.track(fv[t])["target_bbox"])
        our_sizes.append(int(ours._state.n_filled))
    got = np.asarray(got, np.float32)

    assert our_sizes == ref_sizes, "n_filled must replay the grown buffer size"
    np.testing.assert_allclose(got[:4], want[:4], atol=0.1, rtol=0)
    np.testing.assert_allclose(got, want, atol=0.75, rtol=0)
