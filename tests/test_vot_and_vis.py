"""VOT trax-loop wrapper (with an injected fake server) and visualisation
tools over a synthetic sequence."""
import os
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.eval.vot import Rectangle, VOTClient, run_vot_exp

cv2 = pytest.importorskip("cv2")


class _FakeRequest:
    def __init__(self, typ, region=None, image=None):
        self.type = typ
        self.region = region
        self.image = image


class _FakeServer:
    """Duck-typed trax server: initialize -> N frames -> quit."""

    def __init__(self, tmpdir, n_frames=5):
        self.reports = []
        self.paths = []
        rng = np.random.default_rng(0)
        for k in range(n_frames):
            pv = os.path.join(tmpdir, f"c_{k}.png")
            pi = os.path.join(tmpdir, f"d_{k}.png")
            cv2.imwrite(pv, rng.integers(0, 255, (96, 128, 3), np.uint8))
            cv2.imwrite(pi, rng.integers(0, 4000, (96, 128), np.uint16).astype(np.uint16))
            self.paths.append([pv, pi])
        self._queue = [_FakeRequest("initialize", region=(40.0, 30.0, 30.0, 24.0),
                                    image=self.paths[0])]
        self._queue += [_FakeRequest("frame", image=p) for p in self.paths[1:]]
        self._queue.append(_FakeRequest("quit"))
        self.quit_called = False

    def wait(self):
        return self._queue.pop(0)

    def status(self, region, props=None):
        self.reports.append((region, props))

    def quit(self):
        self.quit_called = True


@pytest.fixture(scope="module")
def tiny_rgbt_tracker():
    from multi_modal_tracking_tpu.models.asymmetric_shared import (MixFormerRGBT,
                                                                   RGBTSpec)
    from multi_modal_tracking_tpu.tracking.tracker import RGBTTrackerJit
    spec = RGBTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                    num_heads=2, head_dim=64, fusion_layers=1,
                    ce_loc=None, ce_keep_ratio=None)
    model = MixFormerRGBT(spec=spec)
    t = jnp.zeros((2, 32, 32, 3), jnp.float32)
    s = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    return RGBTTrackerJit(model=model, variables=variables, template_size=32,
                          search_size=64, update_interval=3)


def test_run_vot_exp_with_fake_server(tmp_path, tiny_rgbt_tracker):
    server = _FakeServer(str(tmp_path), n_frames=5)
    run_vot_exp("asymmetric_shared_online", channels="rgbd", server=server,
                tracker=tiny_rgbt_tracker)
    # initialize status + 4 per-frame reports
    assert len(server.reports) == 1 + 4
    for region, props in server.reports[1:]:
        assert isinstance(region, Rectangle)
        assert np.isfinite([region.x, region.y, region.width, region.height]).all()
    assert server.quit_called


def test_run_vot20_mask_exp_with_fake_server(tmp_path):
    from multi_modal_tracking_tpu.eval.vot import run_vot20_mask_exp
    from multi_modal_tracking_tpu.models.alpha_refine import (ARcmSeg,
                                                              build_alpha_refine)
    from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec
    from multi_modal_tracking_tpu.tracking.tracker import RGBTrackerJit

    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64)
    model = MixFormer(spec=spec)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    tracker = RGBTrackerJit(model=model, variables=variables, template_size=32,
                            search_size=64, update_interval=100, mode="RGB")
    _, ar_vars, ar_spec = build_alpha_refine(input_sz=64, output_sz=64)
    refiner = ARcmSeg(ar_vars, ar_spec)

    server = _FakeServer(str(tmp_path), n_frames=4)
    run_vot20_mask_exp("mixformer_vit", server=server, tracker=tracker,
                       refiner=refiner)
    assert len(server.reports) == 1 + 3
    for region, props in server.reports[1:]:
        assert isinstance(region, np.ndarray)
        assert region.shape == (96, 128) and region.dtype == np.uint8
        assert set(np.unique(region)).issubset({0, 1})
    assert server.quit_called


def test_run_vot20_lt_exp_with_fake_server(tmp_path):
    """LT entry: color-only frames, rect + confidence each frame
    (stark_vot20lt.py semantics)."""
    from multi_modal_tracking_tpu.eval.vot import run_vot20_lt_exp
    from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec
    from multi_modal_tracking_tpu.tracking.tracker import RGBTrackerJit

    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64)
    model = MixFormer(spec=spec)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    tracker = RGBTrackerJit(model=model, variables=variables, template_size=32,
                            search_size=64, update_interval=100, mode="RGB")

    server = _FakeServer(str(tmp_path), n_frames=5)
    # LT streams are color-only: single path per frame
    for req in server._queue:
        if isinstance(req.image, list):
            req.image = req.image[0]
    run_vot20_lt_exp("mixformer_vit", server=server, tracker=tracker)
    assert len(server.reports) == 1 + 4
    for region, props in server.reports[1:]:
        assert isinstance(region, Rectangle)
        conf = props.get("confidence") if isinstance(props, dict) else props
        assert conf is not None and 0.0 <= float(conf) <= 1.0
    assert server.quit_called


def test_render_result_video(tmp_path, tiny_rgbt_tracker):
    from multi_modal_tracking_tpu.eval.data import RGBTSequence
    from multi_modal_tracking_tpu.eval.visualize import render_result_video
    rng = np.random.default_rng(1)
    frames = [(rng.integers(0, 255, (96, 128, 3), np.uint8),
               rng.integers(0, 255, (96, 128, 3), np.uint8)) for _ in range(4)]
    gt = np.tile(np.asarray([[40.0, 30, 30, 24], [40.0, 30, 30, 24]]), (4, 1, 1))
    seq = RGBTSequence(name="synth", frames=frames, dataset="synth",
                       ground_truth_rect=gt)
    results = {"mine": np.tile([42.0, 31, 28, 22], (4, 1))}
    out = render_result_video(seq, results, str(tmp_path / "vis.mp4"), fps=5)
    assert os.path.isfile(out) and os.path.getsize(out) > 0


def test_feature_panel():
    from multi_modal_tracking_tpu.eval.visualize import feature_panel
    rng = np.random.default_rng(2)
    panel = feature_panel(rng.standard_normal((18, 18, 64)), size=72)
    assert panel.shape == (72, 72, 3) and panel.dtype == np.uint8


def test_dump_attention_maps(tmp_path):
    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.eval.visualize import dump_attention_maps
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
    from multi_modal_tracking_tpu.tracking.tracker import RGBTTrackerJit
    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.SEARCH.SIZE = 96
    cfg.DATA.TEMPLATE.SIZE = 64
    cfg.MODEL.FUSION_LAYERS = 1
    cfg.MODEL.BACKBONE.CE_LOC = [1]
    model = build_mixformer_rgbt(cfg)
    t = jnp.zeros((2, 64, 64, 3))
    s = jnp.zeros((2, 96, 96, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    tr = RGBTTrackerJit(model=model, variables=variables, template_size=64,
                        search_size=96, ce_keep_rate=None)
    rng = np.random.default_rng(3)
    fv = rng.integers(0, 255, (96, 128, 3), np.uint8)
    fi = rng.integers(0, 255, (96, 128, 3), np.uint8)
    tr.initialize([fv, fi], {"init_bbox": [40.0, 30.0, 30.0, 24.0]})
    paths = dump_attention_maps(tr, [fv, fi], str(tmp_path / "attn"))
    assert len(paths) == 1          # one CE block
    assert all(os.path.getsize(p) > 0 for p in paths)
    img = cv2.imread(paths[0])
    assert img.shape == (144, 288, 3)   # two modalities side by side


def test_vot20_mask_utils():
    """vot20_utils.py:4-60 equivalents."""
    from multi_modal_tracking_tpu.eval.vot import (bbox_clip, make_full_size,
                                                   mask_from_rect,
                                                   rect_from_mask)
    import numpy as np
    m = np.zeros((5, 6), np.uint8)
    m[1:4, 2:5] = 1
    assert rect_from_mask(m) == [2, 1, 3, 3]
    full = make_full_size(m, [8, 7])           # pad to w=8, h=7
    assert full.shape == (7, 8) and full[1:4, 2:5].all()
    cropped = make_full_size(m, [4, 3])        # crop down
    assert cropped.shape == (3, 4)
    r = mask_from_rect([2, 1, 3, 3], [6, 5])
    np.testing.assert_array_equal(r, m)
    assert bbox_clip(-5, -5, 900, 900, (480, 640)) == (0, 0, 640, 480)


def test_dump_attention_maps_cached_tracker(tmp_path):
    """Regression: the attention-map diagnostic must also work on the
    cached-template tracker (whose state has no online-template crops)."""
    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.eval.visualize import dump_attention_maps
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit
    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.SEARCH.SIZE = 96
    cfg.DATA.TEMPLATE.SIZE = 64
    cfg.MODEL.FUSION_LAYERS = 1
    cfg.MODEL.BACKBONE.CE_LOC = [1]
    model = build_mixformer_rgbt(cfg)
    t = jnp.zeros((2, 64, 64, 3))
    s = jnp.zeros((2, 96, 96, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    tr = RGBTCachedTrackerJit(model=model, variables=variables,
                              template_size=64, search_size=96,
                              ce_keep_rate=None)
    rng = np.random.default_rng(4)
    fv = rng.integers(0, 255, (96, 128, 3), np.uint8)
    fi = rng.integers(0, 255, (96, 128, 3), np.uint8)
    tr.initialize([fv, fi], {"init_bbox": [40.0, 30.0, 30.0, 24.0]})
    paths = dump_attention_maps(tr, [fv, fi], str(tmp_path / "attn_cached"))
    assert len(paths) == 1 and os.path.getsize(paths[0]) > 0


def test_run_vot_exp_builds_unimodal_tracker_in_rgb_mode(tmp_path, monkeypatch):
    """Color-only VOT entries must build unimodal trackers with mode='RGB':
    the bimodal default 'RGBT' used to reach OnlineTrackerJit and silently
    fall through to the Prompt blend."""
    from multi_modal_tracking_tpu.eval import vot as vot_mod

    captured = {}

    class _Stub:
        update_interval = 25
        def initialize(self, *a, **k): pass
        def track(self, *a, **k):
            return {"target_bbox": [0.0, 0.0, 1.0, 1.0], "pred_score": 1.0}

    def fake_params(*a, **k):
        return object()

    def fake_create(params, dataset_name="", mode="RGBT", **k):
        captured["mode"] = mode
        captured["dataset_name"] = dataset_name
        return _Stub()

    monkeypatch.setattr("multi_modal_tracking_tpu.eval.params.get_parameters",
                        fake_params)
    monkeypatch.setattr(
        "multi_modal_tracking_tpu.eval.evaltracker.create_tracker", fake_create)

    server = _FakeServer(str(tmp_path), n_frames=2)
    for req in server._queue:
        if isinstance(req.image, list):
            req.image = req.image[0]
    vot_mod.run_vot20_lt_exp("mixformer_vit", server=server)
    assert captured["mode"] == "RGB"
    # LT resolves its own UPDATE_INTERVALS.VOT20LT table entry
    # (stark_vot20lt.py:22 passes 'vot20lt'), not the RGBD 'DepthTrack'
    assert captured["dataset_name"] == "VOT20LT"


def test_unimodal_tracker_rejects_unknown_mode():
    import pytest as _pytest
    from multi_modal_tracking_tpu.tracking.tracker import RGBTrackerJit
    with _pytest.raises(ValueError, match="RGB | TIR | Prompt"):
        RGBTrackerJit(model=None, variables=None, mode="RGBT")
