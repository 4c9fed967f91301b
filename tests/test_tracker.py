"""Device tracking loop: mechanics on a tiny model + synthetic frames."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_modal_tracking_tpu.config import get_default_config
from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
from multi_modal_tracking_tpu.tracking.tracker import RGBTTrackerJit, _map_box_back


@pytest.fixture(scope="module")
def tiny_tracker():
    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.SEARCH.SIZE = 96
    cfg.DATA.TEMPLATE.SIZE = 64
    cfg.MODEL.FUSION_LAYERS = 1
    cfg.MODEL.VIT_TYPE = "base_patch16"
    cfg.MODEL.BACKBONE.CE_LOC = [1]
    model = build_mixformer_rgbt(cfg)
    t = jnp.zeros((2, 64, 64, 3))
    s = jnp.zeros((2, 96, 96, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    return RGBTTrackerJit(model=model, variables=variables, template_factor=2.0,
                          template_size=64, search_factor=4.5, search_size=96,
                          update_interval=2, ce_keep_rate=None)


def test_track_sequence_mechanics(tiny_tracker):
    rng = np.random.default_rng(0)
    H, W = 120, 160
    frames = [(rng.integers(0, 255, (H, W, 3), dtype=np.uint8),
               rng.integers(0, 255, (H, W, 3), dtype=np.uint8)) for _ in range(4)]
    tiny_tracker.initialize(list(frames[0]), {"init_bbox": [40.0, 30.0, 30.0, 24.0]})
    ot_before = np.asarray(tiny_tracker._state.online_template_v)
    boxes = []
    for f in frames[1:]:
        out = tiny_tracker.track(list(f))
        boxes.append(out["target_bbox"])
    boxes = np.asarray(boxes)
    assert boxes.shape == (3, 4)
    assert np.all(np.isfinite(boxes))
    # boxes stay inside the image (margin-clipped)
    assert np.all(boxes[:, 0] >= 0) and np.all(boxes[:, 1] >= 0)
    assert np.all(boxes[:, 0] + boxes[:, 2] <= W) and np.all(boxes[:, 1] + boxes[:, 3] <= H)
    # online template refreshed at frame 2 (update_interval=2)
    ot_after = np.asarray(tiny_tracker._state.online_template_v)
    assert not np.allclose(ot_before, ot_after)


def test_map_box_back_roundtrip():
    """If the model predicts the crop-relative centre box exactly, map_box_back
    must return the original image-coord box (reference map_box_back :134)."""
    prev = jnp.asarray([40.0, 30.0, 30.0, 24.0])
    search_size, factor = 96, 4.5
    crop_sz = np.ceil(np.sqrt(30.0 * 24.0) * factor)
    rf = search_size / crop_sz
    # object at centre of the crop: cx=cy=half_side (in image px after /rf)
    half_side = 0.5 * search_size / rf
    pred = jnp.asarray([half_side, half_side, 30.0, 24.0])
    back = np.asarray(_map_box_back(pred, prev, search_size, rf))
    cx_prev, cy_prev = 40 + 15, 30 + 12
    np.testing.assert_allclose(back, [cx_prev - 15, cy_prev - 12, 30, 24], atol=1e-4)


def test_track_chunk_matches_per_frame(tiny_tracker):
    """The scan'd chunk path must produce the exact per-frame trajectory,
    including a padded partial tail, and leave the carried state usable for
    further stepping."""
    import copy
    rng = np.random.default_rng(7)
    H, W = 120, 160
    frames = [(rng.integers(0, 255, (H, W, 3), dtype=np.uint8),
               rng.integers(0, 255, (H, W, 3), dtype=np.uint8)) for _ in range(8)]
    init = {"init_bbox": [40.0, 30.0, 30.0, 24.0]}

    tiny_tracker.initialize(list(frames[0]), init)
    per_frame = np.asarray([tiny_tracker.track(list(f))["target_bbox"]
                            for f in frames[1:]])
    st_seq = jax.tree_util.tree_map(np.asarray, tiny_tracker._state)

    tiny_tracker.scan_chunk = 4          # 7 frames -> blocks of 4 + 3(padded)
    tiny_tracker._scan_jit = {}
    tiny_tracker.initialize(list(frames[0]), init)
    fv = np.stack([f[0] for f in frames[1:]])
    fi = np.stack([f[1] for f in frames[1:]])
    chunked = tiny_tracker.track_chunk(fv, fi)
    np.testing.assert_allclose(chunked, per_frame, rtol=1e-5, atol=1e-4)
    # carried state identical after the padded tail
    st_chunk = jax.tree_util.tree_map(np.asarray, tiny_tracker._state)
    for a, b in zip(jax.tree_util.tree_leaves(st_seq),
                    jax.tree_util.tree_leaves(st_chunk)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    # and further per-frame stepping still works
    out = tiny_tracker.track(list(frames[0]))
    assert np.isfinite(out["target_bbox"]).all()


def test_rgb_tracker_chunk_tir_mode():
    """Unimodal RGBTrackerJit scan chunk (TIR mode: JET applied in-scan)."""
    from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec
    from multi_modal_tracking_tpu.tracking.tracker import RGBTrackerJit
    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64)
    model = MixFormer(spec=spec)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)

    def make():
        return RGBTrackerJit(model=model, variables=variables, template_size=32,
                             search_size=64, update_interval=2, mode="TIR",
                             scan_chunk=3)
    rng = np.random.default_rng(11)
    fv = rng.integers(0, 255, (6, 96, 128, 3), np.uint8)
    fi = rng.integers(0, 255, (6, 96, 128, 3), np.uint8)
    init = {"init_bbox": [40.0, 30.0, 30.0, 24.0]}

    t1 = make()
    t1.initialize([fv[0], fi[0]], init)
    boxes_pf = np.asarray([t1.track([fv[k], fi[k]])["target_bbox"]
                           for k in range(1, 6)])
    t2 = make()
    t2.initialize([fv[0], fi[0]], init)
    boxes_c = t2.track_chunk(fv[1:], fi[1:])
    np.testing.assert_allclose(boxes_c, boxes_pf, rtol=1e-5, atol=1e-4)


def test_cached_tracker_matches_full(tiny_tracker):
    """RGBTCachedTrackerJit (template k/v cache) must produce the same
    trajectory as the full-forward tracker, across a template update."""
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit
    cached = RGBTCachedTrackerJit(
        model=tiny_tracker.model, variables=tiny_tracker.variables,
        template_factor=2.0, template_size=64, search_factor=4.5,
        search_size=96, update_interval=2, ce_keep_rate=None)
    rng = np.random.default_rng(3)
    frames = [(rng.integers(0, 255, (120, 160, 3), np.uint8),
               rng.integers(0, 255, (120, 160, 3), np.uint8))
              for _ in range(5)]
    info = {"init_bbox": [60.0, 40.0, 40.0, 30.0]}
    tiny_tracker.initialize(frames[0], info)
    cached.initialize(frames[0], info)
    for fr in frames[1:]:
        b_full = tiny_tracker.track(fr)["target_bbox"]
        b_cached = cached.track(fr)["target_bbox"]
        np.testing.assert_allclose(b_cached, b_full, rtol=1e-4, atol=1e-3)


def test_single_channel_tir_equals_replicated(tiny_tracker):
    """(H, W) TIR frames must give the same trajectory as the reference's
    (H, W, 3) replicated-grayscale storage (BGR2GRAY is identity there)."""
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit
    def make():
        return RGBTCachedTrackerJit(
            model=tiny_tracker.model, variables=tiny_tracker.variables,
            template_factor=2.0, template_size=64, search_factor=4.5,
            search_size=96, update_interval=3, ce_keep_rate=None)
    rng = np.random.default_rng(5)
    gray = [rng.integers(0, 255, (120, 160), np.uint8) for _ in range(4)]
    rgb = [rng.integers(0, 255, (120, 160, 3), np.uint8) for _ in range(4)]
    info = {"init_bbox": [60.0, 40.0, 40.0, 30.0]}
    tr3, tr1 = make(), make()
    tr3.initialize([rgb[0], np.repeat(gray[0][..., None], 3, axis=2)], info)
    tr1.initialize([rgb[0], gray[0]], info)
    for v, i in zip(rgb[1:], gray[1:]):
        b3 = tr3.track([v, np.repeat(i[..., None], 3, axis=2)])["target_bbox"]
        b1 = tr1.track([v, i])["target_bbox"]
        np.testing.assert_allclose(b1, b3, rtol=1e-5, atol=1e-4)


def test_rgb_cached_tracker_matches_full():
    """Unimodal cached-k/v base tracker == full-forward base tracker."""
    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.models.mixformer import build_mixformer_vit
    from multi_modal_tracking_tpu.tracking.tracker import (RGBCachedTrackerJit,
                                                           RGBTrackerJit)
    cfg = get_default_config("mixformer_vit")
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32
    model = build_mixformer_vit(cfg)
    t = jnp.zeros((1, 32, 32, 3))
    s = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    kw = dict(model=model, variables=variables, template_factor=2.0,
              template_size=32, search_factor=4.5, search_size=64,
              update_interval=2, mode="TIR")
    full, cached = RGBTrackerJit(**kw), RGBCachedTrackerJit(**kw)
    rng = np.random.default_rng(9)
    frames = [(rng.integers(0, 255, (120, 160, 3), np.uint8),
               rng.integers(0, 255, (120, 160, 3), np.uint8))
              for _ in range(5)]
    info = {"init_bbox": [60.0, 40.0, 40.0, 30.0]}
    full.initialize(frames[0], info)
    cached.initialize(frames[0], info)
    for fr in frames[1:]:
        bf = full.track(fr)["target_bbox"]
        bc = cached.track(fr)["target_bbox"]
        np.testing.assert_allclose(bc, bf, rtol=1e-4, atol=1e-3)


def test_select_init_box_mode_semantics():
    """RGBT GT pairs: RGB/Prompt/bimodal take the RGB row, TIR the TIR row
    (reference tracker.py:119-122); flat boxes pass through."""
    from multi_modal_tracking_tpu.tracking.tracker import _select_init_box
    pair = [[10.0, 20.0, 30.0, 40.0], [12.0, 22.0, 28.0, 38.0]]
    assert _select_init_box(pair) == pair[0]
    assert _select_init_box(pair, "RGB") == pair[0]
    assert _select_init_box(pair, "Prompt") == pair[0]
    assert _select_init_box(pair, "TIR") == pair[1]
    flat = [1.0, 2.0, 3.0, 4.0]
    assert _select_init_box(flat, "TIR") == flat
    arr_pair = np.asarray(pair)
    np.testing.assert_array_equal(
        _select_init_box(list(arr_pair), "TIR"), arr_pair[1])


def test_tir_mode_initializes_from_tir_gt_row():
    """A unimodal TIR tracker fed an RGBT gt pair must crop its template at
    the TIR box, not the RGB box."""
    from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec
    from multi_modal_tracking_tpu.tracking.tracker import RGBTrackerJit
    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64)
    model = MixFormer(spec=spec)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (96, 128, 3), np.uint8)
    pair = [[40.0, 30.0, 30.0, 24.0], [60.0, 50.0, 20.0, 20.0]]

    def make():
        return RGBTrackerJit(model=model, variables=variables,
                             template_size=32, search_size=64, mode="TIR")
    tr = make()
    tr.initialize([frame, frame], {"init_bbox": pair})
    tir_direct = make()
    tir_direct.initialize([frame, frame], {"init_bbox": pair[1]})
    np.testing.assert_array_equal(np.asarray(tr._state.state),
                                  np.asarray(tir_direct._state.state))
    np.testing.assert_allclose(np.asarray(tr._state.template_v),
                               np.asarray(tir_direct._state.template_v))
    # and the RGB-mode tracker still anchors on the RGB row
    rgb = RGBTrackerJit(model=model, variables=variables, template_size=32,
                        search_size=64, mode="RGB")
    rgb.initialize([frame, frame], {"init_bbox": pair})
    np.testing.assert_array_equal(np.asarray(rgb._state.state),
                                  np.asarray(pair[0], np.float32))


def test_prompt_lambda_default_is_reference_blend():
    """The reference hardcodes 0.95*RGB + 0.05*JET(TIR)
    (lib/test/evaluation/tracker.py:160)."""
    from multi_modal_tracking_tpu.tracking.batched import BatchedRGBTrackerJit
    from multi_modal_tracking_tpu.tracking.tracker import (OnlineTrackerJit,
                                                           RGBTrackerJit)
    assert RGBTrackerJit.prompt_lambda == 0.05
    assert OnlineTrackerJit.prompt_lambda == 0.05
    assert BatchedRGBTrackerJit.prompt_lambda == 0.05
