"""Online (SPM score-gated) tracking loop tests.

Covers the reference semantics of lib/test/tracker/mixformer_cvt_online.py
(:142-168): per-frame score head, max-score template candidacy with decay,
interval-gated commit, multi-template ring buffer + set_online refresh."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_modal_tracking_tpu.models.asymmetric_shared import (MixFormerRGBT,
                                                               RGBTSpec)
from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec
from multi_modal_tracking_tpu.tracking.tracker import (OnlineTrackerJit,
                                                       RGBTOnlineTrackerJit)


def _frames(n, h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]


@pytest.fixture(scope="module")
def rgbt_online():
    spec = RGBTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                    num_heads=2, head_dim=64, fusion_layers=1,
                    ce_loc=None, ce_keep_ratio=None, nlayer_head=2)
    model = MixFormerRGBT(spec=spec, with_score=True)
    t = jnp.zeros((2, 32, 32, 3), jnp.float32)
    s = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), t, t, s)
    return model, variables


def test_rgbt_online_score_gated_update(rgbt_online):
    model, variables = rgbt_online
    tracker = RGBTOnlineTrackerJit(model=model, variables=variables,
                                   template_factor=2.0, template_size=32,
                                   search_factor=4.5, search_size=64,
                                   update_interval=3, max_score_decay=0.98)
    fv, fi = _frames(8, seed=1), _frames(8, seed=2)
    tracker.initialize([fv[0], fi[0]], {"init_bbox": [40.0, 30.0, 30.0, 24.0]})
    templates = [np.asarray(tracker._state.online_template_v)]
    for k in range(1, 8):
        out = tracker.track([fv[k], fi[k]])
        assert len(out["target_bbox"]) == 4
        assert 0.0 <= out["pred_score"] <= 1.0
        templates.append(np.asarray(tracker._state.online_template_v))
    # online template can only change at commit frames (update_interval=3)
    for k in range(1, 8):
        changed = not np.array_equal(templates[k], templates[k - 1])
        if k % 3 != 0:
            assert not changed, f"template changed off-interval at frame {k}"
    # candidacy resets after each commit
    assert float(tracker._state.max_pred_score) <= 1.0


def test_unimodal_online_ring_buffer():
    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64, nlayer_head=2)
    model = MixFormer(spec=spec, with_score=True)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), t, t, s)
    tracker = OnlineTrackerJit(model=model, variables=variables,
                               template_factor=2.0, template_size=32,
                               search_factor=4.5, search_size=64,
                               update_interval=2, online_size=3)
    frames = _frames(10, seed=3)
    tracker.initialize(frames[0], {"init_bbox": [40.0, 30.0, 30.0, 24.0]})
    assert tracker._state.online_template_v.shape[0] == 3
    assert int(tracker._state.n_filled) == 1       # reference init: [template]
    assert int(tracker._state.forget_id) == 0
    for k in range(1, 6):
        out = tracker.track(frames[k])
        assert np.isfinite(out["target_bbox"]).all()
    # 5 frames, interval 2 -> 2 commits, both APPENDS (growth phase):
    # buffer [t0, m2, m4]; cursor untouched until the buffer is full
    # (mixformer_cvt_online.py:158-162)
    assert int(tracker._state.n_filled) == 3
    assert int(tracker._state.forget_id) == 0
    for k in range(6, 10):
        tracker.track(frames[k])
    # commits at 6 and 8 are REPLACEMENTS now -> cursor advanced twice
    assert int(tracker._state.n_filled) == 3
    assert int(tracker._state.forget_id) == 2


def test_unimodal_online_cache_refresh_consistency():
    """After a commit, the k/v cache must equal a fresh set_online over the
    current ring buffer (the lax.cond refresh path is exact)."""
    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64, nlayer_head=2)
    model = MixFormer(spec=spec, with_score=True)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), t, t, s)
    tracker = OnlineTrackerJit(model=model, variables=variables,
                               template_factor=2.0, template_size=32,
                               search_factor=4.5, search_size=64,
                               update_interval=2, online_size=2)
    frames = _frames(3, seed=4)
    tracker.initialize(frames[0], {"init_bbox": [40.0, 30.0, 30.0, 24.0]})
    tracker.track(frames[1])
    tracker.track(frames[2])   # frame_id 2 -> commit + refresh
    st = tracker._state
    fresh = jax.jit(lambda v, a, b: model.apply(v, a, b, method=model.set_online))(
        variables, st.template_v, st.online_template_v)
    got_k = np.asarray(tracker._cache["mem"][0][0], np.float32)
    want_k = np.asarray(fresh["mem"][0][0], np.float32)
    np.testing.assert_allclose(got_k, want_k, atol=1e-5, rtol=1e-4)


def test_rgbt_online_track_chunk_matches_per_frame(rgbt_online):
    model, variables = rgbt_online

    def make():
        return RGBTOnlineTrackerJit(model=model, variables=variables,
                                    template_factor=2.0, template_size=32,
                                    search_factor=4.5, search_size=64,
                                    update_interval=3, max_score_decay=0.98,
                                    scan_chunk=3)
    fv, fi = _frames(8, seed=5), _frames(8, seed=6)
    init = {"init_bbox": [40.0, 30.0, 30.0, 24.0]}

    t1 = make()
    t1.initialize([fv[0], fi[0]], init)
    per_frame = [t1.track([fv[k], fi[k]]) for k in range(1, 8)]
    boxes_pf = np.asarray([o["target_bbox"] for o in per_frame])
    scores_pf = np.asarray([o["pred_score"] for o in per_frame])

    t2 = make()
    t2.initialize([fv[0], fi[0]], init)
    boxes_c, scores_c = t2.track_chunk(np.stack(fv[1:]), np.stack(fi[1:]))
    np.testing.assert_allclose(boxes_c, boxes_pf, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(scores_c, scores_pf, rtol=1e-5, atol=1e-5)


def test_unimodal_online_track_chunk_matches_per_frame():
    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64, nlayer_head=2)
    model = MixFormer(spec=spec, with_score=True)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), t, t, s)

    def make():
        return OnlineTrackerJit(model=model, variables=variables,
                                template_factor=2.0, template_size=32,
                                search_factor=4.5, search_size=64,
                                update_interval=2, online_size=2, scan_chunk=4)
    frames = _frames(7, seed=7)
    init = {"init_bbox": [40.0, 30.0, 30.0, 24.0]}

    t1 = make()
    t1.initialize(frames[0], init)
    per_frame = [t1.track(frames[k]) for k in range(1, 7)]
    boxes_pf = np.asarray([o["target_bbox"] for o in per_frame])

    t2 = make()
    t2.initialize(frames[0], init)
    fv = np.stack(frames[1:])
    boxes_c, scores_c = t2.track_chunk(fv, fv)
    np.testing.assert_allclose(boxes_c, boxes_pf, rtol=1e-5, atol=1e-4)
    assert scores_c.shape == (6,)
    # carried cache still consistent after the padded tail
    st = t2._state
    fresh = jax.jit(lambda v, a, b: model.apply(v, a, b, method=model.set_online))(
        variables, st.template_v, st.online_template_v)
    np.testing.assert_allclose(np.asarray(t2._cache["mem"][0][0], np.float32),
                               np.asarray(fresh["mem"][0][0], np.float32),
                               atol=1e-5, rtol=1e-4)


def test_rgbt_online_cached_matches_full(rgbt_online):
    """Cached-template online tracker == full-forward online tracker,
    across a score-gated commit."""
    from multi_modal_tracking_tpu.tracking.tracker import (
        RGBTOnlineCachedTrackerJit)
    model, variables = rgbt_online
    kw = dict(model=model, variables=variables, template_factor=2.0,
              template_size=32, search_factor=4.0, search_size=64,
              update_interval=2, max_score_decay=0.98)
    full = RGBTOnlineTrackerJit(**kw)
    cached = RGBTOnlineCachedTrackerJit(**kw)
    fv, fi = _frames(5, seed=11), _frames(5, seed=12)
    info = {"init_bbox": [50.0, 30.0, 30.0, 24.0]}
    full.initialize([fv[0], fi[0]], info)
    cached.initialize([fv[0], fi[0]], info)
    for v, i in zip(fv[1:], fi[1:]):
        bf = full.track([v, i])
        bc = cached.track([v, i])
        np.testing.assert_allclose(bc["target_bbox"], bf["target_bbox"],
                                   rtol=1e-4, atol=1e-3)
        assert abs(bc["pred_score"] - bf["pred_score"]) < 1e-4
