"""Batched multi-sequence tracking: per-sequence trajectories must equal
sequential single-sequence tracking, including length masking."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.models.asymmetric_shared import (MixFormerRGBT,
                                                               RGBTSpec)
from multi_modal_tracking_tpu.tracking.batched import (
    BatchedRGBTCachedTrackerJit, BatchedRGBTTrackerJit, run_sequences_batched)
from multi_modal_tracking_tpu.tracking.tracker import (RGBTCachedTrackerJit,
                                                       RGBTTrackerJit)


@pytest.fixture(scope="module")
def model_vars():
    spec = RGBTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                    num_heads=2, head_dim=64, fusion_layers=1,
                    ce_loc=None, ce_keep_ratio=None)
    model = MixFormerRGBT(spec=spec)
    t = jnp.zeros((2, 32, 32, 3), jnp.float32)
    s = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    return model, variables


def _seq_frames(n, seed, H=96, W=128):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 255, (n, H, W, 3), np.uint8),
            rng.integers(0, 255, (n, H, W, 3), np.uint8))


def test_batched_matches_sequential(model_vars):
    model, variables = model_vars
    kw = dict(model=model, variables=variables, template_size=32,
              search_size=64, update_interval=3)
    boxes0 = np.asarray([[40.0, 30, 30, 24], [50.0, 20, 24, 30], [30.0, 40, 20, 20]],
                        np.float32)
    lengths = [7, 5, 7]                      # ragged: seq 1 ends early
    seqs = [_seq_frames(lengths[j], seed=j) for j in range(3)]

    # sequential reference
    seq_boxes = []
    for j in range(3):
        tr = RGBTTrackerJit(**kw)
        tr.initialize([seqs[j][0][0], seqs[j][1][0]], {"init_bbox": boxes0[j]})
        seq_boxes.append(np.asarray(
            [tr.track([seqs[j][0][k], seqs[j][1][k]])["target_bbox"]
             for k in range(1, lengths[j])]))

    # batched lockstep with masking + padded timelines
    bt = BatchedRGBTTrackerJit(**kw, scan_chunk=4)
    bt.initialize(np.stack([s[0][0] for s in seqs]),
                  np.stack([s[1][0] for s in seqs]), boxes0)
    T = max(lengths) - 1
    fv = np.zeros((T, 3, 96, 128, 3), np.uint8)
    fi = np.zeros_like(fv)
    ok = np.zeros((T, 3), np.bool_)
    for j in range(3):
        for t in range(T):
            k = min(t + 1, lengths[j] - 1)
            fv[t, j] = seqs[j][0][k]
            fi[t, j] = seqs[j][1][k]
            ok[t, j] = t + 1 < lengths[j]
    got = bt.track_block(fv, fi, ok)
    for j in range(3):
        np.testing.assert_allclose(got[: lengths[j] - 1, j], seq_boxes[j],
                                   rtol=1e-5, atol=1e-4)


def test_cached_batched_matches_sequential_cached(model_vars):
    """BatchedRGBTCachedTrackerJit == RGBTCachedTrackerJit run sequentially,
    across ragged lengths and template-update-interval crossings (the scalar
    update cadence hoisted out of the vmap must reproduce the per-sequence
    `frame_id % interval` exactly)."""
    model, variables = model_vars
    kw = dict(model=model, variables=variables, template_size=32,
              search_size=64, update_interval=3)
    boxes0 = np.asarray([[40.0, 30, 30, 24], [50.0, 20, 24, 30], [30.0, 40, 20, 20]],
                        np.float32)
    lengths = [9, 5, 9]                       # crosses updates at frames 3, 6
    seqs = [_seq_frames(lengths[j], seed=10 + j) for j in range(3)]

    seq_boxes = []
    for j in range(3):
        tr = RGBTCachedTrackerJit(**kw)
        tr.initialize([seqs[j][0][0], seqs[j][1][0]], {"init_bbox": boxes0[j]})
        seq_boxes.append(np.asarray(
            [tr.track([seqs[j][0][k], seqs[j][1][k]])["target_bbox"]
             for k in range(1, lengths[j])]))

    bt = BatchedRGBTCachedTrackerJit(**kw, scan_chunk=4)
    bt.initialize(np.stack([s[0][0] for s in seqs]),
                  np.stack([s[1][0] for s in seqs]), boxes0)
    T = max(lengths) - 1
    fv = np.zeros((T, 3, 96, 128, 3), np.uint8)
    fi = np.zeros_like(fv)
    ok = np.zeros((T, 3), np.bool_)
    for j in range(3):
        for t in range(T):
            k = min(t + 1, lengths[j] - 1)
            fv[t, j] = seqs[j][0][k]
            fi[t, j] = seqs[j][1][k]
            ok[t, j] = t + 1 < lengths[j]
    got = bt.track_block(fv, fi, ok)
    for j in range(3):
        np.testing.assert_allclose(got[: lengths[j] - 1, j], seq_boxes[j],
                                   rtol=1e-4, atol=1e-3)


def test_cached_batched_matches_full_batched(model_vars):
    """Cached lockstep == full-forward lockstep (the fast path must not
    change trajectories, mirroring the single-sequence guard)."""
    model, variables = model_vars
    kw = dict(model=model, variables=variables, template_size=32,
              search_size=64, update_interval=3, scan_chunk=4)
    N, T = 4, 7
    rng = np.random.default_rng(3)
    fv = rng.integers(0, 255, (T, N, 96, 128, 3), np.uint8)
    fi = rng.integers(0, 255, (T, N, 96, 128, 3), np.uint8)
    boxes0 = np.stack([[30.0 + 2 * i, 30, 24, 24] for i in range(N)]).astype(np.float32)

    full = BatchedRGBTTrackerJit(**kw)
    full.initialize(fv[0], fi[0], boxes0)
    ref = full.track_block(fv, fi)

    cached = BatchedRGBTCachedTrackerJit(**kw)
    cached.initialize(fv[0], fi[0], boxes0)
    got = cached.track_block(fv, fi)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


@pytest.fixture(scope="module")
def online_model_vars():
    spec = RGBTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                    num_heads=2, head_dim=64, fusion_layers=1,
                    ce_loc=None, ce_keep_ratio=None, nlayer_head=2)
    model = MixFormerRGBT(spec=spec, with_score=True)
    t = jnp.zeros((2, 32, 32, 3), jnp.float32)
    s = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), t, t, s)
    return model, variables


@pytest.mark.parametrize("cached", [False, True])
def test_online_batched_matches_sequential(online_model_vars, cached):
    """Batched online lockstep (full and cached) == sequential
    RGBTOnline[Cached]TrackerJit, boxes AND scores, across score-gated
    commits and a ragged tail."""
    from multi_modal_tracking_tpu.tracking.batched import (
        BatchedRGBTOnlineCachedTrackerJit, BatchedRGBTOnlineTrackerJit)
    from multi_modal_tracking_tpu.tracking.tracker import (
        RGBTOnlineCachedTrackerJit, RGBTOnlineTrackerJit)
    model, variables = online_model_vars
    kw = dict(model=model, variables=variables, template_factor=2.0,
              template_size=32, search_factor=4.0, search_size=64,
              update_interval=3, max_score_decay=0.98)
    single_cls = RGBTOnlineCachedTrackerJit if cached else RGBTOnlineTrackerJit
    batched_cls = (BatchedRGBTOnlineCachedTrackerJit if cached
                   else BatchedRGBTOnlineTrackerJit)
    boxes0 = np.asarray([[40.0, 30, 30, 24], [50.0, 20, 24, 30]], np.float32)
    lengths = [8, 5]
    seqs = [_seq_frames(lengths[j], seed=20 + j) for j in range(2)]

    seq_out = []
    for j in range(2):
        tr = single_cls(**kw)
        tr.initialize([seqs[j][0][0], seqs[j][1][0]], {"init_bbox": boxes0[j]})
        outs = [tr.track([seqs[j][0][k], seqs[j][1][k]])
                for k in range(1, lengths[j])]
        seq_out.append((np.asarray([o["target_bbox"] for o in outs]),
                        np.asarray([o["pred_score"] for o in outs])))

    bt = batched_cls(**kw, scan_chunk=4)
    bt.initialize(np.stack([s[0][0] for s in seqs]),
                  np.stack([s[1][0] for s in seqs]), boxes0)
    T = max(lengths) - 1
    fv = np.zeros((T, 2, 96, 128, 3), np.uint8)
    fi = np.zeros_like(fv)
    ok = np.zeros((T, 2), np.bool_)
    for j in range(2):
        for t in range(T):
            k = min(t + 1, lengths[j] - 1)
            fv[t, j] = seqs[j][0][k]
            fi[t, j] = seqs[j][1][k]
            ok[t, j] = t + 1 < lengths[j]
    got_boxes, got_scores = bt.track_block(fv, fi, ok)
    assert got_boxes.shape == (T, 2, 4) and got_scores.shape == (T, 2)
    for j in range(2):
        n = lengths[j] - 1
        np.testing.assert_allclose(got_boxes[:n, j], seq_out[j][0],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(got_scores[:n, j], seq_out[j][1],
                                   rtol=1e-4, atol=1e-3)


def test_run_sequences_batched_online_writes_scores(tmp_path, online_model_vars):
    """Online lockstep eval writes the {name}_score.txt files (running.py's
    score layout: frame 0 defaults to 1.0)."""
    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    from multi_modal_tracking_tpu.tracking.batched import (
        BatchedRGBTOnlineCachedTrackerJit)
    model, variables = online_model_vars
    ds = get_dataset("synthetic_rgbt")
    tracker = BatchedRGBTOnlineCachedTrackerJit(
        model=model, variables=variables, template_size=32, search_size=64,
        update_interval=3, scan_chunk=8)
    stats = run_sequences_batched(list(ds), tracker, str(tmp_path / "res"))
    assert len(stats) == len(ds)
    for seq in ds:
        sc = np.loadtxt(tmp_path / "res" / f"{seq.name}_score.txt")
        assert sc.shape == (len(seq.frames),)
        assert sc[0] == 1.0 and np.isfinite(sc).all()
        assert (sc >= 0).all() and (sc <= 1).all()


@pytest.fixture(scope="module")
def uni_model_vars():
    from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec
    spec = ViTSpec(search_size=64, template_size=32, embed_dim=64, depth=2,
                   num_heads=2, head_dim=64, nlayer_head=2)
    model = MixFormer(spec=spec, with_score=True)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), t, t, s)
    return model, variables


@pytest.mark.parametrize("cls_pair", ["full", "cached", "online"])
def test_unimodal_batched_matches_sequential(uni_model_vars, cls_pair):
    """Unimodal lockstep (full / cached / ring-buffer online, TIR mode so
    the JET transform runs in-scan) == sequential single-sequence tracking
    across ragged lengths and update-interval crossings."""
    from multi_modal_tracking_tpu.tracking.batched import (
        BatchedOnlineTrackerJit, BatchedRGBCachedTrackerJit,
        BatchedRGBTrackerJit)
    from multi_modal_tracking_tpu.tracking.tracker import (
        OnlineTrackerJit, RGBCachedTrackerJit, RGBTrackerJit)
    model, variables = uni_model_vars
    kw = dict(model=model, variables=variables, template_size=32,
              search_size=64, update_interval=3, mode="TIR")
    if cls_pair == "online":
        kw.update(online_size=2, max_score_decay=0.98)
    single_cls, batched_cls = {
        "full": (RGBTrackerJit, BatchedRGBTrackerJit),
        "cached": (RGBCachedTrackerJit, BatchedRGBCachedTrackerJit),
        "online": (OnlineTrackerJit, BatchedOnlineTrackerJit),
    }[cls_pair]
    boxes0 = np.asarray([[40.0, 30, 30, 24], [50.0, 20, 24, 30]], np.float32)
    lengths = [8, 5]
    seqs = [_seq_frames(lengths[j], seed=30 + j)[0] for j in range(2)]

    seq_out = []
    for j in range(2):
        tr = single_cls(**kw)
        tr.initialize(seqs[j][0], {"init_bbox": boxes0[j]})
        outs = [tr.track(seqs[j][k]) for k in range(1, lengths[j])]
        seq_out.append((np.asarray([o["target_bbox"] for o in outs]),
                        np.asarray([o.get("pred_score", 1.0) for o in outs])))

    bt = batched_cls(**kw, scan_chunk=4)
    f0 = np.stack([s[0] for s in seqs])
    bt.initialize(f0, f0, boxes0)          # same array: unimodal single upload
    T = max(lengths) - 1
    fv = np.zeros((T, 2, 96, 128, 3), np.uint8)
    ok = np.zeros((T, 2), np.bool_)
    for j in range(2):
        for t in range(T):
            fv[t, j] = seqs[j][min(t + 1, lengths[j] - 1)]
            ok[t, j] = t + 1 < lengths[j]
    got = bt.track_block(fv, fv, ok)
    got_boxes, got_scores = got if isinstance(got, tuple) else (got, None)
    for j in range(2):
        n = lengths[j] - 1
        np.testing.assert_allclose(got_boxes[:n, j], seq_out[j][0],
                                   rtol=1e-4, atol=1e-3)
        if got_scores is not None:
            np.testing.assert_allclose(got_scores[:n, j], seq_out[j][1],
                                       rtol=1e-4, atol=1e-3)


def test_run_sequences_batched_unimodal(tmp_path, uni_model_vars):
    """run_sequences_batched over a unimodal (single-frame-array) dataset."""
    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    from multi_modal_tracking_tpu.tracking.batched import BatchedRGBCachedTrackerJit
    model, variables = uni_model_vars
    ds = get_dataset("synthetic_rgb")
    tracker = BatchedRGBCachedTrackerJit(
        model=model, variables=variables, template_size=32, search_size=64,
        update_interval=3, scan_chunk=8)
    stats = run_sequences_batched(list(ds), tracker, str(tmp_path / "res"))
    assert len(stats) == len(ds)
    for seq in ds:
        b = np.loadtxt(tmp_path / "res" / f"{seq.name}.txt")
        assert b.shape == (len(seq.frames), 4)
        assert np.isfinite(b).all()


def test_run_sequences_batched_writes_results(tmp_path, model_vars):
    model, variables = model_vars
    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    ds = get_dataset("synthetic_rgbt")
    tracker = BatchedRGBTTrackerJit(model=model, variables=variables,
                                    template_size=32, search_size=64,
                                    scan_chunk=8)
    stats = run_sequences_batched(list(ds), tracker, str(tmp_path / "res"))
    assert len(stats) == len(ds)
    for seq in ds:
        b = np.loadtxt(tmp_path / "res" / f"{seq.name}.txt")
        assert b.shape == (len(seq.frames), 4)
        assert np.isfinite(b).all()


@pytest.mark.parametrize("cls", [BatchedRGBTTrackerJit,
                                 BatchedRGBTCachedTrackerJit])
def test_batched_mesh_sharded_matches_unsharded(model_vars, cls):
    """Sequence batch sharded over an 8-device data mesh == single device
    (both the full-forward and the cached-template lockstep: set_online
    under vmap must partition cleanly under GSPMD)."""
    from jax.sharding import Mesh
    model, variables = model_vars
    kw = dict(model=model, variables=variables, template_size=32,
              search_size=64, update_interval=3, scan_chunk=4)
    N, T = 8, 6
    rng = np.random.default_rng(7)
    fv = rng.integers(0, 255, (T, N, 96, 128, 3), np.uint8)
    fi = rng.integers(0, 255, (T, N, 96, 128, 3), np.uint8)
    boxes0 = np.stack([[30.0 + i, 30, 24, 24] for i in range(N)]).astype(np.float32)

    plain = cls(**kw)
    plain.initialize(fv[0], fi[0], boxes0)
    ref = plain.track_block(fv, fi)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = cls(**kw, mesh=mesh)
    sharded.initialize(fv[0], fi[0], boxes0)
    out = sharded.track_block(fv, fi)
    # per-sequence state is sharded over devices
    assert sharded._state.state.sharding.is_fully_replicated is False
    np.testing.assert_allclose(out, ref, atol=1e-3)
