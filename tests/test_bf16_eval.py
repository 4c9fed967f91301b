"""bf16 eval-path fidelity tests (VERDICT r4 #1).

The shipped eval default is dtype=bfloat16 with params pre-cast
(eval/evaltracker.py); the parity chain is f32 (the reference evaluates f32
under torch.inference_mode, lib/test/tracker/asymmetric_shared_ce.py:90-98).
These tests pin the bf16 path's mechanics and single-forward closeness on
CPU; the trained-checkpoint drift measurement at flagship geometry lives in
artifacts/bf16_parity.py -> artifacts/bf16_parity_r5.json (real chip).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_modal_tracking_tpu.models.asymmetric_shared import (MixFormerRGBT,
                                                               RGBTSpec)
from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit
from multi_modal_tracking_tpu.utils.checkpoint import cast_floating


@pytest.fixture(scope="module")
def pair():
    """Same params, f32 and bf16 model twins (tiny geometry)."""
    spec = RGBTSpec(search_size=96, template_size=64, embed_dim=64, depth=2,
                    num_heads=2, head_dim=64, fusion_layers=1,
                    ce_loc=(1,), ce_keep_ratio=(0.7,), nlayer_head=2)
    m32 = MixFormerRGBT(spec=spec, dtype=jnp.float32)
    m16 = MixFormerRGBT(spec=spec, dtype=jnp.bfloat16)
    t = jnp.zeros((2, 64, 64, 3), jnp.float32)
    s = jnp.zeros((2, 96, 96, 3), jnp.float32)
    v32 = jax.jit(m32.init)(jax.random.PRNGKey(0), t, t, s)
    v16 = cast_floating(v32, jnp.bfloat16)
    return (m32, v32), (m16, v16)


def test_bf16_forward_close_to_f32(pair):
    """One forward: bf16 pred boxes within bf16-roundoff distance of f32
    (boxes are cxcywh in [0,1]; soft-argmax keeps the expectation smooth,
    so block-wise bf16 error accumulates benignly)."""
    (m32, v32), (m16, v16) = pair
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2, 96, 96, 3)), jnp.float32)
    b32 = np.asarray(jax.jit(lambda v, a, b, c: m32.apply(v, a, b, c, None)[
        "pred_boxes"])(v32, t, t, s), np.float32)
    b16 = np.asarray(jax.jit(lambda v, a, b, c: m16.apply(v, a, b, c, None)[
        "pred_boxes"])(v16, t, t, s), np.float32)
    assert np.isfinite(b16).all()
    np.testing.assert_allclose(b16, b32, atol=5e-2)


def test_bf16_tracker_runs_and_tracks_near_f32(pair):
    """Short trajectory, both dtypes from identical init: the bf16 loop must
    run the full cached path (set_online + forward_track + update) and stay
    in the same neighbourhood as f32 — tracking is a feedback loop, so this
    bounds mechanical divergence only; the trained-model drift bound is the
    artifact's job."""
    (m32, v32), (m16, v16) = pair
    kw = dict(template_factor=2.0, template_size=64, search_factor=4.5,
              search_size=96, update_interval=3, scan_chunk=4)
    rng = np.random.default_rng(1)
    fv = rng.integers(0, 255, (9, 120, 160, 3), dtype=np.uint8)
    fi = rng.integers(0, 255, (9, 120, 160), dtype=np.uint8)
    init = {"init_bbox": [70.0, 50.0, 16.0, 14.0]}
    out = {}
    for tag, (m, v) in (("f32", (m32, v32)), ("bf16", (m16, v16))):
        tr = RGBTCachedTrackerJit(model=m, variables=v, **kw)
        tr.initialize([fv[0], fi[0]], init)
        out[tag] = np.asarray(tr.track_chunk(fv[1:], fi[1:], fetch=True))
    assert np.isfinite(out["bf16"]).all()
    cd = np.hypot(
        (out["f32"][:, 0] + out["f32"][:, 2] / 2)
        - (out["bf16"][:, 0] + out["bf16"][:, 2] / 2),
        (out["f32"][:, 1] + out["f32"][:, 3] / 2)
        - (out["bf16"][:, 1] + out["bf16"][:, 3] / 2))
    # untrained net: predictions hover near the crop centre, so the two
    # dtypes' trajectories stay within a few pixels (loose, mechanics-level)
    assert cd.mean() < 10.0, cd


def test_evaltracker_default_dtype_is_bf16():
    """The recorded policy: eval default stays bf16 (TPU-first; measured
    drift bound in artifacts/bf16_parity_r5.json), f32 available per call."""
    import inspect
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker
    sig = inspect.signature(create_tracker)
    assert sig.parameters["dtype"].default is jnp.bfloat16
