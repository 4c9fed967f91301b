"""MixFormer-CvT tests: shapes, strided-k/v attention consistency, and the
core online-tracking invariant: because template tokens never attend to
search tokens, set_online + forward_test must reproduce the joint forward
exactly (lib/models/mixformer_cvt/mixformer_online.py:282-326 semantics)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_modal_tracking_tpu.config import get_default_config
from multi_modal_tracking_tpu.models.cvt import CvTSpec, MixFormerCvT, build_mixformer_cvt


def _tiny_model(with_score=False):
    spec = CvTSpec(search_size=64, template_size=32,
                   num_stages=3, depth=(1, 1, 2), dim_embed=(16, 24, 32),
                   num_heads=(1, 2, 4), head_dim=32,
                   drop_path_rate=(0.0, 0.0, 0.0))
    return MixFormerCvT(spec=spec, with_score=with_score)


@pytest.fixture(scope="module")
def model_and_vars():
    model = _tiny_model()
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), t, t, s)
    return model, variables, t, s


def test_forward_shapes(model_and_vars):
    model, variables, t, s = model_and_vars
    out = model.apply(variables, t, t, s)
    assert out["pred_boxes"].shape == (2, 1, 4)
    b = np.asarray(out["pred_boxes"])
    assert np.isfinite(b).all() and (b >= -0.1).all() and (b <= 1.1).all()


def test_cvt_from_cfg_builds():
    cfg = get_default_config("mixformer_cvt")
    model = build_mixformer_cvt(cfg)
    assert model.spec.dim_embed == (64, 192, 384)
    # reference base-script default is CvT-13 depths; online is CvT-21
    assert model.spec.depth == (1, 2, 10)
    assert cfg.DATA.SEARCH.SIZE == 320 and cfg.TEST.SEARCH_SIZE == 320
    assert int(np.prod(model.spec.patch_stride)) == 16
    ocfg = get_default_config("mixformer_cvt_online")
    assert tuple(ocfg.MODEL.BACKBONE.DEPTH) == (1, 4, 16)
    assert ocfg.DATA.SAMPLER_MODE == "trident_pro" and ocfg.TRAIN.TRAIN_SCORE


def test_online_path_matches_joint_forward(model_and_vars):
    model, variables, t, s = model_and_vars
    t1, s1 = t[:1], s[:1]
    joint = model.apply(variables, t1, t1, s1)["pred_boxes"]
    cache = model.apply(variables, t1, t1, method=model.set_online)
    test = model.apply(variables, s1, cache, method=model.forward_test)["pred_boxes"]
    np.testing.assert_allclose(np.asarray(joint), np.asarray(test),
                               rtol=2e-4, atol=2e-5)


def test_multi_template_online(model_and_vars):
    model, variables, t, s = model_and_vars
    ot3 = jnp.concatenate([t[:1]] * 3, axis=0)    # ring buffer of 3 templates
    cache = model.apply(variables, t[:1], ot3, method=model.set_online)
    out = model.apply(variables, s[:1], cache, method=model.forward_test)
    assert out["pred_boxes"].shape == (1, 1, 4)
    # k/v cache token count: t_k + 3*ot_k with stride-2 conv on 8x8 token map
    k0 = cache["mem"][0][0][0]
    assert k0.shape[2] == 4 * ((32 // 4 + 1) // 2) ** 2


def test_score_head_path():
    model = _tiny_model(with_score=True)
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), t, t, s, run_score_head=True)
    out = model.apply(variables, t, t, s, run_score_head=True)
    assert out["pred_scores"].shape[0] == 2


def test_jit_forward(model_and_vars):
    model, variables, t, s = model_and_vars
    f = jax.jit(lambda v, a, b, c: model.apply(v, a, b, c)["pred_boxes"])
    out = f(variables, t, t, s)
    assert np.isfinite(np.asarray(out)).all()
