"""Gradient checkpointing (cfg.TRAIN.REMAT): the rematted flagship backbone
must be arithmetically identical to the plain one — same params, same loss,
same grads — while storing ~1/depth of the activations (the jax.checkpoint
HBM lever; no reference equivalent)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_modal_tracking_tpu.config import get_default_config
from multi_modal_tracking_tpu.models.asymmetric_shared import (MixFormerRGBT,
                                                               build_mixformer_rgbt)


@pytest.fixture(scope="module")
def pair():
    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32
    cfg.MODEL.FUSION_LAYERS = 1
    spec = dataclasses.replace(
        build_mixformer_rgbt(cfg).spec, embed_dim=64, depth=3, num_heads=2,
        head_dim=64, fusion_layers=1, ce_loc=(1,), ce_keep_ratio=(0.7,),
        drop_path_rate=0.1)
    model = MixFormerRGBT(spec=spec)
    model_r = MixFormerRGBT(spec=dataclasses.replace(spec, remat=True))
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    return model, model_r, variables, t, s


def _loss_and_grads(m, variables, t, s):
    def f(p):
        out = m.apply({"params": p, "batch_stats": variables["batch_stats"]},
                      t, t, s, 0.7, deterministic=False, train=True,
                      mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(5),
                            "droppath": jax.random.PRNGKey(6)})
        return jnp.sum(out[0]["pred_boxes"] ** 2)
    return jax.jit(jax.value_and_grad(f))(variables["params"])


def test_remat_same_loss_and_grads(pair):
    model, model_r, variables, t, s = pair
    l0, g0 = _loss_and_grads(model, variables, t, s)
    l1, g1 = _loss_and_grads(model_r, variables, t, s)   # SAME params load
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_cached_paths_and_full_forward(pair):
    model, model_r, variables, t, s = pair
    full = model.apply(variables, t, t, s, 0.7)["pred_boxes"]
    full_r = model_r.apply(variables, t, t, s, 0.7)["pred_boxes"]
    np.testing.assert_allclose(np.asarray(full), np.asarray(full_r), atol=1e-6)
    cache = model_r.apply(variables, t, t, method=model_r.set_online)
    out = model_r.apply(variables, cache, s, 0.7, method=model_r.forward_track)
    np.testing.assert_allclose(np.asarray(out["pred_boxes"]),
                               np.asarray(full_r), atol=1e-5)


def test_remat_from_cfg():
    cfg = get_default_config("asymmetric_shared_ce")
    assert build_mixformer_rgbt(cfg).spec.remat is False
    cfg.TRAIN.REMAT = True
    assert build_mixformer_rgbt(cfg).spec.remat is True
