"""Tensor parallelism over a 2-D (data x model) mesh: Megatron-style param
shardings applied to the SAME GSPMD train step (SURVEY §2.6 — the reference
has no TP; here it falls out of pjit)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from multi_modal_tracking_tpu.config import get_default_config
from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
from multi_modal_tracking_tpu.parallel.mesh import (create_mesh_2d,
                                                    param_shardings,
                                                    shard_batch)
from multi_modal_tracking_tpu.train.train_step import TrainState, make_train_step


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32
    cfg.MODEL.FUSION_LAYERS = 1
    cfg.MODEL.BACKBONE.CE_LOC = []
    import dataclasses
    from multi_modal_tracking_tpu.models.asymmetric_shared import MixFormerRGBT
    model = build_mixformer_rgbt(cfg)
    model = MixFormerRGBT(spec=dataclasses.replace(
        model.spec, embed_dim=64, depth=2, num_heads=2, head_dim=64,
        fusion_layers=1, ce_loc=None, ce_keep_ratio=None))
    t = jnp.zeros((2, 32, 32, 3))
    s = jnp.zeros((2, 64, 64, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    return model, variables


def _batch(B, rng):
    f = lambda h: rng.standard_normal((B, h, h, 3)).astype(np.float32)
    return {"template_v": f(32), "template_i": f(32),
            "online_template_v": f(32), "online_template_i": f(32),
            "search_v": f(64), "search_i": f(64),
            "gt_xywh": np.tile([0.3, 0.3, 0.4, 0.4], (B, 1)).astype(np.float32)}


def test_param_shardings_rules(tiny_setup):
    model, variables = tiny_setup
    mesh = create_mesh_2d(2, 4)
    sh = param_shardings(variables["params"], mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    col = [s for p, s in flat if any(getattr(k, "key", "") == "qkv" for k in p)
           and getattr(p[-1], "key", "") == "kernel"]
    assert col and all(s.spec == P(None, "model") for s in col)
    row = [s for p, s in flat if any(getattr(k, "key", "") == "fc2" for k in p)
           and getattr(p[-1], "key", "") == "kernel"]
    assert row and all(s.spec == P("model", None) for s in row)
    lns = [s for p, s in flat if "norm" in str(p)]
    assert lns and all(s.spec == P() for s in lns)


def test_tp_train_step_matches_dp(tiny_setup):
    """One step on a 2x4 (data x model) mesh must produce the same loss and
    (numerically close) params as the plain data-parallel step."""
    model, variables = tiny_setup
    rng = np.random.default_rng(0)
    batch = _batch(4, rng)
    tx = optax.adamw(1e-3)

    # plain single-device step (the step donates its input state, so give
    # each run its own copy of the variables)
    st0 = TrainState.create(jax.tree.map(lambda x: x.copy(), variables), tx)
    step_dp = make_train_step(model, tx, mesh=None)
    st_dp, m_dp = step_dp(st0, jax.tree.map(jnp.asarray, batch),
                          jax.random.PRNGKey(1))

    # TP step over 2x4
    mesh = create_mesh_2d(2, 4)
    st1 = TrainState.create(jax.tree.map(lambda x: x.copy(), variables), tx)
    st_sh = param_shardings(st1, mesh)
    st1 = jax.device_put(st1, st_sh)
    step_tp = make_train_step(model, tx, mesh=mesh, state_shardings=st_sh)
    st_tp, m_tp = step_tp(st1, shard_batch(batch, mesh), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_tp["Loss/total"]), float(m_dp["Loss/total"]),
                               rtol=1e-4, atol=1e-4)
    # a column-parallel kernel is actually sharded over 'model'
    qkv = jax.tree_util.tree_flatten_with_path(st_tp.params)[0]
    leaf = next(x for p, x in qkv
                if any(getattr(k, "key", "") == "qkv" for k in p)
                and getattr(p[-1], "key", "") == "kernel")
    assert "model" in str(leaf.sharding.spec)
    # gradients agree up to cross-device reduction noise (per-param Adam
    # updates are sign(g)-like at step 1, so they amplify float noise on
    # near-zero grads and are not a meaningful equivalence check)
    np.testing.assert_allclose(float(m_tp["grad_norm"]), float(m_dp["grad_norm"]),
                               rtol=1e-3)
