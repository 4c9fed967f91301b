"""FSDP/ZeRO sharding: params + optimizer state sharded over the 'data'
axis must train numerically like replicated data-parallel, while actually
holding 1/N-size parameter shards per device (SURVEY §2.6 — beyond the
reference's replicate-everything DDP)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from multi_modal_tracking_tpu.parallel.mesh import (create_mesh,
                                                    fsdp_shardings,
                                                    shard_batch)
from multi_modal_tracking_tpu.train.train_step import TrainState, make_train_step
from tests.test_tensor_parallel import tiny_setup, _batch  # noqa: F401


def test_fsdp_specs_shard_large_params(tiny_setup):  # noqa: F811
    _, variables = tiny_setup
    mesh = create_mesh(8)
    sh = fsdp_shardings(variables["params"], mesh)   # default min_size=1024
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    sharded = [(p, s) for p, s in flat if "data" in str(s.spec)]
    assert sharded, "no parameter picked up an FSDP sharding"
    # every qkv kernel (64x192 at tiny geometry) must be sharded
    qkv = [s for p, s in flat if any(getattr(k, "key", "") == "qkv" for k in p)
           and getattr(p[-1], "key", "") == "kernel"]
    assert qkv and all("data" in str(s.spec) for s in qkv)
    # tiny leaves stay replicated
    small = [s for p, s in flat
             if getattr(p[-1], "key", "") == "bias" and "norm" in str(p)]
    for s in small:
        assert str(s.spec) == "PartitionSpec()"


def test_fsdp_train_step_matches_dp(tiny_setup):  # noqa: F811
    model, variables = tiny_setup
    rng = np.random.default_rng(0)
    batch = _batch(8, rng)
    tx = optax.adamw(1e-3)

    st0 = TrainState.create(jax.tree.map(lambda x: x.copy(), variables), tx)
    step_dp = make_train_step(model, tx, mesh=None)
    st_dp, m_dp = step_dp(st0, jax.tree.map(jnp.asarray, batch),
                          jax.random.PRNGKey(1))

    mesh = create_mesh(8)
    st1 = TrainState.create(jax.tree.map(lambda x: x.copy(), variables), tx)
    st_sh = fsdp_shardings(st1, mesh, min_size=64)
    st1 = jax.device_put(st1, st_sh)
    step_f = make_train_step(model, tx, mesh=mesh, state_shardings=st_sh)
    st_f, m_f = step_f(st1, shard_batch(batch, mesh), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_f["Loss/total"]), float(m_dp["Loss/total"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(m_f["grad_norm"]), float(m_dp["grad_norm"]),
                               rtol=1e-3)

    # params (and Adam mu) really live as 1/8 shards per device
    flat = jax.tree_util.tree_flatten_with_path(st_f.params)[0]
    leaf = next(x for p, x in flat
                if any(getattr(k, "key", "") == "qkv" for k in p)
                and getattr(p[-1], "key", "") == "kernel")
    shard = leaf.addressable_shards[0]
    assert shard.data.size * 8 == leaf.size
    mu_flat = jax.tree_util.tree_flatten_with_path(st_f.opt_state)[0]
    mu_leaf = next(x for p, x in mu_flat
                   if any(getattr(k, "key", "") == "qkv" for k in p)
                   and getattr(p[-1], "key", "") == "kernel"
                   and hasattr(x, "addressable_shards"))
    assert mu_leaf.addressable_shards[0].data.size * 8 == mu_leaf.size

    # updated params agree with the replicated step
    p_dp = jax.tree_util.tree_leaves(st_dp.params)
    p_f = jax.tree_util.tree_leaves(st_f.params)
    err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(p_dp, p_f))
    assert err < 5e-2, err   # Adam step-1 updates are ~lr-scale; noise ≪ lr


def test_trainer_fsdp_epoch_and_resume(tmp_path):
    """cfg.TRAIN.FSDP=True: the Trainer trains an epoch with sharded state
    over the 8-device mesh, checkpoints, and resumes into the shardings."""
    from tests.test_trainer import _tiny_cfg, _tiny_trainer
    cfg = _tiny_cfg(tmp_path)
    cfg.TRAIN.FSDP = True
    cfg.TRAIN.BATCH_SIZE = 8
    tr = _tiny_trainer(cfg, tmp_path, use_mesh=True)
    assert tr._state_shardings is not None
    tr.train(max_epochs=1, fail_safe=False)
    flat = jax.tree_util.tree_flatten_with_path(tr.state.params)[0]
    leaf = next(x for p, x in flat
                if any(getattr(k, "key", "") == "qkv" for k in p)
                and getattr(p[-1], "key", "") == "kernel")
    n = len(jax.devices())
    assert leaf.addressable_shards[0].data.size * n == leaf.size
    assert tr.load_checkpoint()
    leaf2 = next(x for p, x in
                 jax.tree_util.tree_flatten_with_path(tr.state.params)[0]
                 if any(getattr(k, "key", "") == "qkv" for k in p)
                 and getattr(p[-1], "key", "") == "kernel")
    assert leaf2.addressable_shards[0].data.size * n == leaf2.size


def test_orbax_sharded_checkpoint_roundtrip(tiny_setup, tmp_path):  # noqa: F811
    """FSDP state saved WITHOUT host gathering (orbax writes per-shard) and
    restored straight into the shardings."""
    pytest.importorskip("orbax.checkpoint")
    from multi_modal_tracking_tpu.utils.checkpoint import (
        load_checkpoint_sharded, save_checkpoint_sharded)
    _, variables = tiny_setup
    tx = optax.adamw(1e-3)
    st = TrainState.create(jax.tree.map(lambda x: x.copy(), variables), tx)
    mesh = create_mesh(8)
    sh = fsdp_shardings(st, mesh, min_size=64)
    st_sharded = jax.device_put(st, sh)
    path = save_checkpoint_sharded(str(tmp_path), "Net", 7, st_sharded)
    restored = load_checkpoint_sharded(path, st_sharded, shardings=sh)
    # restored leaves carry the FSDP shardings and the exact values
    flat_r = jax.tree_util.tree_flatten_with_path(restored.params)[0]
    flat_0 = {tuple(str(k) for k in p): x for p, x in
              jax.tree_util.tree_flatten_with_path(st.params)[0]}
    n_sharded = 0
    for p, x in flat_r:
        key = tuple(str(k) for k in p)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(flat_0[key]))
        if "data" in str(x.sharding.spec):
            n_sharded += 1
            assert x.addressable_shards[0].data.size * 8 == x.size
    assert n_sharded > 0


def test_fsdp_second_step_runs_donated(tiny_setup):  # noqa: F811
    """The donated sharded state round-trips through a second step."""
    model, variables = tiny_setup
    rng = np.random.default_rng(1)
    batch = _batch(8, rng)
    tx = optax.adamw(1e-3)
    mesh = create_mesh(8)
    st = TrainState.create(jax.tree.map(lambda x: x.copy(), variables), tx)
    st_sh = fsdp_shardings(st, mesh, min_size=64)
    st = jax.device_put(st, st_sh)
    step = make_train_step(model, tx, mesh=mesh, state_shardings=st_sh)
    b = shard_batch(batch, mesh)
    st, m1 = step(st, b, jax.random.PRNGKey(0))
    st, m2 = step(st, b, jax.random.PRNGKey(1))
    assert int(st.step) == 2
    assert float(m2["Loss/total"]) < float(m1["Loss/total"]) + 1.0
    assert np.isfinite(float(m2["Loss/total"]))
