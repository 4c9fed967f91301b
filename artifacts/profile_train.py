"""On-chip train-step decomposition: forward vs forward+backward vs full
step (grads+optimizer), at B in {16, 32}, CE keep 0.7 — ms, samples/s, and
achieved TFLOP/s per variant from XLA cost_analysis.

NOTE (CLAUDE.md): executing a fwd+bwd program wedges the axon backend for
later large-program launches — run this in its OWN process, after any
tracking measurements.

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python artifacts/profile_train.py [B ...]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
    from multi_modal_tracking_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from multi_modal_tracking_tpu.train.optimizer import make_optimizer
    from multi_modal_tracking_tpu.train.train_step import TrainState, make_train_step
    from multi_modal_tracking_tpu.train.losses import box_losses

    V5E_BF16_PEAK = 197e12
    batches = [int(a) for a in sys.argv[1:]] or [16, 32]

    cfg = get_default_config("asymmetric_shared_ce")
    model = build_mixformer_rgbt(cfg, dtype=jnp.bfloat16)
    t = jnp.zeros((2, 128, 128, 3), jnp.float32)
    s = jnp.zeros((2, 288, 288, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    mesh = create_mesh(1)
    tx = make_optimizer(cfg, variables["params"], steps_per_epoch=1000)

    rng = np.random.default_rng(0)
    T_, S_ = 128, 288
    REPS = 8

    def cost_flops(lowered):
        try:
            c = lowered.compile().cost_analysis()
            if isinstance(c, list):
                c = c[0] if c else {}
            return float((c or {}).get("flops", float("nan")))
        except Exception:
            return float("nan")

    def timed(fn, *args, n=REPS, chain=None):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        res = args
        for _ in range(n):
            out = fn(*res) if chain is None else fn(*chain(out, *res))
            res = args
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / n

    for B in batches:
        batch = {
            "template_v": rng.standard_normal((B, T_, T_, 3), np.float32),
            "template_i": rng.standard_normal((B, T_, T_, 3), np.float32),
            "online_template_v": rng.standard_normal((B, T_, T_, 3), np.float32),
            "online_template_i": rng.standard_normal((B, T_, T_, 3), np.float32),
            "search_v": rng.standard_normal((B, S_, S_, 3), np.float32),
            "search_i": rng.standard_normal((B, S_, S_, 3), np.float32),
            "gt_xywh": rng.uniform(0.2, 0.4, (B, 4)).astype(np.float32),
        }
        batch = shard_batch(batch, mesh)
        state = replicate(TrainState.create(variables, tx), mesh)

        # ---- forward only (loss) ----
        def fwd(params, bstats, b, key):
            tt = jnp.concatenate([b["template_v"], b["template_i"]], axis=0)
            ot = jnp.concatenate([b["online_template_v"], b["online_template_i"]], axis=0)
            ss = jnp.concatenate([b["search_v"], b["search_i"]], axis=0)
            vs = {"params": params}
            if bstats:
                vs["batch_stats"] = bstats
            out, _ = model.apply(vs, tt, ot, ss, 0.7, deterministic=False,
                                 train=True, mutable=["batch_stats"],
                                 rngs={"dropout": key, "droppath": key})
            loss, _ = box_losses(out["pred_boxes"], b["gt_xywh"], 2.0, 5.0)
            return loss
        key = jax.random.PRNGKey(0)
        jf = jax.jit(fwd)
        lf = jf.lower(state.params, state.batch_stats, batch, key)
        f_flops = cost_flops(lf)
        t_f = timed(jf, state.params, state.batch_stats, batch, key)

        # ---- forward+backward (grads only) ----
        jg = jax.jit(lambda p, bs, b, k: jax.grad(fwd)(p, bs, b, k))
        lg = jg.lower(state.params, state.batch_stats, batch, key)
        g_flops = cost_flops(lg)
        t_g = timed(jg, state.params, state.batch_stats, batch, key)

        # ---- full train step ----
        step = make_train_step(model, tx, mesh=mesh, rgbt=True,
                               iou_weight=2.0, l1_weight=5.0)
        ls = step.jitted(0.7).lower(state, batch, key)
        s_flops = cost_flops(ls)
        st2, m = step(state, batch, key, ce_keep_rate=0.7)
        np.asarray(m["Loss/total"])
        t0 = time.perf_counter()
        for k in range(REPS):
            st2, m = step(st2, batch, jax.random.PRNGKey(k), ce_keep_rate=0.7)
        np.asarray(m["Loss/total"])
        t_s = (time.perf_counter() - t0) / REPS

        for nm, dt, fl in (("fwd", t_f, f_flops), ("fwd+bwd", t_g, g_flops),
                           ("full step", t_s, s_flops)):
            print(f"B={B:3d} {nm:10s} {dt*1e3:8.2f} ms  {B/dt:7.1f} samples/s  "
                  f"{fl/1e12:6.2f} TFLOP  {fl/dt/1e12:6.1f} TFLOP/s  "
                  f"MFU {fl/dt/V5E_BF16_PEAK*100:5.1f}%")


if __name__ == "__main__":
    main()
