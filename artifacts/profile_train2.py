"""Train-side what-if profiling: fwd+bwd variants of the flagship train
step, isolating the non-matmul suspects.

Variants (VARIANTS env, comma list; each costs one remote compile):
  fwd     forward-only loss, B=16                       (lower bound)
  gbase   jax.grad(loss), B=16, dropout ON, threefry    (the benched path)
  gdet    gbase with deterministic=True                 (RNG + mask cost)
  grbg    gbase with an unsafe_rbg PRNG key             (cheap-RNG variant)
  gb32    gbase at B=32                                 (batch scaling)
  gb32r   gb32 with remat (TRAIN.REMAT)                 (recompute trade)

NOTE (CLAUDE.md): run AFTER any tracking measurements, in its own process
(executing fwd+bwd wedges this backend for later large-program launches).

Run:  env PYTHONPATH=/root/repo:/root/.axon_site VARIANTS=gbase,gdet \
        python -u artifacts/profile_train2.py
"""
import os
import time

import numpy as np

REPS = 8
VARIANTS = os.environ.get("VARIANTS", "fwd,gbase,gdet,grbg,gb32").split(",")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
    from multi_modal_tracking_tpu.train.losses import box_losses

    V5E_BF16_PEAK = 197e12
    cfg = get_default_config("asymmetric_shared_ce")

    def build(remat: bool):
        if remat:
            cfg.TRAIN.REMAT = True
        model = build_mixformer_rgbt(cfg, dtype=jnp.bfloat16)
        t = jnp.zeros((2, 128, 128, 3), jnp.float32)
        s = jnp.zeros((2, 288, 288, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
        if remat:
            cfg.TRAIN.REMAT = False
        return model, variables

    model, variables = build(remat=False)

    rng = np.random.default_rng(0)
    T_, S_ = 128, 288

    def make_batch(B):
        return {
            "template_v": jnp.asarray(rng.standard_normal((B, T_, T_, 3), np.float32)),
            "template_i": jnp.asarray(rng.standard_normal((B, T_, T_, 3), np.float32)),
            "online_template_v": jnp.asarray(rng.standard_normal((B, T_, T_, 3), np.float32)),
            "online_template_i": jnp.asarray(rng.standard_normal((B, T_, T_, 3), np.float32)),
            "search_v": jnp.asarray(rng.standard_normal((B, S_, S_, 3), np.float32)),
            "search_i": jnp.asarray(rng.standard_normal((B, S_, S_, 3), np.float32)),
            "gt_xywh": jnp.asarray(rng.uniform(0.2, 0.4, (B, 4)).astype(np.float32)),
        }

    def make_fwd(mdl, deterministic):
        def fwd(params, bstats, b, key):
            tt = jnp.concatenate([b["template_v"], b["template_i"]], axis=0)
            ot = jnp.concatenate([b["online_template_v"], b["online_template_i"]], axis=0)
            ss = jnp.concatenate([b["search_v"], b["search_i"]], axis=0)
            vs = {"params": params}
            if bstats:
                vs["batch_stats"] = bstats
            out, _ = mdl.apply(vs, tt, ot, ss, 0.7,
                               deterministic=deterministic,
                               train=True, mutable=["batch_stats"],
                               rngs={"dropout": key, "droppath": key})
            loss, _ = box_losses(out["pred_boxes"], b["gt_xywh"], 2.0, 5.0)
            return loss
        return fwd

    def timed(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / REPS

    def flops_of(lowered):
        try:
            c = lowered.compile().cost_analysis()
            if isinstance(c, list):
                c = c[0] if c else {}
            return float((c or {}).get("flops", float("nan")))
        except Exception:
            return float("nan")

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    key_tf = jax.random.PRNGKey(0)
    key_rbg = jax.random.key(0, impl="unsafe_rbg")

    for name in VARIANTS:
        B = 32 if name.startswith("gb32") else 16
        batch = make_batch(B)
        det = name == "gdet"
        key = key_rbg if name == "grbg" else key_tf
        mdl, prm, bst = model, params, bstats
        if name == "gb32r":
            mdl, v2 = build(remat=True)
            prm, bst = v2["params"], v2.get("batch_stats", {})
        fwd = make_fwd(mdl, det)
        if name == "fwd":
            jf = jax.jit(fwd)
        else:
            jf = jax.jit(lambda p, bs, b, k, _f=fwd: jax.grad(_f)(p, bs, b, k))
        fl = flops_of(jf.lower(prm, bst, batch, key))
        dt = timed(jf, prm, bst, batch, key)
        print(f"{name:7s} B={B:2d} {dt*1e3:8.2f} ms  {B/dt:7.1f} samples/s  "
              f"{fl/1e12:6.2f} TFLOP  {fl/dt/1e12:6.1f} TFLOP/s  "
              f"MFU {fl/dt/V5E_BF16_PEAK*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
