"""Per-stage on-chip timing of the flagship cached track step.

Breaks the per-frame program into prep (crop+JET+normalise), backbone
(search-only forward vs template cache), fusion (6-layer deformable
encoder), and corner head, each timed as a K-iteration lax.scan with a
carry-chained data dependency (so XLA cannot hoist the body), ending in a
real np.asarray fetch (bare block_until_ready can return early on this
transport — CLAUDE.md). Prints ms/iter and achieved TFLOP/s per stage.

Run on the real chip:  env PYTHONPATH=/root/repo:/root/.axon_site python -u artifacts/profile_stages.py
Each stage needs a remote XLA compile (~30-90 s); COST=1 adds a second
compile per stage for FLOP counts — leave it off for a quick pass.
"""
import os
import time

import numpy as np

COST = os.environ.get("COST", "0") == "1"
K = int(os.environ.get("K", "64"))
# comma list of stages to run (full,prep,track,bb,fus,head) — each needs its
# own remote compile, so a 590 s budget fits about three.
STAGES = set(os.environ.get("STAGES", "full,prep,track,bb,fus,head").split(","))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit
    from multi_modal_tracking_tpu.utils.checkpoint import cast_floating

    cfg = get_default_config("asymmetric_shared_ce")
    model = build_mixformer_rgbt(cfg, dtype=jnp.bfloat16)
    t = jnp.zeros((2, 128, 128, 3), jnp.float32)
    s = jnp.zeros((2, 288, 288, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    variables = cast_floating(variables, jnp.bfloat16)

    tracker = RGBTCachedTrackerJit(
        model=model, variables=variables,
        template_factor=cfg.TEST.TEMPLATE_FACTOR, template_size=cfg.TEST.TEMPLATE_SIZE,
        search_factor=cfg.TEST.SEARCH_FACTOR, search_size=cfg.TEST.SEARCH_SIZE,
        update_interval=25, ce_keep_rate=None, scan_chunk=128)

    rng = np.random.default_rng(0)
    H, W = 512, 640
    img_v = jnp.asarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    img_i = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    box = jnp.asarray([280.0, 220.0, 80.0, 60.0], jnp.float32)

    st = jax.jit(tracker._init_state)(variables, img_v, img_i, box)
    sv0, si0, _ = jax.jit(
        lambda v, i, b: __import__("multi_modal_tracking_tpu.tracking.tracker",
                                   fromlist=["_prep_rgbt"])._prep_rgbt(
            v, i, b, cfg.TEST.SEARCH_FACTOR, cfg.TEST.SEARCH_SIZE))(img_v, img_i, box)
    s_vi0 = jnp.concatenate([sv0, si0], axis=0)

    def timed_scan(name, body, init_x, extra_flops=None):
        """body: x -> y with y feeding the next x (same pytree structure)."""
        def scan_fn(x0):
            def step(x, _):
                y = body(x)
                return y, ()
            y, _ = jax.lax.scan(step, x0, None, length=K)
            return y
        fn = jax.jit(scan_fn)
        out = fn(init_x)                       # compile + warm
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        out = fn(init_x)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / K
        flops = None
        if COST:
            try:
                one = jax.jit(body).lower(init_x).compile().cost_analysis()
                if isinstance(one, list):
                    one = one[0] if one else {}
                flops = float((one or {}).get("flops", float("nan")))
            except Exception:
                pass
        tf = (flops / dt / 1e12) if flops and np.isfinite(flops) else float("nan")
        print(f"{name:28s} {dt*1e3:8.3f} ms/iter   "
              f"{(flops or float('nan'))/1e9:8.2f} GFLOP   {tf:6.1f} TFLOP/s")
        return dt

    # ---- full cached step (box feeds next crop: natural chain) ----
    def full_body(carry):
        st_, _ = carry
        new_st, bx = tracker._step((H, W), variables, st_, img_v, img_i)
        return (new_st, bx)
    t_full = timed_scan("full cached step", full_body, (st, box)) \
        if "full" in STAGES else float("nan")

    # ---- prep only ----
    from multi_modal_tracking_tpu.tracking.tracker import _prep_rgbt
    def prep_body(b):
        sv, si, rf = _prep_rgbt(img_v, img_i, b, cfg.TEST.SEARCH_FACTOR,
                                cfg.TEST.SEARCH_SIZE)
        return b + sv.mean().astype(b.dtype) * 1e-9 + si.mean().astype(b.dtype) * 1e-9 + rf * 0
    t_prep = timed_scan("prep (crop+JET+norm x2)", prep_body, box) \
        if "prep" in STAGES else float("nan")

    # ---- backbone search-only forward ----
    def bb_body(x):
        out = model.apply(variables, st.cache, x,
                          method=type(model).forward_track)
        return x + out["pred_boxes"].mean().astype(x.dtype) * 1e-9
    t_track_fwd = timed_scan("forward_track (bb+fus+head)", bb_body, s_vi0) \
        if "track" in STAGES else float("nan")

    def bb_only(mdl, cache, s_vi):
        return mdl.backbone.forward_search(cache, s_vi, None, True)
    s_feat = jax.jit(lambda: model.apply(variables, st.cache, s_vi0, method=bb_only))()
    def bbo_body(x):
        s_out = model.apply(variables, st.cache, x, method=bb_only)
        return x + s_out.mean().astype(x.dtype) * 1e-9
    t_bb = timed_scan("backbone search-only", bbo_body, s_vi0) \
        if "bb" in STAGES else float("nan")

    # ---- fusion only ----
    B = s_feat.shape[0] // 2
    def fus_only(mdl, s_v, s_i):
        return mdl.fusion_vi(s_v, s_i, True)
    fused0 = jax.jit(lambda: model.apply(variables, s_feat[:B], s_feat[B:],
                                         method=fus_only))()
    def fus_body(x):
        f = model.apply(variables, x[:B], x[B:], method=fus_only)
        return x + f.mean().astype(x.dtype) * 1e-9
    t_fus = timed_scan("fusion (6-layer deform enc)", fus_body, s_feat) \
        if "fus" in STAGES else float("nan")

    # ---- head only ----
    def head_only(mdl, fused):
        return mdl.box_head(fused, train=False)
    def head_body(x):
        bx = model.apply(variables, x, method=head_only)
        return x + bx.mean().astype(x.dtype) * 1e-9
    t_head = timed_scan("corner head", head_body, fused0) \
        if "head" in STAGES else float("nan")

    print(f"\nsum(prep+bb+fus+head) = {(t_prep+t_bb+t_fus+t_head)*1e3:.3f} ms "
          f"vs forward_track {t_track_fwd*1e3:.3f} + prep {t_prep*1e3:.3f} "
          f"vs full step {t_full*1e3:.3f} ms")


if __name__ == "__main__":
    main()
