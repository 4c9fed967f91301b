"""Ablation-timed decomposition of the flagship cached track step.

profile_stages.py's isolated-stage bodies close over the 9 MB template
cache, which inlines it as an HLO constant (the CLAUDE.md anti-pattern) and
inflates those numbers. Here every measurement is the SAME full cached step
(cache in the scan carry, box feeding the next crop) with one component
swapped out, so deltas against the baseline attribute time per component:

  base      flagship as benched (CE 3/6/9 @ config keep, 6 fusion layers)
  nofus     fusion encoder depth 0 (adjust convs remain)
  smallhead corner towers at 8 channels instead of 384 (conv cost ~0)
  ce_off    ce_keep_rate = 1.0 (no token pruning)
  depth6    backbone depth 12 -> 6 (per-block cost = delta / 6)
  fwdonly   forward_track alone on a fixed crop (model time, no glue)
  glue      the full step with the model swapped for a constant box
            (prep + decode + state/cache carry + cond'd set_online rebuild)

Each variant costs one remote scan compile (~2-4 min); full run ~15-25 min.
Run:  env PYTHONPATH=/root/repo:/root/.axon_site VARIANTS=base,nofus \
        python -u artifacts/profile_ablate.py
"""
import dataclasses
import os
import time

import numpy as np

K = int(os.environ.get("K", "256"))  # amortise the ~27 ms dispatch+fetch fixed cost
VARIANTS = os.environ.get(
    "VARIANTS", "base,nofus,smallhead,ce_off,depth6,fwdonly,glue").split(",")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.models.asymmetric_shared import (
        RGBTSpec, build_mixformer_rgbt, MixFormerRGBT)
    from multi_modal_tracking_tpu.tracking.tracker import (
        RGBTCachedTrackerJit, _map_box_back, _prep_rgbt)
    from multi_modal_tracking_tpu.ops.boxes import clip_box
    from multi_modal_tracking_tpu.utils.checkpoint import cast_floating

    cfg = get_default_config("asymmetric_shared_ce")
    base_spec = RGBTSpec.from_cfg(cfg)

    rng = np.random.default_rng(0)
    H, W = 512, 640
    img_v = jnp.asarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    img_i = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    box0 = jnp.asarray([280.0, 220.0, 80.0, 60.0], jnp.float32)

    def build(spec, ce_keep_rate=None):
        model = MixFormerRGBT(spec=spec, dtype=jnp.bfloat16)
        t = jnp.zeros((2, 128, 128, 3), jnp.float32)
        s = jnp.zeros((2, 288, 288, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
        variables = cast_floating(variables, jnp.bfloat16)
        tracker = RGBTCachedTrackerJit(
            model=model, variables=variables,
            template_factor=cfg.TEST.TEMPLATE_FACTOR,
            template_size=cfg.TEST.TEMPLATE_SIZE,
            search_factor=cfg.TEST.SEARCH_FACTOR,
            search_size=cfg.TEST.SEARCH_SIZE,
            update_interval=25, ce_keep_rate=ce_keep_rate, scan_chunk=K)
        return tracker, variables

    def timed(tracker, variables):
        st0 = jax.jit(tracker._init_state)(variables, img_v, img_i, box0)

        def scan_fn(variables, st0, box):
            def body(carry, _):
                st, _ = carry
                new_st, bx = tracker._step((H, W), variables, st, img_v, img_i)
                return (new_st, bx), ()
            (st, bx), _ = jax.lax.scan(body, (st0, box), None, length=K)
            return bx
        fn = jax.jit(scan_fn)
        out = fn(variables, st0, box0)
        np.asarray(out)                            # compile + warm
        draws = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(variables, st0, box0)
            np.asarray(out)
            draws.append((time.perf_counter() - t0) / K)
        return min(draws)

    def timed_fwdonly(tracker, variables):
        """forward_track alone: fixed search crop, cache passed as argument
        (NOT closed over — a closed-over cache inlines ~9 MB into the HLO)."""
        st0 = jax.jit(tracker._init_state)(variables, img_v, img_i, box0)
        s0 = jnp.zeros((2, tracker.search_size, tracker.search_size, 3),
                       jnp.float32)

        def scan_fn(variables, cache, s0):
            def body(s, _):
                out = tracker.model.apply(
                    variables, cache, s,
                    method=type(tracker.model).forward_track,
                    ce_keep_rate=tracker.ce_keep_rate)
                pred = out["pred_boxes"].reshape(-1, 4).mean(axis=0)
                return s + pred.mean() * 1e-9, ()
            s, _ = jax.lax.scan(body, s0, None, length=K)
            return s
        fn = jax.jit(scan_fn)
        out = fn(variables, st0.cache, s0)
        np.asarray(out)
        draws = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(variables, st0.cache, s0)
            np.asarray(out)
            draws.append((time.perf_counter() - t0) / K)
        return min(draws)

    def timed_glue(tracker, variables):
        """The full step with the model forward swapped for a constant box:
        prep + decode + state/cache scan carry + the cond'd set_online
        rebuild every update_interval frames."""
        st0 = jax.jit(tracker._init_state)(variables, img_v, img_i, box0)
        const_box = jnp.asarray([0.45, 0.5, 0.18, 0.2], jnp.float32)

        def scan_fn(variables, st0, box):
            def body(carry, _):
                st, _ = carry
                frame_id = st.frame_id + 1
                sv, si, rf = _prep_rgbt(img_v, img_i, st.state,
                                        tracker.search_factor,
                                        tracker.search_size)
                pred = const_box + (sv.mean() + si.mean()).astype(
                    jnp.float32) * 1e-12
                pred = pred * (tracker.search_size / rf)
                new_state = clip_box(
                    _map_box_back(pred, st.state, tracker.search_size, rf),
                    H, W, margin=10)
                new_st = st.replace(state=new_state, frame_id=frame_id)
                do_update = (frame_id % tracker.update_interval) == 0
                cache = jax.lax.cond(
                    do_update,
                    lambda: tracker._rebuild_cache(variables, new_st,
                                                   img_v, img_i),
                    lambda: new_st.cache)
                return (new_st.replace(cache=cache), new_state), ()
            (st, bx), _ = jax.lax.scan(body, (st0, box), None, length=K)
            return bx
        fn = jax.jit(scan_fn)
        out = fn(variables, st0, box0)
        np.asarray(out)
        draws = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(variables, st0, box0)
            np.asarray(out)
            draws.append((time.perf_counter() - t0) / K)
        return min(draws)

    results = {}
    for name in VARIANTS:
        ce = None
        spec = base_spec
        if name == "nofus":
            spec = dataclasses.replace(base_spec, fusion_layers=0)
        elif name == "smallhead":
            spec = dataclasses.replace(base_spec, head_dim=8)
        elif name == "ce_off":
            ce = 1.0
        elif name == "depth6":
            spec = dataclasses.replace(base_spec, depth=6,
                                       ce_loc=(3,), ce_keep_ratio=(0.7,))
        tracker, variables = build(spec, ce_keep_rate=ce)
        if name == "fwdonly":
            dt = timed_fwdonly(tracker, variables)
        elif name == "glue":
            dt = timed_glue(tracker, variables)
        else:
            dt = timed(tracker, variables)
        results[name] = dt
        base = results.get("base")
        delta = f"   delta vs base {1e3*(dt-base):+7.3f} ms" if base and name != "base" else ""
        print(f"{name:10s} {dt*1e3:8.3f} ms/step{delta}", flush=True)


if __name__ == "__main__":
    main()
