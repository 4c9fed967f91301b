"""Model profiling: parameters, FLOPs, per-frame latency.

Parity target: tracking/profile_model.py in the reference (thop-based FLOP
counting with hand-written MAM attention counters :43-80, plus wall-clock
speed timing; driver tracking/profile_mixformer.sh). TPU-native: FLOPs come
from XLA's own cost analysis of the jitted forward
(jit(...).lower().compile().cost_analysis()), so attention/conv/fusion are
all counted by the compiler instead of per-module hand counters.

Usage:
  python tracking/profile_model.py --script asymmetric_shared_ce
  python tracking/profile_model.py --script mixformer_vit --display_name MixViT-B
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(script: str, search_size=None, template_size=None, repeats: int = 50):
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.eval.evaltracker import is_rgbt_script
    from multi_modal_tracking_tpu.models.build import build_model

    cfg = get_default_config(script)
    if search_size:
        cfg.DATA.SEARCH.SIZE = search_size
    if template_size:
        cfg.DATA.TEMPLATE.SIZE = template_size
    model = build_model(script, cfg, dtype=jnp.bfloat16)

    lead = 2 if is_rgbt_script(script) else 1
    ts, ss = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
    t = jnp.zeros((lead, ts, ts, 3), jnp.float32)
    s = jnp.zeros((lead, ss, ss, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))

    fwd = jax.jit(lambda v, a, b, c: model.apply(v, a, b, c)["pred_boxes"])
    lowered = fwd.lower(variables, t, t, s)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = cost.get("flops", float("nan"))
    hbm_bytes = cost.get("bytes accessed", float("nan"))

    # `repeats` forwards chained inside ONE scan dispatch (each iteration's
    # input depends on the previous output, so the device executes them
    # back-to-back), ended by a real 4-byte fetch — np.asarray, because on
    # proxied transports a bare block_until_ready can return before the
    # computation finishes and report impossible sub-FLOP latencies.
    @jax.jit
    def chain(variables, c0):
        def body(c, _):
            out = model.apply(variables, t, t, s + c * 1e-9)["pred_boxes"]
            return out.astype(jnp.float32).mean(), None
        return jax.lax.scan(body, c0, None, length=repeats)[0]

    np.asarray(chain(variables, jnp.float32(0)))        # compile + warm
    t0 = time.perf_counter()
    np.asarray(chain(variables, jnp.float32(0)))
    lat_ms = (time.perf_counter() - t0) / repeats * 1e3

    print(f"script:           {script}")
    print(f"search/template:  {ss} / {ts}")
    print(f"params:           {n_params / 1e6:.2f} M")
    print(f"forward FLOPs:    {flops / 1e9:.2f} G (XLA cost analysis)")
    print(f"HBM bytes/frame:  {hbm_bytes / 1e6:.2f} MB")
    print(f"device latency:   {lat_ms:.3f} ms/frame ({1e3 / lat_ms:.1f} FPS)")
    return {"params": n_params, "flops": flops, "latency_ms": lat_ms}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--script", default="asymmetric_shared_ce")
    ap.add_argument("--search_size", type=int, default=None)
    ap.add_argument("--template_size", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=50)
    args = ap.parse_args()
    profile(args.script, args.search_size, args.template_size, args.repeats)


if __name__ == "__main__":
    main()
