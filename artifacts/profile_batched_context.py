"""Why does bench.py's batched leg outrun a standalone batched scan?

bench.py (single-stream scans first, then the batched leg) records ~644
f/s for B=16; artifacts/profile_batched_scale.py standalone measures ~422
f/s for the identical compiled program. This isolates the context:

  WARMREP=0  standalone batched leg, each timed draw printed
  WARMREP=1  same, but a single-stream RGBTCachedTrackerJit 384-frame scan
             (bench's phase-3 workload) runs untimed before the batched
             draws

Run: env PYTHONPATH=/root/repo:/root/.axon_site WARMREP=1 \
       python -u artifacts/profile_batched_context.py
"""
import os
import time

import numpy as np

B, T = 16, 24
FRAME_H, FRAME_W = 512, 640
WARMREP = int(os.environ.get("WARMREP", "0"))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit, _put
    from multi_modal_tracking_tpu.tracking.batched import BatchedRGBTCachedTrackerJit
    from multi_modal_tracking_tpu.utils.checkpoint import cast_floating

    cfg = get_default_config("asymmetric_shared_ce")
    model = build_mixformer_rgbt(cfg, dtype=jnp.bfloat16)
    t = jnp.zeros((2, 128, 128, 3), jnp.float32)
    s = jnp.zeros((2, 288, 288, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    variables = cast_floating(variables, jnp.bfloat16)

    kw = dict(model=model, variables=variables,
              template_factor=cfg.TEST.TEMPLATE_FACTOR,
              template_size=cfg.TEST.TEMPLATE_SIZE,
              search_factor=cfg.TEST.SEARCH_FACTOR,
              search_size=cfg.TEST.SEARCH_SIZE,
              update_interval=25, ce_keep_rate=None)
    btracker = BatchedRGBTCachedTrackerJit(scan_chunk=T, **kw)
    rng = np.random.default_rng(0)
    bfv = rng.integers(0, 255, (T, B, FRAME_H, FRAME_W, 3), dtype=np.uint8)
    bfi = rng.integers(0, 255, (T, B, FRAME_H, FRAME_W), dtype=np.uint8)
    boxes0 = np.tile([280.0, 220.0, 80.0, 60.0], (B, 1)).astype(np.float32)

    # uploads first (before any fetch), bench-style
    bdv = btracker._put_batch(bfv, 1)
    bdi = btracker._put_batch(bfi, 1)
    if WARMREP:
        tracker = RGBTCachedTrackerJit(scan_chunk=384, **kw)
        fv = rng.integers(0, 255, (384, FRAME_H, FRAME_W, 3), dtype=np.uint8)
        fi = rng.integers(0, 255, (384, FRAME_H, FRAME_W), dtype=np.uint8)
        dv, di = _put(fv), _put(fi)
        tracker.initialize([fv[0], fi[0]], {"init_bbox": [280.0, 220.0, 80.0, 60.0]})
    jax.block_until_ready([bdv, bdi])

    # warm (compile) + first fetch
    btracker.initialize(bfv[0], bfi[0], boxes0)
    np.asarray(btracker.track_block(bdv, bdi, fetch=False)[-1])
    if WARMREP:
        np.asarray(tracker.track_chunk(dv, di, fetch=False)[-1])
        # bench's phase 3: three timed single-stream scans before batched
        for k in range(3):
            tracker.initialize([fv[0], fi[0]], {"init_bbox": [280.0, 220.0, 80.0, 60.0]})
            t0 = time.perf_counter()
            np.asarray(tracker.track_chunk(dv, di, fetch=False)[-1])
            print(f"single scan draw {k}: {(time.perf_counter()-t0)*1e3:.0f} ms",
                  flush=True)

    for k in range(4):
        btracker.initialize(bfv[0], bfi[0], boxes0)
        jax.block_until_ready(btracker._state)  # drain async init execution
        t0 = time.perf_counter()
        pend = btracker.track_block(bdv, bdi, fetch=False)
        np.asarray(pend[-1])
        dt = time.perf_counter() - t0
        print(f"batched draw {k}: {dt*1e3:.1f} ms ({B*T/dt:.1f} f/s)", flush=True)


if __name__ == "__main__":
    main()
