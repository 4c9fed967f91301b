"""Batch-size scaling A/B for the batched lockstep eval leg.

bench.py's batched leg runs B=16 sequences in lockstep through the
cached-template fast path. Per-frame FLOPs are constant in B, but the
weight-HBM traffic per frame falls ~1/B (one weight read per lockstep
step serves B frames), so if the scan is at all weight-bound, larger B
should raise frames/s/chip until compute saturates.

Method: total frames held at 384 per draw (B*T constant) so upload size
and compute totals match across variants; each variant is its own
compiled scan. Per CLAUDE.md: all uploads first (min-of-2 draws), one
warm fetch, then timed scans ending in a real np.asarray fetch.

Run:  env PYTHONPATH=/root/repo:/root/.axon_site BATCHES=16,32,64 \
        python -u artifacts/profile_batched_scale.py
"""
import os
import time

import numpy as np

BATCHES = [int(b) for b in os.environ.get("BATCHES", "8,16,32,64").split(",")]
TOTAL_FRAMES = int(os.environ.get("TOTAL_FRAMES", "384"))
FRAME_H, FRAME_W = 512, 640


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
    from multi_modal_tracking_tpu.tracking.batched import BatchedRGBTCachedTrackerJit
    from multi_modal_tracking_tpu.utils.checkpoint import cast_floating

    # the reference's shipped recipe, same parameter path as bench.py
    cfg = get_parameters("asymmetric_shared_ce",
                         "attention_lasher_newfusion_2layer").cfg
    model = build_mixformer_rgbt(cfg, dtype=jnp.bfloat16)
    t = jnp.zeros((2, 128, 128, 3), jnp.float32)
    s = jnp.zeros((2, 288, 288, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
    variables = cast_floating(variables, jnp.bfloat16)

    rng = np.random.default_rng(0)
    trackers, uploads = {}, {}
    # ---- phase 1: build trackers + upload every variant's clip first ----
    for b in BATCHES:
        t_steps = TOTAL_FRAMES // b
        tr = BatchedRGBTCachedTrackerJit(
            model=model, variables=variables,
            template_factor=cfg.TEST.TEMPLATE_FACTOR,
            template_size=cfg.TEST.TEMPLATE_SIZE,
            search_factor=cfg.TEST.SEARCH_FACTOR,
            search_size=cfg.TEST.SEARCH_SIZE,
            update_interval=25, ce_keep_rate=None, scan_chunk=t_steps)
        bfv = rng.integers(0, 255, (t_steps, b, FRAME_H, FRAME_W, 3), dtype=np.uint8)
        bfi = rng.integers(0, 255, (t_steps, b, FRAME_H, FRAME_W), dtype=np.uint8)
        t0 = time.perf_counter()
        dv = tr._put_batch(bfv, 1)
        di = tr._put_batch(bfi, 1)
        jax.block_until_ready([dv, di])
        up = time.perf_counter() - t0
        boxes0 = np.tile([280.0, 220.0, 80.0, 60.0], (b, 1)).astype(np.float32)
        trackers[b] = (tr, dv, di, bfv[0], bfi[0], boxes0, t_steps)
        uploads[b] = up
        print(f"B={b:3d}: uploaded {t_steps}x{b} frames in {up*1e3:.0f} ms", flush=True)

    # ---- phase 2: warm every variant (compile), first fetch flips proxy --
    for b in BATCHES:
        tr, dv, di, f0v, f0i, boxes0, t_steps = trackers[b]
        tr.initialize(f0v, f0i, boxes0)
        np.asarray(tr.track_block(dv, di, fetch=False)[-1])
        print(f"B={b:3d}: warm ok", flush=True)

    # ---- phase 3: timed scans (min of 3) --------------------------------
    print(f"\n{'B':>4} {'T':>4} {'scan ms':>8} {'f/s scan':>9} {'ms/frame':>9}")
    for b in BATCHES:
        tr, dv, di, f0v, f0i, boxes0, t_steps = trackers[b]
        times = []
        for _ in range(3):
            tr.initialize(f0v, f0i, boxes0)
            jax.block_until_ready(tr._state)   # init is async: a full
            # forward x B executes on device; timing before it drains
            # charges init to the scan (x B contamination)
            t0 = time.perf_counter()
            pend = tr.track_block(dv, di, fetch=False)
            np.asarray(pend[-1])
            times.append(time.perf_counter() - t0)
        ts = min(times)
        n = b * t_steps
        print(f"{b:>4} {t_steps:>4} {ts*1e3:>8.1f} {n/ts:>9.1f} {ts*1e3/n:>9.3f}",
              flush=True)


if __name__ == "__main__":
    main()
