"""Upload/compute PIPELINING experiment (VERDICT r3 next-round #2).

The r3 headline splits 384-frame single-stream tracking into upload (348 ms
at the ~1.4 GB/s transport floor) + scan (738 ms) run strictly serially,
because post-FETCH uploads collapse 33x (artifacts/profile_upload_r3.json)
and so classic double-buffering (fetch box -> pre-crop -> upload) is
impossible.  But an untested third option exists: dispatch chunk k's scan
ASYNCHRONOUSLY (no D2H fetch -> proxy stays pristine) and upload chunk k+1
while the device computes.  Trajectories are bit-identical — same inputs,
same programs, same order — only the host timeline changes.  This is exactly
the dispatch pattern the production eval path already uses
(eval/running.py run_sequence: dispatch every chunk async, fetch once at
sequence end); bench.py's monolithic upload-then-scan methodology is the
only place the overlap is forfeited.

Modes (one per process — the first D2H fetch permanently degrades uploads,
so serial/pipelined must not share a process):
  serial     — upload all 8x48-frame chunks, then dispatch all scans, then
               one fetch (the r3 bench methodology at chunk granularity).
  pipelined  — per chunk: upload, dispatch async; one fetch at the end.

Run on the real chip (nothing else using the tunnel):
  env PYTHONPATH=/root/repo:/root/.axon_site python artifacts/profile_overlap.py serial
  env PYTHONPATH=/root/repo:/root/.axon_site python artifacts/profile_overlap.py pipelined
"""
import json
import sys
import time

import numpy as np

FRAME_H, FRAME_W = 512, 640
import os
N_FRAMES = 384
CHUNK = int(os.environ.get("OVERLAP_CHUNK", "48"))


def main(mode):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit, _put
    from multi_modal_tracking_tpu.utils.checkpoint import cast_floating

    cfg = get_parameters("asymmetric_shared_ce",
                         "attention_lasher_newfusion_2layer").cfg
    model = build_mixformer_rgbt(cfg, dtype=jnp.bfloat16)
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
        update_interval=25, ce_keep_rate=None, scan_chunk=CHUNK)

    rng = np.random.default_rng(0)
    fv = rng.integers(0, 255, (N_FRAMES, FRAME_H, FRAME_W, 3), dtype=np.uint8)
    fi = rng.integers(0, 255, (N_FRAMES, FRAME_H, FRAME_W), dtype=np.uint8)
    init_info = {"init_bbox": [280.0, 220.0, 80.0, 60.0]}
    tracker.initialize([fv[0], fi[0]], init_info)

    # ---- warm-up: compile + one executed block, NO fetch (stay pristine).
    # block_until_ready can return early on this proxy; pad with a sleep so
    # the warm block cannot bleed into the timed region.
    wv, wi = _put(fv[:CHUNK].copy()), _put(fi[:CHUNK].copy())
    warm = tracker.track_chunk(wv, wi, fetch=False)
    jax.block_until_ready(warm)
    time.sleep(5.0)
    if mode == "serial_fetchwarm":
        tw = time.perf_counter()
        np.asarray(warm[-1])          # flip the proxy like bench.py does
        print(f"warm fetch: {time.perf_counter()-tw:.3f}s", file=sys.stderr)
    tracker.initialize([fv[0], fi[0]], init_info)

    chunks = [(fv[k:k + CHUNK], fi[k:k + CHUNK])
              for k in range(0, N_FRAMES, CHUNK)]
    upload_times, pending = [], []

    t0 = time.perf_counter()
    if mode in ("serial", "serial_fetchwarm"):
        device_chunks = []
        for cv, ci in chunks:
            tu = time.perf_counter()
            dv, di = _put(cv), _put(ci)
            jax.block_until_ready([dv, di])
            upload_times.append(time.perf_counter() - tu)
            device_chunks.append((dv, di))
        for dv, di in device_chunks:
            pending.append(tracker.track_chunk(dv, di, fetch=False))
    elif mode == "pipelined":
        for cv, ci in chunks:
            tu = time.perf_counter()
            dv, di = _put(cv), _put(ci)
            jax.block_until_ready([dv, di])
            upload_times.append(time.perf_counter() - tu)
            pending.append(tracker.track_chunk(dv, di, fetch=False))
        t_up_done = time.perf_counter()
    else:
        raise SystemExit(f"unknown mode {mode}")

    t_dispatch_done = time.perf_counter()
    fetch_times = []
    fetched = []
    for p_ in pending:
        tf = time.perf_counter()
        fetched.append(np.asarray(p_))
        fetch_times.append(time.perf_counter() - tf)
    last = fetched[-1][-1]
    t_total = time.perf_counter() - t0
    print(f"dispatch phase: {t_dispatch_done - t0:.3f}s, "
          f"per-chunk fetch waits: {[round(f,3) for f in fetch_times]}",
          file=sys.stderr)

    boxes = np.concatenate(fetched, axis=0)
    assert np.isfinite(boxes).all() and boxes.shape[0] == N_FRAMES
    assert np.allclose(boxes[-1], last)

    out = {
        "mode": mode,
        "total_s": round(t_total, 4),
        "fps": round(N_FRAMES / t_total, 2),
        "upload_total_s": round(sum(upload_times), 4),
        "upload_times_ms": [round(u * 1e3, 1) for u in upload_times],
        "boxes_checksum": float(np.abs(boxes).sum()),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pipelined")
