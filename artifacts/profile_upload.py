"""Bound the batched-eval upload leg (VERDICT r2 #6).

Measures H2D bandwidth on the axon tunnel across payload sizes and process
states, then compares the batched bench leg (~503 MB: 48x8 frames RGB uint8
+ single-channel TIR) against the implied floor.

Transport facts this quantifies (CLAUDE.md):
  * uploads are pristine-fast only BEFORE the first D2H fetch of the
    process, ~20x slower after — so bench.py uploads everything first;
  * upload/compute overlap is impossible (no second stream on the proxy);
  * bandwidth fluctuates heavily between draws — min-of-N is the estimator.

Run on the real chip: env PYTHONPATH=/root/repo:/root/.axon_site \
    python artifacts/profile_upload.py
"""
import json
import time

import numpy as np


def main():
    import jax

    rng = np.random.default_rng(0)
    results = {}

    def put_timed(arr, n=3):
        draws = []
        for _ in range(n):
            x = arr.copy()          # distinct host buffer per draw
            t0 = time.perf_counter()
            d = jax.device_put(x)
            jax.block_until_ready(d)
            draws.append(time.perf_counter() - t0)
            del d
        gb = arr.nbytes / 1e9
        return gb, min(draws), draws

    # pristine-state sweep (BEFORE any fetch)
    for mb in (8, 64, 256, 503):
        arr = rng.integers(0, 255, (mb * 1_000_000,), dtype=np.uint8)
        gb, best, draws = put_timed(arr)
        results[f"pristine_{mb}MB_gbps"] = round(gb / best, 3)
        print(f"pristine {mb:4d} MB: {gb/best:6.2f} GB/s "
              f"(draws {[f'{gb/d:.2f}' for d in draws]})", flush=True)

    # the exact batched bench payload, pristine
    bfv = rng.integers(0, 255, (48, 8, 512, 640, 3), dtype=np.uint8)
    bfi = rng.integers(0, 255, (48, 8, 512, 640), dtype=np.uint8)
    gb_v, t_v, _ = put_timed(bfv)
    gb_i, t_i, _ = put_timed(bfi)
    total_gb, total_t = gb_v + gb_i, t_v + t_i
    results["bench_payload_gb"] = round(total_gb, 3)
    results["bench_payload_s_pristine"] = round(total_t, 3)
    print(f"bench payload {total_gb:.2f} GB pristine: {total_t*1e3:.0f} ms "
          f"({total_gb/total_t:.2f} GB/s)", flush=True)

    # flip the proxy with one D2H fetch, then re-measure
    np.asarray(jax.device_put(np.zeros(16, np.float32)))
    arr = rng.integers(0, 255, (256_000_000,), dtype=np.uint8)
    gb, best, draws = put_timed(arr)
    results["post_fetch_256MB_gbps"] = round(gb / best, 3)
    results["degradation_x"] = round(results["pristine_256MB_gbps"] / (gb / best), 1)
    print(f"post-fetch 256 MB: {gb/best:6.2f} GB/s "
          f"({results['degradation_x']}x slower than pristine)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
