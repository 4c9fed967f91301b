"""Micro-ablation of the per-frame prep path (crop+JET+normalise, measured
~0.47 ms = 21% of the cached track step).

Variants (all K-chained scans with the box as carry, like the real loop):
  full       _prep_rgbt as shipped
  nojet      crop + normalise both modalities (JET replaced by identity)
  croponly   crop_resize only (no post-crop work at all)
  matonly    resample-matrix construction only (no image matmuls)
  high       crop einsums at precision='high' (3-pass) instead of 'highest'
  default    crop einsums at default precision (1-pass bf16)

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python -u artifacts/profile_prep.py
"""
import os
import time
from functools import partial

import numpy as np

K = int(os.environ.get("K", "2048"))  # must amortise the ~27 ms dispatch+fetch fixed cost


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from multi_modal_tracking_tpu.ops import crop as crop_ops
    from multi_modal_tracking_tpu.ops.crop import (_resample_matrix,
                                                   crop_resize,
                                                   normalize_imagenet)
    from multi_modal_tracking_tpu.ops.colormap import apply_jet
    from multi_modal_tracking_tpu.tracking.tracker import _prep_rgbt

    rng = np.random.default_rng(0)
    H, W = 512, 640
    img_v = jnp.asarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    img_i = jnp.asarray(rng.integers(0, 255, (H, W), dtype=np.uint8))
    box0 = jnp.asarray([280.0, 220.0, 80.0, 60.0], jnp.float32)
    FACTOR, OUT = 5.0, 288

    def timed(name, body):
        def scan_fn(b0):
            def step(b, _):
                return body(b), ()
            b, _ = jax.lax.scan(step, b0, None, length=K)
            return b
        fn = jax.jit(scan_fn)
        out = fn(box0); np.asarray(out)
        draws = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(box0); np.asarray(out)
            draws.append((time.perf_counter() - t0) / K)
        print(f"{name:10s} {min(draws)*1e6:8.1f} us/iter", flush=True)

    def chain(b, *vals):
        out = b
        for v in vals:
            out = out + v.mean().astype(b.dtype) * 1e-9
        return out

    def full(b):
        sv, si, rf = _prep_rgbt(img_v, img_i, b, FACTOR, OUT)
        return chain(b, sv, si) + rf * 0

    def nojet(b):
        ir = img_i[..., None]
        stacked = jnp.concatenate([img_v.astype(jnp.float32),
                                   ir.astype(jnp.float32)], axis=-1)
        crop, rf = crop_resize(stacked, b, FACTOR, OUT)
        sv = normalize_imagenet(crop[..., :3])
        si = normalize_imagenet(jnp.repeat(crop[..., 3:], 3, axis=-1))
        return chain(b, sv, si) + rf * 0

    def croponly(b):
        ir = img_i[..., None]
        stacked = jnp.concatenate([img_v.astype(jnp.float32),
                                   ir.astype(jnp.float32)], axis=-1)
        crop, rf = crop_resize(stacked, b, FACTOR, OUT)
        return chain(b, crop) + rf * 0

    def matonly(b):
        x, y, w, h = b[0], b[1], b[2], b[3]
        crop_sz = jnp.maximum(jnp.ceil(jnp.sqrt(w * h) * FACTOR), 1.0)
        x1 = jnp.round(x + 0.5 * w - crop_sz * 0.5).astype(jnp.int32)
        y1 = jnp.round(y + 0.5 * h - crop_sz * 0.5).astype(jnp.int32)
        ci = crop_sz.astype(jnp.int32)
        A_y = _resample_matrix(H, OUT, y1, ci)
        A_x = _resample_matrix(W, OUT, x1, ci)
        return chain(b, A_y, A_x)

    def make_prec(precision):
        def body(b):
            x, y, w, h = b[0], b[1], b[2], b[3]
            crop_sz = jnp.maximum(jnp.ceil(jnp.sqrt(w * h) * FACTOR), 1.0)
            x1 = jnp.round(x + 0.5 * w - crop_sz * 0.5).astype(jnp.int32)
            y1 = jnp.round(y + 0.5 * h - crop_sz * 0.5).astype(jnp.int32)
            ci = crop_sz.astype(jnp.int32)
            A_y = _resample_matrix(H, OUT, y1, ci)
            A_x = _resample_matrix(W, OUT, x1, ci)
            ir = img_i[..., None]
            imf = jnp.concatenate([img_v.astype(jnp.float32),
                                   ir.astype(jnp.float32)], axis=-1)
            tmp = jnp.einsum("oh,hwc->owc", A_y, imf, precision=precision)
            out = jnp.einsum("pw,owc->opc", A_x, tmp, precision=precision)
            return chain(b, out)
        return body

    which = os.environ.get(
        "VARIANTS", "full,nojet,croponly,matonly,high,default").split(",")
    table = {"full": full, "nojet": nojet, "croponly": croponly,
             "matonly": matonly, "high": make_prec("high"),
             "default": make_prec(None)}
    for name in which:
        timed(name, table[name])


if __name__ == "__main__":
    main()
