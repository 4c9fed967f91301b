import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    rng = np.random.default_rng(0)

    def timed(name, m, k, K, dtype=jnp.bfloat16, prec=None):
        a = jnp.asarray(rng.standard_normal((m, k)), dtype)
        b = jnp.asarray(rng.standard_normal((k, k)), dtype)
        def scan_fn(x):
            def body(x, _):
                return jax.lax.dot(x, b, precision=prec), ()
            x, _ = jax.lax.scan(body, x, None, length=K)
            return x
        fn = jax.jit(scan_fn)
        out = fn(a); np.asarray(out)
        draws = []
        for _ in range(3):
            t0 = time.perf_counter(); out = fn(a); np.asarray(out)
            draws.append((time.perf_counter()-t0)/K)
        d = min(draws)
        fl = 2*m*k*k
        print(f"{name:28s} {d*1e6:9.1f} us/iter  {fl/d/1e12:6.1f} TFLOP/s", flush=True)

    timed("4096x4096 @ 4096x4096", 4096, 4096, 64)
    timed("8192x8192 @ 8192x8192", 8192, 8192, 16)
    timed("2048x2048", 2048, 2048, 256)
    timed("f32 2048x2048", 2048, 2048, 128, jnp.float32)
    # train-like rectangles (the model-shape ceiling)
    def timed_mk(name, m, k, n, K, dtype=jnp.bfloat16):
        a = jnp.asarray(rng.standard_normal((m, k)), dtype)
        b = jnp.asarray(rng.standard_normal((k, n)), dtype)
        c = jnp.asarray(rng.standard_normal((n, k)), dtype)
        def scan_fn(x):
            def body(x, _):
                return jax.lax.dot(jax.lax.dot(x, b), c), ()
            x, _ = jax.lax.scan(body, x, None, length=K)
            return x
        fn = jax.jit(scan_fn)
        out = fn(a); np.asarray(out)
        draws = []
        for _ in range(3):
            t0 = time.perf_counter(); out = fn(a); np.asarray(out)
            draws.append((time.perf_counter()-t0)/K)
        d = min(draws)
        fl = 2*m*k*n*2
        print(f"{name:28s} {d*1e6:9.1f} us/iter  {fl/d/1e12:6.1f} TFLOP/s", flush=True)
    timed_mk("(5184,768)@(768,3072)x2", 5184, 768, 3072, 256)
    timed_mk("(648,768)@(768,768)x2", 648, 768, 768, 1024)

main()

# Measured 2026-08-18 (axon v5e tunnel, chained scans, K amortised):
#   4096x4096 @ 4096x4096      9779 us   14.1 TFLOP/s
#   8192x8192 @ 8192x8192    194998 us    5.6 TFLOP/s  (pathological)
#   2048x2048                   736 us   23.4 TFLOP/s
#   f32 2048x2048              2409 us    7.1 TFLOP/s  (6-pass ratio consistent)
#   (5184,768)@(768,3072)       855 us   57.2 TFLOP/s  <- train-like, ceiling
#   (648,768)@(768,768)          31 us   50.0 TFLOP/s  <- eval B=1 shape
# The observed ceiling at model shapes is ~57-62 TFLOP/s, NOT the 197 spec
# peak; bigger square matmuls run SLOWER per FLOP. The flagship forward
# (62 TFLOP/s) and train step (62 TFLOP/s) already sit at this ceiling.
