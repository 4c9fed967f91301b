import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from multi_modal_tracking_tpu.config import get_default_config
from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
from multi_modal_tracking_tpu.tracking.tracker import RGBTTrackerJit, _put

cfg = get_default_config("asymmetric_shared_ce")
model = build_mixformer_rgbt(cfg, dtype=jnp.bfloat16)
t = jnp.zeros((2, 128, 128, 3), jnp.float32)
s = jnp.zeros((2, 288, 288, 3), jnp.float32)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
tracker = RGBTTrackerJit(model=model, variables=variables,
                         template_factor=cfg.TEST.TEMPLATE_FACTOR,
                         template_size=cfg.TEST.TEMPLATE_SIZE,
                         search_factor=cfg.TEST.SEARCH_FACTOR,
                         search_size=cfg.TEST.SEARCH_SIZE,
                         update_interval=25, ce_keep_rate=None)
N, H, W = 96, 512, 640
rng = np.random.default_rng(0)
fv = rng.integers(0, 255, (N, H, W, 3), dtype=np.uint8)
fi = rng.integers(0, 255, (N, H, W, 3), dtype=np.uint8)
tracker.initialize([fv[0], fi[0]], {"init_bbox": [280.0, 220.0, 80.0, 60.0]})
fn = tracker._track_jit[tracker._shape]

@jax.jit
def chunk_scan(variables, st, cvs, cis):
    def body(carry, xs):
        new_st, box = fn(variables, carry, xs[0], xs[1])
        return new_st, box
    return jax.lax.scan(body, st, (cvs, cis))

# upload BEFORE any fetch
t0 = time.perf_counter()
cv, ci = _put(fv), _put(fi)
jax.block_until_ready((cv, ci))
t_up0 = time.perf_counter() - t0
print(f"upload pre-fetch: {t_up0*1e3:.0f} ms for 2x{N} frames")

st0 = tracker._state
# compile scan
r = chunk_scan(tracker.variables, st0, cv, ci)
jax.block_until_ready(r)

# timed scan with FORCED completion via 4-float fetch of last box
for rep in range(3):
    t0 = time.perf_counter()
    st_f, boxes = chunk_scan(tracker.variables, st0, cv, ci)
    last = np.asarray(boxes[-1])     # D2H of 16 bytes forces completion
    dt = time.perf_counter() - t0
    print(f"scan chunk rep{rep}: {N/dt:.1f} FPS ({1e3*dt/N:.2f} ms/frame), last box {last}")

# per-frame dispatch with forced completion
st = st0
t0 = time.perf_counter()
for k in range(N):
    st, box = fn(tracker.variables, st, cv[k], ci[k])
_ = np.asarray(box)
dt = time.perf_counter() - t0
print(f"per-frame dispatch: {N/dt:.1f} FPS ({1e3*dt/N:.2f} ms/frame)")

# upload AFTER fetches
t0 = time.perf_counter()
cv2_, ci2_ = _put(fv), _put(fi)
jax.block_until_ready((cv2_, ci2_))
t_up1 = time.perf_counter() - t0
print(f"upload post-fetch: {t_up1*1e3:.0f} ms ({t_up1/t_up0:.1f}x slower)")

# does a second upload recover?
t0 = time.perf_counter()
cv3_, ci3_ = _put(fv), _put(fi)
jax.block_until_ready((cv3_, ci3_))
print(f"upload post-fetch 2: {(time.perf_counter()-t0)*1e3:.0f} ms")

# scan timing again after degradation (inputs already on device)
t0 = time.perf_counter()
st_f, boxes = chunk_scan(tracker.variables, st0, cv, ci)
_ = np.asarray(boxes[-1])
dt = time.perf_counter() - t0
print(f"scan chunk post-fetch: {N/dt:.1f} FPS ({1e3*dt/N:.2f} ms/frame)")
