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

def timed(tag, f):
    t0 = time.perf_counter()
    r = f()
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt*1e3:.0f} ms")
    return r

# warmup compile via one chunk call + block
timed("warmup(compile) block", lambda: jax.block_until_ready(
    tracker.track_chunk(fv[:32], fi[:32], fetch=False)))
tracker.initialize([fv[0], fi[0]], {"init_bbox": [280.0, 220.0, 80.0, 60.0]})
dv, di = _put(fv), _put(fi)
jax.block_until_ready((dv, di))
timed("flip fetch 4B", lambda: np.asarray(tracker._state.frame_id))
# (a) numpy input chunks
timed("A np-input chunks + 16B fetch", lambda: np.asarray(
    tracker.track_chunk(fv, fi, fetch=False)[-1]))
tracker.initialize([fv[0], fi[0]], {"init_bbox": [280.0, 220.0, 80.0, 60.0]})
# (b) device-array input chunks
timed("B dev-input chunks + 16B fetch", lambda: np.asarray(
    tracker.track_chunk(dv, di, fetch=False)[-1]))
# (c) again to check one-time costs
tracker.initialize([fv[0], fi[0]], {"init_bbox": [280.0, 220.0, 80.0, 60.0]})
timed("C dev-input chunks again", lambda: np.asarray(
    tracker.track_chunk(dv, di, fetch=False)[-1]))
