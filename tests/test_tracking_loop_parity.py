"""Full per-frame tracking-loop parity against a reference-exact torch oracle.

Composes the already-pinned pieces — cv2-parity crop (processing_utils
sample_target), bit-exact JET colormap, converted flagship forward — into the
COMPLETE per-frame loop of the reference tracker
(lib/test/tracker/asymmetric_shared_ce.py:49-133):

    init: RGB gt box -> template crops (both modalities) -> preprocess
    track: search crop -> JET(TIR) -> normalise -> forward (CE, box mean)
           -> * search_size / resize_factor -> map_box_back -> clip(margin=10)
           -> online-template rebuild every update_interval frames

and asserts the box TRAJECTORY of the jitted RGBTTrackerJit (converted
weights) matches the torch loop over a synthetic sequence. This is the
end-to-end glue test: forward parity alone cannot catch loop-order bugs
(e.g. CE template-row pooling at test time, template update from the wrong
state, off-by-one update cadence).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from tests.test_flagship_convert import (  # noqa: E402
    _Flagship, CE_KEEP, CE_LOC, D_BB, DEPTH, HEAD_DIM, HEADS_BB, F_LAYERS,
    S_SZ, T_SZ)

from multi_modal_tracking_tpu.models.asymmetric_shared import (  # noqa: E402
    MixFormerRGBT, RGBTSpec)
from multi_modal_tracking_tpu.train.data.processing_utils import (  # noqa: E402
    sample_target)
from multi_modal_tracking_tpu.utils.torch_convert import (  # noqa: E402
    convert_state_dict)

H, W = 240, 320
N_FRAMES = 6
TEMPLATE_FACTOR, SEARCH_FACTOR = 2.0, 4.5
UPDATE_INTERVAL = 3

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _frames(seed=0):
    """Synthetic RGBT sequence: textured noise + a bright moving square."""
    rng = np.random.default_rng(seed)
    fv = rng.integers(0, 120, (N_FRAMES, H, W, 3), dtype=np.uint8)
    fi = rng.integers(0, 120, (N_FRAMES, H, W, 3), dtype=np.uint8)
    for t in range(N_FRAMES):
        x, y = 80 + 5 * t, 60 + 3 * t
        fv[t, y:y + 48, x:x + 48] = 230
        fi[t, y:y + 48, x:x + 48] = 200
        fi[t] = fi[t][..., :1].repeat(3, axis=-1)   # replicated-gray TIR
    return fv, fi, np.array([80.0, 60.0, 48.0, 48.0], np.float32)


def _preprocess(img_v, img_i):
    """Preprocessor_Multimodal (tracker_utils.py:36-48): JET on the TIR crop,
    /255, ImageNet normalise, NCHW."""
    jet = cv2.applyColorMap(np.ascontiguousarray(img_i), cv2.COLORMAP_JET)
    def norm(a):
        a = a.astype(np.float32) / 255.0
        a = (a - _MEAN) / _STD
        return torch.from_numpy(a).permute(2, 0, 1)[None]
    return [norm(img_v), norm(jet)]


def _clip_box(box, margin=10):
    """box_ops.clip_box:155-164."""
    x1, y1, w, h = box
    x2, y2 = x1 + w, y1 + h
    x1 = min(max(0, x1), W - margin)
    x2 = min(max(margin, x2), W)
    y1 = min(max(0, y1), H - margin)
    y2 = min(max(margin, y2), H)
    return [x1, y1, max(margin, x2 - x1), max(margin, y2 - y1)]


def _torch_trajectory(oracle, fv, fi, init_box):
    """The reference tracker loop verbatim (asymmetric_shared_ce.py:49-133):
    test-time forward with ce_template_mask=None (ALL-rows CE pooling)."""
    z_v, _, _ = sample_target(fv[0], init_box, TEMPLATE_FACTOR, T_SZ)
    z_i, _, _ = sample_target(fi[0], init_box, TEMPLATE_FACTOR, T_SZ)
    template = _preprocess(z_v, z_i)
    online = template
    state = [float(v) for v in init_box]
    boxes = []
    for t in range(1, N_FRAMES):
        x_v, rf, _ = sample_target(fv[t], state, SEARCH_FACTOR, S_SZ)
        x_i, _, _ = sample_target(fi[t], state, SEARCH_FACTOR, S_SZ)
        search = _preprocess(x_v, x_i)
        with torch.no_grad():
            pred = oracle(template, online, search).reshape(-1, 4).mean(0)
        cx, cy, w, h = (pred * S_SZ / rf).tolist()
        cx_prev = state[0] + 0.5 * state[2]
        cy_prev = state[1] + 0.5 * state[3]
        half = 0.5 * S_SZ / rf
        cx, cy = cx + cx_prev - half, cy + cy_prev - half
        state = _clip_box([cx - 0.5 * w, cy - 0.5 * h, w, h])
        if t % UPDATE_INTERVAL == 0:
            z_v, _, _ = sample_target(fv[t], state, TEMPLATE_FACTOR, T_SZ)
            z_i, _, _ = sample_target(fi[t], state, TEMPLATE_FACTOR, T_SZ)
            online = _preprocess(z_v, z_i)
        boxes.append(list(state))
    return np.asarray(boxes, np.float32)


@pytest.fixture(scope="module")
def flagship_pair():
    torch.manual_seed(0)
    oracle = _Flagship().eval()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.5)
    spec = RGBTSpec(search_size=S_SZ, template_size=T_SZ, embed_dim=D_BB,
                    depth=DEPTH, num_heads=HEADS_BB, head_dim=HEAD_DIM,
                    fusion_layers=F_LAYERS, ce_loc=CE_LOC, ce_keep_ratio=CE_KEEP,
                    drop_path_rate=0.0)
    model = MixFormerRGBT(spec=spec)
    tz = jnp.zeros((2, T_SZ, T_SZ, 3), jnp.float32)
    sz = jnp.zeros((2, S_SZ, S_SZ, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), tz, tz, sz)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    new_vars, _ = convert_state_dict(sd, variables, verbose=False)
    return oracle, model, new_vars


def test_trajectory_parity(flagship_pair):
    from multi_modal_tracking_tpu.tracking.tracker import RGBTTrackerJit

    oracle, model, variables = flagship_pair
    fv, fi, init_box = _frames()
    want = _torch_trajectory(oracle, fv, fi, init_box)

    tracker = RGBTTrackerJit(model=model, variables=variables,
                             template_factor=TEMPLATE_FACTOR, template_size=T_SZ,
                             search_factor=SEARCH_FACTOR, search_size=S_SZ,
                             update_interval=UPDATE_INTERVAL)
    tracker.initialize([fv[0], fi[0]], {"init_bbox": init_box})
    got = np.asarray([tracker.track([fv[t], fi[t]])["target_bbox"]
                      for t in range(1, N_FRAMES)], np.float32)

    # CE is active (keep 0.7 at blocks 1/3) on every frame; one online
    # template rebuild happens at frame 3. The tolerance is tight enough to
    # discriminate test-time CE pooling mode (CTR_POINT rows instead of the
    # reference's ALL-rows pooling shifts boxes ~0.1 px even with random
    # weights — measured before fixing the tracker call sites).
    np.testing.assert_allclose(got, want, atol=0.02, rtol=0)


def test_trajectory_parity_cached_path(flagship_pair):
    """The cached-template fast path tracks the same trajectory."""
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit

    oracle, model, variables = flagship_pair
    fv, fi, init_box = _frames(seed=1)
    want = _torch_trajectory(oracle, fv, fi, init_box)

    tracker = RGBTCachedTrackerJit(model=model, variables=variables,
                                   template_factor=TEMPLATE_FACTOR,
                                   template_size=T_SZ,
                                   search_factor=SEARCH_FACTOR, search_size=S_SZ,
                                   update_interval=UPDATE_INTERVAL)
    tracker.initialize([fv[0], fi[0]], {"init_bbox": init_box})
    got = np.asarray([tracker.track([fv[t], fi[t]])["target_bbox"]
                      for t in range(1, N_FRAMES)], np.float32)
    np.testing.assert_allclose(got, want, atol=0.02, rtol=0)


def test_trajectory_parity_unimodal():
    """Unimodal (RGB) loop vs the reference mixformer_vit tracker flow
    (lib/test/tracker/mixformer_vit.py — same crop/map-back/clip/update glue,
    Preprocessor without the JET step)."""
    from tests.test_torch_convert import _Oracle, DIM, HEADS, S_SZ as S_U, T_SZ as T_U
    from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec
    from multi_modal_tracking_tpu.tracking.tracker import RGBTrackerJit

    torch.manual_seed(0)
    oracle = _Oracle().eval()
    spec = ViTSpec(search_size=S_U, template_size=T_U, embed_dim=DIM,
                   depth=2, num_heads=HEADS, head_dim=DIM, drop_path_rate=0.0)
    model = MixFormer(spec=spec)
    tz = jnp.zeros((1, T_U, T_U, 3), jnp.float32)
    sz = jnp.zeros((1, S_U, S_U, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), tz, tz, sz)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables, _ = convert_state_dict(sd, variables, verbose=False)

    fv, _, init_box = _frames(seed=2)

    def norm1(a):
        a = a.astype(np.float32) / 255.0
        return torch.from_numpy((a - _MEAN) / _STD).permute(2, 0, 1)[None]

    z, _, _ = sample_target(fv[0], init_box, TEMPLATE_FACTOR, T_U)
    template = online = norm1(z)
    state = [float(v) for v in init_box]
    want = []
    for t in range(1, N_FRAMES):
        x, rf, _ = sample_target(fv[t], state, SEARCH_FACTOR, S_U)
        with torch.no_grad():
            pred = oracle(template, online, norm1(x)).reshape(-1, 4).mean(0)
        cx, cy, w, h = (pred * S_U / rf).tolist()
        cx_prev, cy_prev = state[0] + 0.5 * state[2], state[1] + 0.5 * state[3]
        half = 0.5 * S_U / rf
        cx, cy = cx + cx_prev - half, cy + cy_prev - half
        state = _clip_box([cx - 0.5 * w, cy - 0.5 * h, w, h])
        if t % UPDATE_INTERVAL == 0:
            z, _, _ = sample_target(fv[t], state, TEMPLATE_FACTOR, T_U)
            online = norm1(z)
        want.append(list(state))

    tracker = RGBTrackerJit(model=model, variables=variables,
                            template_factor=TEMPLATE_FACTOR, template_size=T_U,
                            search_factor=SEARCH_FACTOR, search_size=S_U,
                            update_interval=UPDATE_INTERVAL, mode="RGB")
    tracker.initialize(fv[0], {"init_bbox": init_box})
    got = np.asarray([tracker.track(fv[t])["target_bbox"]
                      for t in range(1, N_FRAMES)], np.float32)
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               atol=0.02, rtol=0)
