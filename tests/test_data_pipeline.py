"""End-to-end data pipeline: synthetic RGBT -> sampler -> processing ->
loader -> train-step input batch, plus crop/label consistency."""
import numpy as np
import pytest

from multi_modal_tracking_tpu.config import get_default_config
from multi_modal_tracking_tpu.train.builders import build_dataloaders
from multi_modal_tracking_tpu.train.data.loader import batch_to_model_inputs
from multi_modal_tracking_tpu.train.data import processing_utils as prutils


def _cfg(batch=4):
    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.TRAIN.DATASETS_NAME = ["SyntheticRGBT"]
    cfg.DATA.TRAIN.SAMPLE_PER_EPOCH = batch * 2
    cfg.DATA.VAL.DATASETS_NAME = []
    cfg.DATA.TEMPLATE.NUMBER = 2
    cfg.DATA.SAMPLER_MODE = "trident_pro"
    cfg.TRAIN.BATCH_SIZE = batch
    cfg.TRAIN.NUM_WORKER = 2
    return cfg


def test_loader_shapes_and_ranges():
    cfg = _cfg()
    loader, _ = build_dataloaders(cfg, seed=0)
    batches = list(iter(loader))
    assert len(batches) == 2
    inp = batch_to_model_inputs(batches[0], rgbt=True)
    assert inp["template_v"].shape == (4, 128, 128, 3)
    assert inp["search_v"].shape == (4, 288, 288, 3)
    assert inp["gt_xywh"].shape == (4, 4)
    # normalised boxes inside the crop (mostly) and finite images
    assert np.isfinite(inp["search_v"]).all()
    g = inp["gt_xywh"]
    assert (g[:, 2] > 0).all() and (g[:, 3] > 0).all()
    assert (g[:, 2] < 1).all() and (g[:, 3] < 1).all()


def test_determinism_same_seed():
    a = batch_to_model_inputs(next(iter(build_dataloaders(_cfg(), seed=7)[0])), True)
    b = batch_to_model_inputs(next(iter(build_dataloaders(_cfg(), seed=7)[0])), True)
    np.testing.assert_allclose(a["gt_xywh"], b["gt_xywh"])
    np.testing.assert_allclose(a["search_v"], b["search_v"])


def test_transform_image_to_crop_roundtrip():
    """Box mapped into a crop centred on itself lands centred with scaled wh."""
    box = np.asarray([100.0, 80.0, 40.0, 30.0])
    crop_sz = int(np.ceil(np.sqrt(40 * 30) * 2.0))
    rf = 128 / crop_sz
    out = prutils.transform_image_to_crop(box, box, rf, 128, normalize=True)
    # centred: cx == cy == ((128-1)/2)/128
    np.testing.assert_allclose(out[0] + out[2] / 2, (128 - 1) / 2 / 128, atol=1e-6)
    np.testing.assert_allclose(out[2], 40 * rf / 128, atol=1e-6)


def test_spm_classification_sampling():
    cfg = _cfg()
    cfg.TRAIN.TRAIN_SCORE = True
    loader, _ = build_dataloaders(cfg, seed=0)
    batch = next(iter(loader))
    inp = batch_to_model_inputs(batch, rgbt=True)
    assert "labels" in inp and inp["labels"].shape == (4,)
    assert set(np.unique(inp["labels"])).issubset({0.0, 1.0})
    assert "gt_xyxy" in inp


def test_spm_negative_semantics():
    """Reference sampler_rgbt.py:159-171: an invisible-frame negative gets
    the CENTRED dummy box (its own anno is garbage); an other-sequence
    negative keeps its REAL anno (wrong-object mismatch is the signal)."""
    from multi_modal_tracking_tpu.train.data.sampler import TrackingSampler
    from multi_modal_tracking_tpu.train.data.datasets.synthetic import SyntheticRGBT

    captured = {}

    class _Probe:
        """Stands in for processing: records the raw sample and declares it
        invalid so getitem_cls keeps looping exactly once per call path."""
        def __call__(self, data, rng=None):
            captured.setdefault(float(data["label"]), []).append(data)
            data = dict(data)
            data["valid"] = True
            return data

    class _DS(SyntheticRGBT):
        # half the frames invisible so the invisible-negative branch fires
        def get_sequence_info(self, seq_id):
            info = super().get_sequence_info(seq_id)
            info["visible"][::2] = False
            return info

    ds = _DS(n_sequences=2, n_frames=24, H=96, W=128)
    s = TrackingSampler(datasets=[ds], p_datasets=[1],
                        samples_per_epoch=64, max_gap=5,
                        num_search_frames=1, num_template_frames=2,
                        processing=_Probe(), frame_sample_mode="trident_pro",
                        train_cls=True, rgbt=True, seed=3)
    for i in range(32):
        s[i]
    negs = captured.get(0.0, [])
    assert negs, "no negative samples drawn"
    H, W = 96, 128
    cb = np.asarray([int(W / 2 - W / 16), int(H / 2 - H / 16),
                     int(W / 8), int(H / 8)], np.float32)
    n_centred = 0
    for d in negs:
        box = np.asarray(d["search_anno"][0])
        rgb_box = box[0] if box.ndim == 2 else box
        centred = np.allclose(rgb_box, cb)
        n_centred += centred
        # every negative is either the centred dummy box (invisible-frame
        # branch) or a REAL other-sequence box (w/h > 0, not the dummy)
        assert centred or (rgb_box[2] > 0 and rgb_box[3] > 0)
    # the invisible-frame branch must actually fire and substitute the box
    assert n_centred > 0


def test_warmup_cosine_schedule_under_jit():
    """The warmup_cosine lr callable must work on a traced step count and
    ramp within the first epoch (fractional-epoch warmup, lr_shed.py:3)."""
    import jax
    import jax.numpy as jnp
    from multi_modal_tracking_tpu.train.optimizer import make_epoch_schedule

    cfg = _cfg()
    cfg.TRAIN.SCHEDULER.TYPE = "warmup_cosine"
    cfg.TRAIN.WARMUP_EPOCHS = 2
    cfg.TRAIN.EPOCH = 10
    cfg.TRAIN.LR = 1e-4
    cfg.TRAIN.MIN_LR = 1e-6
    fn = make_epoch_schedule(cfg, steps_per_epoch=100)
    vals = jax.jit(lambda s: fn(s))(jnp.arange(1000))
    vals = np.asarray(vals)
    assert vals[0] == 0.0
    assert 0.2 < vals[50] < 0.3          # mid-first-epoch ramp, not zero
    np.testing.assert_allclose(vals[200], 1.0, atol=1e-6)  # warmup end
    assert vals[-1] < 0.1                # cosine decays toward MIN_LR/LR
    assert np.all(np.diff(vals[:200]) >= 0)


def test_flip_norm_geometry():
    """Per-crop RandomHorizontalFlip_Norm parity (transforms_rgbt.py:351-365):
    box corner x -> 1 - x, image mirrored; double flip is the identity."""
    import numpy as np
    from multi_modal_tracking_tpu.train.data.transforms import flip_norm

    rng = np.random.default_rng(0)
    img = rng.normal(size=(32, 32, 3)).astype(np.float32)
    box = np.asarray([0.125, 0.25, 0.25, 0.5], np.float32)   # x y w h in [0,1]
    f_img, f_box = flip_norm(img, box)
    np.testing.assert_allclose(f_box, [1 - 0.125 - 0.25, 0.25, 0.25, 0.5])
    np.testing.assert_array_equal(f_img, img[:, ::-1])
    ff_img, ff_box = flip_norm(f_img, f_box)
    np.testing.assert_array_equal(ff_img, img)
    np.testing.assert_allclose(ff_box, box, atol=1e-7)

    # a bright patch follows the box through the flip
    img2 = np.zeros((16, 16, 3), np.float32)
    img2[4:12, 2:6] = 1.0                       # x in [2,6) of 16 -> [0.125,0.375)
    b2 = np.asarray([2 / 16, 4 / 16, 4 / 16, 8 / 16], np.float32)
    f2, fb2 = flip_norm(img2, b2)
    x0 = int(round(fb2[0] * 16)); x1 = x0 + int(round(fb2[2] * 16))
    assert f2[4:12, x0:x1].min() == 1.0 and f2[:, :x0].max() == 0.0


def test_val_processing_is_deterministic_no_augment():
    """train=False processing = reference transform_val (ToTensor+Normalize):
    no brightness jitter, no per-crop flip -> two different rngs give
    identical outputs for the same sample (box jitter zeroed here)."""
    import random as _random

    import numpy as np
    from multi_modal_tracking_tpu.train.data.processing import RGBTProcessing

    def run(seed):
        proc = RGBTProcessing(
            search_area_factor={"template": 2.0, "search": 4.0},
            output_sz={"template": 32, "search": 64},
            center_jitter_factor={"template": 0.0, "search": 0.0},
            scale_jitter_factor={"template": 0.0, "search": 0.0},
            p_gray=0.0, p_flip=0.0, rng=_random.Random(seed), train=False)
        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, (80, 96, 3), np.uint8)
        tir = rng.integers(0, 255, (80, 96, 3), np.uint8)
        data = {
            "template_images": [(img, tir)],
            "template_anno": [(np.asarray([20., 20., 30., 25.]),
                               np.asarray([20., 20., 30., 25.]))],
            "search_images": [(img, tir)],
            "search_anno": [(np.asarray([20., 20., 30., 25.]),
                             np.asarray([20., 20., 30., 25.]))],
        }
        out = proc(dict(data))
        assert out["valid"]
        return out

    a, b = run(0), run(12345)
    np.testing.assert_array_equal(a["template_images_v"][0], b["template_images_v"][0])
    np.testing.assert_array_equal(a["search_images_i"][0], b["search_images_i"][0])
    np.testing.assert_array_equal(a["search_anno_v"][0], b["search_anno_v"][0])


def test_joint_grayscale_matches_cv2_fixed_point():
    """ToGrayscale parity (transforms_rgbt.py:276-300 uses
    cv2.cvtColor(RGB2GRAY), which is fixed point and rounds to nearest —
    a float astype truncation is 1 level darker on ~half of all pixels)."""
    import cv2

    from multi_modal_tracking_tpu.train.data.transforms import JointAugment

    rng = np.random.default_rng(7)
    img_v = rng.integers(0, 256, (40, 50, 3), np.uint8)
    img_i = rng.integers(0, 256, (40, 50, 3), np.uint8)
    out_v, out_i = JointAugment.apply_image_pair(
        img_v, img_i, {"gray": True, "flip": False})
    want = cv2.cvtColor(img_v, cv2.COLOR_RGB2GRAY)
    np.testing.assert_array_equal(out_v[..., 0], want)
    np.testing.assert_array_equal(out_v[..., 1], want)
    np.testing.assert_array_equal(out_v[..., 2], want)
    np.testing.assert_array_equal(out_i, img_i)   # TIR untouched by grayscale
