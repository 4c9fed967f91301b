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
