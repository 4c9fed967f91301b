"""Metric-layer tests vs an independent torch oracle (reference semantics:
lib/test/analysis/extract_results.py)."""
import numpy as np
import torch

from multi_modal_tracking_tpu.eval import metrics as M


def torch_iou(pred, anno):
    pred, anno = torch.tensor(pred), torch.tensor(anno)
    tl = torch.max(pred[:, :2], anno[:, :2])
    br = torch.min(pred[:, :2] + pred[:, 2:] - 1.0, anno[:, :2] + anno[:, 2:] - 1.0)
    sz = (br - tl + 1.0).clamp(0)
    inter = sz.prod(dim=1)
    union = pred[:, 2:].prod(dim=1) + anno[:, 2:].prod(dim=1) - inter
    return (inter / union).numpy()


def _rand_boxes(n, rng, W=320, H=240):
    x = rng.uniform(0, W * 0.6, n)
    y = rng.uniform(0, H * 0.6, n)
    w = rng.uniform(5, W * 0.3, n)
    h = rng.uniform(5, H * 0.3, n)
    return np.stack([x, y, w, h], axis=1)


def test_iou_vs_torch_oracle():
    rng = np.random.default_rng(0)
    p, a = _rand_boxes(200, rng), _rand_boxes(200, rng)
    np.testing.assert_allclose(M.calc_iou_overlap(p, a), torch_iou(p, a), rtol=1e-12)


def test_center_error_pixel_convention():
    pred = np.array([[10.0, 10.0, 20.0, 20.0]])
    anno = np.array([[10.0, 10.0, 20.0, 20.0]])
    assert M.calc_err_center(pred, anno)[0] == 0.0
    # shifting by (3,4) pixels -> error 5
    pred2 = pred + np.array([[3.0, 4.0, 0.0, 0.0]])
    assert np.isclose(M.calc_err_center(pred2, anno)[0], 5.0)


def test_robust_unimodal_first_frame_forced():
    rng = np.random.default_rng(1)
    anno = _rand_boxes(30, rng)
    pred = _rand_boxes(30, rng)
    ov, ce, cn, valid = M.calc_seq_err_robust(pred, anno, "test")
    assert np.isclose(ov[0], 1.0) and ce[0] == 0.0          # first frame = GT
    assert valid.all()


def test_robust_zero_size_carry_forward():
    anno = np.tile([10.0, 10.0, 20.0, 20.0], (5, 1))
    pred = anno.copy()
    pred[2] = [50.0, 50.0, 0.0, 0.0]               # zero-size -> carry frame 1
    ov, *_ = M.calc_seq_err_robust(pred, anno, "test")
    assert ov[2] == 1.0


def test_robust_zero_size_beyond_gt_length_no_crash():
    """A results file longer than the GT with a zero-size box in the excess
    rows must not crash (the reference indexes anno[i] with i from the pred
    range — a latent IndexError; the excess rows get trimmed anyway)."""
    anno = np.tile([10.0, 10.0, 20.0, 20.0], (5, 1))
    pred = np.tile([10.0, 10.0, 20.0, 20.0], (7, 1))
    pred[6] = [50.0, 50.0, 0.0, 0.0]
    ov, *_ = M.calc_seq_err_robust(pred, anno, "test")
    assert ov.shape == (5,) and (ov == 1.0).all()


def test_robust_rgbt_max_iou_min_center():
    n = 20
    anno_v = np.tile([10.0, 10.0, 20.0, 20.0], (n, 1))
    anno_i = np.tile([100.0, 100.0, 20.0, 20.0], (n, 1))
    anno = np.stack([anno_v, anno_i], axis=1)
    pred = np.tile([100.0, 100.0, 20.0, 20.0], (n, 1))   # matches TIR gt
    ov, ce, cn, valid = M.calc_seq_err_robust_rgbt(pred, anno, "LasHeR")
    assert (ov[1:] == 1.0).all()                   # max over modalities
    assert (ce[1:] == 0.0).all()                   # min over modalities
    # first frame forced to RGB gt -> iou vs TIR gt is 0, vs RGB gt is 1 -> max=1
    assert ov[0] == 1.0


def test_robust_rgbt_vtuav_sparse_subsampling():
    n_anno = 5
    anno = np.tile([10.0, 10.0, 20.0, 20.0], (n_anno, 2, 1)).reshape(n_anno, 2, 4)
    pred = np.zeros((n_anno * 10, 4))
    pred[:, 2:] = 1.0
    pred[0::10] = [10.0, 10.0, 20.0, 20.0]         # correct on annotated frames
    ov, *_ = M.calc_seq_err_robust_rgbt(pred, anno, "VTUAV")
    assert ov.shape[0] == n_anno and (ov == 1.0).all()


def test_robust_vot_off_by_one_repair():
    n = 10
    anno = np.tile([10.0, 10.0, 20.0, 20.0], (n, 2, 1)).reshape(n, 2, 4)
    pred = np.tile([10.0, 10.0, 20.0, 20.0], (n - 1, 1))  # missing init frame
    ov, *_ = M.calc_seq_err_robust_rgbt(pred, anno, "LasHeR")
    assert ov.shape[0] == n and (ov == 1.0).all()


def test_unimodal_short_result_pads_at_end_not_prepend():
    """extract_results.py:60-77: the unimodal path zero-pads short results
    at the END; the prepend-GT VOT repair belongs to the RGBT variant only.
    Prepending here would shift every prediction by one frame."""
    n = 10
    anno = np.tile([10.0, 10.0, 20.0, 20.0], (n, 1))
    pred = np.tile([10.0, 10.0, 20.0, 20.0], (n - 1, 1))  # one frame short
    ov, *_ = M.calc_seq_err_robust(pred, anno, "otb")
    assert ov.shape[0] == n
    assert (ov[:-1] == 1.0).all()          # aligned frames still perfect...
    assert ov[-1] == 0.0                   # ...and only the END is zero-padded


def test_invalid_annotation_marked():
    n = 6
    anno = np.tile([10.0, 10.0, 20.0, 20.0], (n, 1))
    anno[3, 2:] = 0.0                               # zero-size gt -> invalid
    pred = anno.copy()
    pred[:, 2:] = np.maximum(pred[:, 2:], 1.0)
    ov, ce, cn, valid = M.calc_seq_err_robust(pred, anno, "test")
    assert not valid[3] and ov[3] == -1.0 and np.isinf(ce[3])
