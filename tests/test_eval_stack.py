"""End-to-end eval-stack tests on the synthetic RGBT dataset: runner ->
result txt -> analysis tables (the acceptance-test layer the reference
drives via tracking/test.py + analysis_results.py)."""
import os

import numpy as np
import pytest

from multi_modal_tracking_tpu.eval.analysis import (TrackerResults,
                                                    compute_scores,
                                                    extract_results,
                                                    generate_formatted_report,
                                                    print_results)
from multi_modal_tracking_tpu.eval.datasets import get_dataset
from multi_modal_tracking_tpu.eval.packaging import (transform_got10k,
                                                     transform_trackingnet)
from multi_modal_tracking_tpu.eval.running import run_dataset, run_sequence


class OracleTracker:
    """Replays ground truth with optional noise — isolates the runner +
    metric path from the model."""

    def __init__(self, dataset, noise=0.0):
        self.gt = {s.name: np.asarray(s.ground_truth_rect)[:, 0] for s in dataset}
        self.noise = noise

    def initialize(self, image, info):
        self._boxes = None
        self._k = 0

    def bind(self, name):
        self._cur = self.gt[name]
        self._k = 0

    def track(self, image, info=None):
        self._k += 1
        box = self._cur[min(self._k, len(self._cur) - 1)].astype(np.float64)
        box = box + self.noise * (self._k % 3 - 1)
        return {"target_bbox": list(box)}


@pytest.fixture(scope="module")
def dataset():
    return get_dataset("synthetic_rgbt")


def _run_oracle(dataset, results_dir, noise=0.0):
    trk = OracleTracker(dataset, noise=noise)
    for seq in dataset:
        trk.bind(seq.name)
        run_sequence(seq, trk, results_dir, skip_if_done=False, report_fps=False)


def test_runner_writes_results_and_skips_done(tmp_path, dataset):
    results_dir = str(tmp_path / "res")
    _run_oracle(dataset, results_dir)
    files = os.listdir(results_dir)
    for seq in dataset:
        assert f"{seq.name}.txt" in files and f"{seq.name}_time.txt" in files
    # skip-if-done: second run with a tracker that would crash is never called
    class Boom:
        def initialize(self, *a):
            raise AssertionError("should have been skipped")
    for seq in dataset:
        assert run_sequence(seq, Boom(), results_dir) is None


def test_oracle_tracker_gets_perfect_auc(tmp_path, dataset):
    results_dir = str(tmp_path / "res")
    _run_oracle(dataset, results_dir)
    scores = print_results([TrackerResults(results_dir, "oracle")], dataset, "synth")
    assert scores["AUC"][0] > 93.0            # fmt=%d rounding costs a little IoU
    assert scores["Precision"][0] > 99.0
    assert scores["OP50"][0] > 99.0


def test_noisy_tracker_scores_lower(tmp_path, dataset):
    good, bad = str(tmp_path / "good"), str(tmp_path / "bad")
    _run_oracle(dataset, good)
    _run_oracle(dataset, bad, noise=12.0)
    eval_data = extract_results(
        [TrackerResults(good, "good"), TrackerResults(bad, "bad")], dataset)
    scores = compute_scores(eval_data)
    assert scores["AUC"][0] > scores["AUC"][1]
    report = generate_formatted_report(scores["trackers"], scores, "synth")
    assert "good" in report and "AUC" in report


def test_packaging_zip_layouts(tmp_path, dataset):
    results_dir = str(tmp_path / "res")
    _run_oracle(dataset, results_dir)
    z1 = transform_got10k(results_dir, str(tmp_path / "got"), "trk")
    z2 = transform_trackingnet(results_dir, str(tmp_path / "tn"), "trk")
    assert os.path.isfile(z1) and os.path.isfile(z2)
    import zipfile
    names = zipfile.ZipFile(z1).namelist()
    assert any(n.endswith("_001.txt") for n in names)


def test_sequence_list_name_lookup(dataset):
    seq = dataset["synthetic_00"]
    assert seq.name == "synthetic_00"
    assert seq.multimodal and seq.ground_truth_rect.ndim == 3


def test_run_dataset_device_round_robin(tmp_path, dataset):
    """Sequences fan out over all (virtual) devices: each worker's tracker
    uploads must land on its pinned device, and the runner must still write
    every result (the per-GPU process-pool analogue, running.py:134-141)."""
    import jax

    from multi_modal_tracking_tpu.eval.running import run_dataset

    devices = jax.devices()
    assert len(devices) >= 2
    seen = []

    class DeviceProbeTracker:
        def initialize(self, image, info):
            from multi_modal_tracking_tpu.tracking.tracker import _put
            seen.append(_put(np.zeros(1)).devices())
            from multi_modal_tracking_tpu.tracking.tracker import \
                _select_init_box
            self._box = list(map(float,
                                 _select_init_box(info["init_bbox"])))

        def track(self, image, info=None):
            return {"target_bbox": self._box}

    res_dir = str(tmp_path / "rr")
    stats = run_dataset(dataset, None, res_dir, skip_if_done=False,
                        threads=len(devices),
                        tracker_factory=DeviceProbeTracker,
                        devices=devices)
    assert len(stats) == len(dataset)
    used = set()
    for s in seen:
        used |= {d.id for d in s}
    assert len(used) >= 2, used        # really fanned out
    for seq in dataset:
        got = np.loadtxt(os.path.join(res_dir, f"{seq.name}.txt"))
        assert got.shape == (len(seq.frames), 4)


def test_save_vis_video(tmp_path, dataset):
    """save_vis renders <results>/vis_video/<seq>.mp4 with one frame per
    tracked frame (reference params.vis_search, running.py:26-80)."""
    pytest.importorskip("cv2")
    trk = OracleTracker(dataset)
    seq = dataset[0]
    trk.bind(seq.name)
    run_sequence(seq, trk, str(tmp_path), skip_if_done=False,
                 report_fps=False, save_vis=True)
    video = tmp_path / "vis_video" / f"{seq.name}.mp4"
    assert video.is_file() and video.stat().st_size > 0
    import cv2
    cap = cv2.VideoCapture(str(video))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == len(seq.frames) - 1
    cap.release()


def _tiny_params(script):
    from multi_modal_tracking_tpu.eval.params import get_parameters
    p = get_parameters(script, tracking_yaml=None)
    c = p.cfg
    c.DATA.SEARCH.SIZE = 64
    c.DATA.TEMPLATE.SIZE = 32
    c.TEST.SEARCH_SIZE = 64
    c.TEST.TEMPLATE_SIZE = 32
    if "FUSION_LAYERS" in c.MODEL:
        c.MODEL.FUSION_LAYERS = 1
    if "VIT_TYPE" in c.MODEL:
        c.MODEL.VIT_TYPE = "base_patch16"
    p.template_size, p.search_size = 32, 64
    return p


@pytest.mark.parametrize("script", ["mixformer_vit_rgbt",
                                    "mixformer_vit_rgbt_shared",
                                    "mixformer_vit_rgbt_unibackbone"])
def test_create_tracker_plain_vit_rgbt_scripts(script):
    """Regression: the cached-template fast path must only engage for models
    that implement set_online/forward_track — the plain vit_rgbt variants
    get the full-forward loop and must initialize+track without error."""
    import numpy as np
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker
    import jax.numpy as jnp
    tracker = create_tracker(_tiny_params(script), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    fv = rng.integers(0, 255, (96, 128, 3), np.uint8)
    fi = rng.integers(0, 255, (96, 128, 3), np.uint8)
    tracker.initialize([fv, fi], {"init_bbox": [40.0, 30.0, 30.0, 24.0]})
    out = tracker.track([fv, fi])
    assert len(out["target_bbox"]) == 4


def test_create_tracker_flagship_uses_cached_path():
    from multi_modal_tracking_tpu.eval.evaltracker import create_tracker
    from multi_modal_tracking_tpu.tracking.tracker import RGBTCachedTrackerJit
    import jax.numpy as jnp
    tracker = create_tracker(_tiny_params("asymmetric_shared_ce"),
                             dtype=jnp.float32)
    assert isinstance(tracker, RGBTCachedTrackerJit)
    # Reference trackers call the net with NO runtime keep rate
    # (tracker/asymmetric_shared_ce.py:90-98): each CE block uses its own
    # configured keep_ratio_search. A runtime rate would override all
    # blocks with one value — wrong for per-block CE_KEEP_RATIO configs.
    assert tracker.ce_keep_rate is None


def test_read_depth_as_rgb_reference_semantics(tmp_path):
    """Eval-side depth loading == the reference's get_rgbd_frame
    (dtype='rgb3d', depth_clip=True — tracker_rgbt.py:218): median*3 clip,
    min-max normalize to uint8, replicated grayscale. Must also equal the
    train-side normalized_depth_pair helper (one definition of the input)."""
    import cv2
    from multi_modal_tracking_tpu.eval.running import _read_depth_as_rgb
    from multi_modal_tracking_tpu.train.data.datasets.rgbt import (
        normalized_depth_pair)

    rng = np.random.default_rng(0)
    dp = rng.integers(500, 3000, (40, 50), np.uint16)
    dp[3, 4] = 60000          # far outlier: must clip at median*3, not max
    p = str(tmp_path / "d.png")
    cv2.imwrite(p, dp)
    cp = str(tmp_path / "c.png")
    cv2.imwrite(cp, rng.integers(0, 255, (40, 50, 3), np.uint8))

    got = _read_depth_as_rgb(p)
    assert got.shape == (40, 50, 3) and got.dtype == np.uint8
    # replicated grayscale
    assert np.array_equal(got[..., 0], got[..., 1])
    assert np.array_equal(got[..., 0], got[..., 2])
    # reference steps, written out literally (depth_utils.py:20-60)
    ref = cv2.imread(p, -1)
    max_depth = min(np.median(ref) * 3, 10000)
    ref = np.minimum(ref, max_depth)
    ref = cv2.normalize(ref, None, alpha=0, beta=255,
                        norm_type=cv2.NORM_MINMAX)
    ref = np.asarray(ref, np.uint8)
    np.testing.assert_array_equal(got[..., 0], ref)
    # the outlier saturates to 255 together with everything >= the clip
    assert got[3, 4, 0] == 255
    # train/eval agree
    _, train_dp = normalized_depth_pair(cp, p)
    np.testing.assert_array_equal(got, train_dp)


def test_update_interval_fallback_reads_max_sample_interval():
    """Datasets without an UPDATE_INTERVALS entry fall back to
    cfg.DATA.MAX_SAMPLE_INTERVAL, as the reference tracker does
    (lib/test/tracker/asymmetric_shared_ce.py:43-46)."""
    from multi_modal_tracking_tpu.eval.params import (
        get_parameters, update_interval_for)

    p = get_parameters("asymmetric_shared_ce", tracking_yaml=None)
    # listed dataset uses its entry
    assert update_interval_for(p.cfg, "lasot") == int(
        p.cfg.TEST.UPDATE_INTERVALS.LASOT[0])
    # unlisted dataset -> DATA.MAX_SAMPLE_INTERVAL (a 1-element list)
    want = p.cfg.DATA.MAX_SAMPLE_INTERVAL
    want = int(want[0]) if isinstance(want, (list, tuple)) else int(want)
    assert update_interval_for(p.cfg, "no_such_dataset") == min(want, 2**31 - 1)

    # with the tracking.yaml overlay (the RGBT default) MAX_SAMPLE_INTERVAL
    # is 10**18 = "never update"; the returned interval must stay int32-safe
    # for the jitted frame_id % interval (OverflowError otherwise)
    po = get_parameters("asymmetric_shared_ce")
    iv = update_interval_for(po.cfg, "no_such_dataset")
    assert iv == 2**31 - 1
    # RGBT benchmarks have NO entry in the reference table: never update
    assert update_interval_for(po.cfg, "lasher") == 2**31 - 1
    assert update_interval_for(po.cfg, "vtuav") == 2**31 - 1
    import jax.numpy as jnp
    assert not bool((jnp.int32(7) % iv) == 0)


def test_model_checkpoint_resolution_uses_save_dir(tmp_path, monkeypatch):
    """--model resolves against env_settings().save_dir
    (lib/test/parameter/asymmetric_shared_ce.py:30-34: save_dir/<model> when
    TEST.LOAD_FROME_TRAIN_RESULT else save_dir/models/<model>)."""
    import json
    import os
    from multi_modal_tracking_tpu.eval.params import get_parameters

    pfile = tmp_path / "local_paths.json"
    pfile.write_text(json.dumps({"save_dir": str(tmp_path / "out")}))
    monkeypatch.setenv("MMT_LOCAL_PATHS", str(pfile))

    p = get_parameters("asymmetric_shared_ce", model="MixFormerRGBT_ep0095.pth.tar")
    assert p.checkpoint == os.path.join(
        str(tmp_path / "out"), "models", "MixFormerRGBT_ep0095.pth.tar")

    # LOAD_FROME_TRAIN_RESULT (tracking_vis.yaml) drops the models/ leg
    pv = get_parameters("asymmetric_shared", tracking_yaml="tracking_vis",
                        model="M.pth.tar")
    assert pv.cfg.TEST.LOAD_FROME_TRAIN_RESULT
    assert pv.checkpoint == os.path.join(str(tmp_path / "out"), "M.pth.tar")

    # an explicit checkpoint always wins over --model
    pc = get_parameters("asymmetric_shared_ce", checkpoint="/x/ckpt.pth.tar",
                        model="M.pth.tar")
    assert pc.checkpoint == "/x/ckpt.pth.tar"
