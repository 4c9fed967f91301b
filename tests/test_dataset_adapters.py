"""Every train dataset adapter executed against a miniature ON-DISK replica
of its real layout (VERDICT r1 item 5: the adapters were written to the
reference's quirks but never executed).

Layout parity targets (lib/train/dataset/): lasher.py:38-44 (TrainingSet/
trainingset tree, blueboy85 drop, init.txt for both modalities),
vtuav.py:45-107 (train_data/<split>/<video>/{rgb,ir}, space-delimited
annos, x10 sparse frame indexing, FO/OV attribute npy, duplicate video
names), rgbt234 visible/infrared txt pair, depthtrack_seq.py + depth_utils
(16-bit depth -> normalised 3-channel), kaist.py (images/<set>/<video> +
json annos), llvip_seq/m3fd_seq, lasot.py (class/class-id dirs, img/%08d,
occlusion/out-of-view files), got10k.py (list.txt + split file,
absence/cover labels), tracking_net.py (TRAIN_k anno/frames), tnl2k.py,
coco_seq.py (instances json), imagenetvid.py (cached track list).
"""
import json
import os

import cv2
import numpy as np
import pytest

from multi_modal_tracking_tpu.train.data.datasets import rgbt as R
from multi_modal_tracking_tpu.train.data.datasets import unimodal as U

H, W = 64, 80


def _img(path, seed=0, gray=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    if gray:
        arr[:] = arr[..., :1]
    assert cv2.imwrite(path, arr)


def _boxes(path, n, delim=",", jitter=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = [f"{20 + jitter}{delim}15{delim}30{delim}25" for _ in range(n)]
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    base = tmp_path_factory.mktemp("datasets")
    r = {k: str(base / k) for k in
         ("lasher", "rgbt234", "vtuav", "depthtrack", "kaist", "llvip",
          "m3fd", "lasot", "got10k", "trackingnet", "tnl2k", "coco",
          "imagenet")}

    # LasHeR: TrainingSet/trainingset/<seq>/{visible,infrared} + init.txt;
    # blueboy85 present on disk but must be dropped.
    for seq in ("boy02", "car01", "blueboy85"):
        d = os.path.join(r["lasher"], "TrainingSet", "trainingset", seq)
        for i in range(24):
            _img(os.path.join(d, "visible", f"v{i:06d}.jpg"), i)
            _img(os.path.join(d, "infrared", f"i{i:06d}.jpg"), i, gray=True)
        _boxes(os.path.join(d, "init.txt"), 24)

    # RGBT234: <seq>/{visible,infrared} + visible.txt/infrared.txt
    d = os.path.join(r["rgbt234"], "bike1")
    for i in range(6):
        _img(os.path.join(d, "visible", f"{i:05d}.jpg"), i)
        _img(os.path.join(d, "infrared", f"{i:05d}.jpg"), i, gray=True)
    _boxes(os.path.join(d, "visible.txt"), 6)
    _boxes(os.path.join(d, "infrared.txt"), 6, jitter=2)

    # VTUAV: train_data/<split>/<video>/{rgb,ir}; sparse 10-frame annos
    # (space-delimited), FO/OV attribute npy; pedestrian_042 duplicated
    # across splits (dedup keeps one).
    for split, videos in (("train_ST_004", ["pedestrian_042"]),
                          ("train_ST_006", ["pedestrian_042", "car_001"])):
        for video in videos:
            d = os.path.join(r["vtuav"], "train_data", split, video)
            for i in range(200):
                _img(os.path.join(d, "rgb", f"{i:06d}.jpg"), i % 8)
                _img(os.path.join(d, "ir", f"{i:06d}.jpg"), i % 8, gray=True)
            _boxes(os.path.join(d, "rgb.txt"), 20, delim=" ")
            _boxes(os.path.join(d, "ir.txt"), 20, delim=" ")
    attr_dir = os.path.join(r["vtuav"], "seq_level_attr_anno")
    os.makedirs(attr_dir)
    for video, occluded_frame in (("pedestrian_042", None), ("car_001", 10)):
        fo = np.zeros((200, 1), dtype=np.uint8)
        ov = np.zeros((200, 1), dtype=np.uint8)
        if occluded_frame is not None:
            fo[occluded_frame, 0] = 1
        np.save(os.path.join(attr_dir, f"{video}.npy"),
                {"FO": fo, "OV": ov}, allow_pickle=True)

    # DepthTrack: <split>/<group>/<seq>/{color,depth(16-bit)} + groundtruth
    d = os.path.join(r["depthtrack"], "train", "adapter01", "bag03_indoor")
    rng = np.random.default_rng(0)
    for i in range(5):
        _img(os.path.join(d, "color", f"{i:08d}.jpg"), i)
        os.makedirs(os.path.join(d, "depth"), exist_ok=True)
        depth = rng.integers(300, 4000, (H, W), dtype=np.uint16)
        assert cv2.imwrite(os.path.join(d, "depth", f"{i:08d}.png"), depth)
    _boxes(os.path.join(d, "groundtruth.txt"), 5)

    # KAIST: images/<set>/<video>/{visible,lwir} + annotations/<set>/<video>.json
    d = os.path.join(r["kaist"], "images", "set00", "V000")
    for i in range(5):
        _img(os.path.join(d, "visible", f"I{i:05d}.jpg"), i)
        _img(os.path.join(d, "lwir", f"I{i:05d}.jpg"), i, gray=True)
    ad = os.path.join(r["kaist"], "annotations", "set00")
    os.makedirs(ad)
    with open(os.path.join(ad, "V000.json"), "w") as f:
        json.dump({"bbox": [[20, 15, 30, 25]] * 5}, f)

    # LLVIP / M3FD
    d = os.path.join(r["llvip"], "seq000")
    for i in range(5):
        _img(os.path.join(d, "visible", f"{i:06d}.jpg"), i)
        _img(os.path.join(d, "infrared", f"{i:06d}.jpg"), i, gray=True)
    _boxes(os.path.join(d, "groundtruth.txt"), 5)
    d = os.path.join(r["m3fd"], "seq000")
    for i in range(5):
        _img(os.path.join(d, "vis", f"{i:05d}.jpg"), i)
        _img(os.path.join(d, "ir", f"{i:05d}.jpg"), i, gray=True)
    _boxes(os.path.join(d, "groundtruth.txt"), 5)

    # LaSOT: <class>/<class-id>/img/%08d.jpg + occlusion/out-of-view files
    for sid in (1, 2):
        d = os.path.join(r["lasot"], "airplane", f"airplane-{sid}")
        for i in range(24):
            _img(os.path.join(d, "img", f"{i + 1:08d}.jpg"), i % 8)
        _boxes(os.path.join(d, "groundtruth.txt"), 24)
        with open(os.path.join(d, "full_occlusion.txt"), "w") as f:
            f.write(",".join(["0"] * 23 + ["1"]))
        with open(os.path.join(d, "out_of_view.txt"), "w") as f:
            f.write(",".join(["0"] * 24))
    with open(os.path.join(r["lasot"], "testing_set.txt"), "w") as f:
        f.write("airplane-2\n")

    # GOT-10k: list.txt, per-seq %08d.jpg + groundtruth/absence/cover
    os.makedirs(r["got10k"])
    names = ["GOT-10k_Train_000001", "GOT-10k_Train_000002"]
    with open(os.path.join(r["got10k"], "list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    for name in names:
        d = os.path.join(r["got10k"], name)
        for i in range(24):
            _img(os.path.join(d, f"{i + 1:08d}.jpg"), i % 8)
        _boxes(os.path.join(d, "groundtruth.txt"), 24)
        with open(os.path.join(d, "absence.label"), "w") as f:
            f.write("\n".join(["0"] * 23 + ["1"]))
        with open(os.path.join(d, "cover.label"), "w") as f:
            f.write("\n".join(["8"] * 23 + ["0"]))
    with open(os.path.join(r["got10k"], "vottrain_split.txt"), "w") as f:
        f.write("0\n")

    # TrackingNet: TRAIN_0/anno/<seq>.txt + TRAIN_0/frames/<seq>/<i>.jpg
    _boxes(os.path.join(r["trackingnet"], "TRAIN_0", "anno", "seqA.txt"), 5)
    for i in range(5):
        _img(os.path.join(r["trackingnet"], "TRAIN_0", "frames", "seqA", f"{i}.jpg"), i)

    # TNL2k: <seq>/imgs + groundtruth.txt
    d = os.path.join(r["tnl2k"], "video_01")
    for i in range(5):
        _img(os.path.join(d, "imgs", f"{i:05d}.jpg"), i)
    _boxes(os.path.join(d, "groundtruth.txt"), 5)

    # COCO: annotations/instances_train2017.json + images/train2017
    _img(os.path.join(r["coco"], "images", "train2017", "000000000009.jpg"))
    os.makedirs(os.path.join(r["coco"], "annotations"))
    with open(os.path.join(r["coco"], "annotations", "instances_train2017.json"), "w") as f:
        json.dump({
            "images": [{"id": 9, "file_name": "000000000009.jpg",
                        "height": H, "width": W}],
            "annotations": [
                {"id": 1, "image_id": 9, "bbox": [20, 15, 30, 25], "iscrowd": 0},
                {"id": 2, "image_id": 9, "bbox": [5, 5, 0, 10], "iscrowd": 0},   # degenerate
                {"id": 3, "image_id": 9, "bbox": [1, 1, 10, 10], "iscrowd": 1},  # crowd
            ]}, f)

    # ImageNet-VID: cached track list + frames
    for i in range(5):
        _img(os.path.join(r["imagenet"], "Data", "VID", "train", "v0", f"{i:06d}.jpg"), i)
    with open(os.path.join(r["imagenet"], "imagenet_vid_cache.json"), "w") as f:
        json.dump([{
            "frames": [f"Data/VID/train/v0/{i:06d}.jpg" for i in range(5)],
            "bbox": [[20, 15, 30, 25]] * 5,
            "visible": [True, True, True, True, False]}], f)
    return r


# --------------------------------------------------------------- RGBT adapters

def _check_pair_frames(ds, seq_id=0, frame_ids=(0, 1)):
    frames, annos, _ = ds.get_frames(seq_id, list(frame_ids))
    assert len(frames) == len(frame_ids)
    for fv, fi in frames:
        assert fv.shape == (H, W, 3) and fi.shape[:2] == (H, W)
    assert all(b.shape == (2, 4) for b in annos["bbox"])


def test_lasher_drops_blueboy85(roots):
    ds = R.LasHeR(root=roots["lasher"])
    names = [os.path.basename(s) for s in ds.sequence_list]
    assert sorted(names) == ["boy02", "car01"]
    info = ds.get_sequence_info(0)
    assert info["bbox"].shape == (24, 2, 4) and info["visible"].all()
    # both modality rows come from init.txt (lasher.py:66-73)
    np.testing.assert_array_equal(info["bbox"][:, 0], info["bbox"][:, 1])
    _check_pair_frames(ds)


def test_rgbt234_separate_modal_annos(roots):
    ds = R.RGBT234(root=roots["rgbt234"])
    assert ds.get_num_sequences() == 1
    info = ds.get_sequence_info(0)
    assert (info["bbox"][:, 0, 0] != info["bbox"][:, 1, 0]).all()
    _check_pair_frames(ds)


def test_vtuav_dedup_sparse_and_visibility(roots):
    ds = R.VTUAV(root=roots["vtuav"])
    names = [os.path.basename(s) for s in ds.sequence_list]
    assert sorted(names) == ["car_001", "pedestrian_042"]  # dedup (vtuav.py:17-28)
    sid = names.index("car_001")
    info = ds.get_sequence_info(sid)
    assert info["bbox"].shape == (20, 2, 4)
    # frame 10 occluded in the attribute npy -> sparse anno index 1 invisible
    np.testing.assert_array_equal(info["visible"], [True, False] + [True] * 18)
    # annotation index -> frame index x10 (vtuav.py:106)
    frames, _, _ = ds.get_frames(sid, [2])
    d = os.path.join(roots["vtuav"], "train_data")
    expect = cv2.imread(os.path.join(
        [s for s in ds.sequence_list if "car_001" in s][0], "rgb", "000020.jpg"))
    np.testing.assert_array_equal(frames[0][0], cv2.cvtColor(expect, cv2.COLOR_BGR2RGB))


def test_depthtrack_normalised_depth(roots):
    ds = R.DepthTrack(root=roots["depthtrack"], split="train")
    assert ds.get_num_sequences() == 1
    frames, annos, _ = ds.get_frames(0, [0, 3])
    rgb, d3 = frames[0]
    assert rgb.shape == (H, W, 3) and d3.shape == (H, W, 3)
    assert d3.dtype == np.uint8 and d3.max() <= 255
    # 3-channel replicated normalised depth (depth_utils.py:4-60)
    np.testing.assert_array_equal(d3[..., 0], d3[..., 1])


def test_kaist_json_annos(roots):
    ds = R.KAIST(root=roots["kaist"])
    assert ds.get_num_sequences() == 1
    info = ds.get_sequence_info(0)
    assert info["bbox"].shape == (5, 2, 4)
    _check_pair_frames(ds)


def test_llvip_and_m3fd(roots):
    for cls, key in ((R.LLVIP, "llvip"), (R.M3FD, "m3fd")):
        ds = cls(root=roots[key])
        assert ds.get_num_sequences() == 1
        _check_pair_frames(ds)


def test_tir_only_views(roots):
    ds = R.LasHeR_TIR(root=roots["lasher"])
    info = ds.get_sequence_info(0)
    assert info["bbox"].shape == (24, 4)
    frames, annos, _ = ds.get_frames(0, [0, 1])
    assert frames[0].shape[:2] == (H, W)
    assert annos["bbox"][0].shape == (4,)
    ds2 = R.RGBT234_TIR(root=roots["rgbt234"])
    info2 = ds2.get_sequence_info(0)
    # the TIR view must expose the INFRARED bbox row
    pair = R.RGBT234(root=roots["rgbt234"]).get_sequence_info(0)
    np.testing.assert_array_equal(info2["bbox"], pair["bbox"][:, 1])


# ----------------------------------------------------------- unimodal adapters

def test_lasot_split_and_visibility(roots):
    # vendored protocol-II roster: airplane-1 is a TEST sequence,
    # airplane-2 is in the 1120-name train split
    ds = U.LaSOT(root=roots["lasot"], split="train")
    assert [os.path.basename(s) for s in ds.sequence_list] == ["airplane-2"]
    info = ds.get_sequence_info(0)
    assert info["bbox"].shape == (24, 4)
    np.testing.assert_array_equal(info["visible"], [True] * 23 + [False])
    frames, annos, _ = ds.get_frames(0, [0, 2])
    assert frames[0].shape == (H, W, 3)
    ds_all = U.LaSOT(root=roots["lasot"], split=None)
    assert ds_all.get_num_sequences() == 2


def test_got10k_split_and_labels(roots):
    ds = U.GOT10k(root=roots["got10k"], split=None)
    assert ds.get_num_sequences() == 2
    info = ds.get_sequence_info(0)
    np.testing.assert_array_equal(info["visible"], [True] * 23 + [False])
    frames, _, _ = ds.get_frames(0, [0, 4])
    assert frames[0].shape == (H, W, 3)
    ds_tr = U.GOT10k(root=roots["got10k"], split="vottrain")
    assert ds_tr.get_num_sequences() == 1


def test_trackingnet_chunks(roots):
    ds = U.TrackingNet(root=roots["trackingnet"])
    assert ds.get_num_sequences() == 1
    info = ds.get_sequence_info(0)
    assert info["bbox"].shape == (5, 4)
    frames, _, _ = ds.get_frames(0, [0, 4])
    assert frames[1].shape == (H, W, 3)


def test_tnl2k(roots):
    ds = U.TNL2k(root=roots["tnl2k"])
    assert ds.get_num_sequences() == 1
    frames, annos, _ = ds.get_frames(0, [1, 3])
    assert frames[0].shape == (H, W, 3)


def test_coco_instances(roots):
    ds = U.COCOSeq(root=roots["coco"])
    # degenerate + crowd annotations filtered (coco_seq.py semantics)
    assert ds.get_num_sequences() == 1
    frames, annos, _ = ds.get_frames(0, [0, 0, 0])
    assert len(frames) == 3 and frames[0].shape == (H, W, 3)
    np.testing.assert_array_equal(annos["bbox"][0], [20, 15, 30, 25])


def test_imagenet_vid_cache(roots):
    ds = U.ImagenetVID(root=roots["imagenet"])
    assert ds.get_num_sequences() == 1
    info = ds.get_sequence_info(0)
    np.testing.assert_array_equal(info["visible"], [True] * 4 + [False])
    frames, _, _ = ds.get_frames(0, [0, 1])
    assert frames[0].shape == (H, W, 3)


# ------------------------------------------------- full pipeline over fixtures

def test_rgbt_dataloader_over_lasher_fixture(roots, tmp_path, monkeypatch):
    """build_dataloaders -> TrackingSampler -> RGBT processing over the
    on-disk LasHeR replica: the complete reference train-data path
    (base_functions.py:163-284) on real files."""
    paths = {"lasher_dir": roots["lasher"], "vtuav_dir": roots["vtuav"]}
    pfile = tmp_path / "local_paths.json"
    pfile.write_text(json.dumps(paths))
    monkeypatch.setenv("MMT_LOCAL_PATHS", str(pfile))

    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.train.builders import build_dataloaders

    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.TRAIN.DATASETS_NAME = ["LasHeR", "VTUAV"]
    cfg.DATA.TRAIN.DATASETS_RATIO = [1, 1]
    cfg.DATA.TRAIN.SAMPLE_PER_EPOCH = 4
    cfg.DATA.VAL.DATASETS_NAME = []
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.NUM_WORKER = 0
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32

    from multi_modal_tracking_tpu.train.data.loader import batch_to_model_inputs

    train_loader, _ = build_dataloaders(cfg, seed=0)
    batch = next(iter(train_loader))
    inputs = batch_to_model_inputs(batch, rgbt=True)
    for key, sz in (("template_v", 32), ("template_i", 32),
                    ("online_template_v", 32), ("online_template_i", 32),
                    ("search_v", 64), ("search_i", 64)):
        assert inputs[key].shape == (2, sz, sz, 3), (key, inputs[key].shape)
        assert np.isfinite(inputs[key]).all()
    assert inputs["gt_xywh"].shape == (2, 4)
    assert set(np.asarray(batch["dataset"]).tolist()) <= {"LasHeR", "VTUAV"}


def test_unimodal_dataloader_over_lasot_fixture(roots, tmp_path, monkeypatch):
    paths = {"lasot_dir": roots["lasot"], "got10k_dir": roots["got10k"]}
    pfile = tmp_path / "local_paths.json"
    pfile.write_text(json.dumps(paths))
    monkeypatch.setenv("MMT_LOCAL_PATHS", str(pfile))

    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.train.builders import build_dataloaders

    cfg = get_default_config("mixformer_vit")
    cfg.DATA.TRAIN.DATASETS_NAME = ["LASOT", "GOT10K_vottrain"]
    cfg.DATA.TRAIN.DATASETS_RATIO = [1, 1]
    cfg.DATA.TRAIN.SAMPLE_PER_EPOCH = 4
    cfg.DATA.VAL.DATASETS_NAME = []
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.NUM_WORKER = 0
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32

    from multi_modal_tracking_tpu.train.data.loader import batch_to_model_inputs

    train_loader, _ = build_dataloaders(cfg, seed=0)
    batch = next(iter(train_loader))
    inputs = batch_to_model_inputs(batch, rgbt=False)
    assert inputs["template"].shape == (2, 32, 32, 3)
    assert inputs["search"].shape == (2, 64, 64, 3)
    assert inputs["gt_xywh"].shape == (2, 4)
