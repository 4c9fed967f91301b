"""Every eval dataset adapter executed against a miniature on-disk replica
of its real layout (the eval-side twin of test_dataset_adapters.py).

Parity targets: lib/test/evaluation/{lasher,rgbt234,gtot,vtuav,depthtrack,
lasot,got10k,trackingnet,otb,uav,nfs,tc128,tnl2k}dataset.py — a typo in a
path join or a gt-format quirk (GTOT x1y1x2y2, DepthTrack NaN rows, VTUAV
space-delimited sparse gt) must fail here, not on first real use.
"""
import json
import os

import numpy as np
import pytest


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\xff")


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


N = 4   # frames per miniature sequence


def _gt_rows(delim=",", n=N, start=10.0):
    return "\n".join(
        delim.join(str(start + i + j) for j in range(4)) for i in range(n)) + "\n"


@pytest.fixture()
def data_root(tmp_path, monkeypatch):
    root = tmp_path / "data"

    # LasHeR: TestingSet/testingset/<seq>/{visible,infrared}/ + init.txt
    for seq in ("seq_a", "seq_b"):
        base = root / "lasher" / "TestingSet" / "testingset" / seq
        for i in range(N):
            _touch(str(base / "visible" / f"{i:05d}.jpg"))
            _touch(str(base / "infrared" / f"{i:05d}.jpg"))
        _write(str(base / "init.txt"), _gt_rows())

    # RGBT234: <seq>/{visible,infrared}/ + visible.txt / infrared.txt
    base = root / "rgbt234" / "car1"
    for i in range(N):
        _touch(str(base / "visible" / f"{i:05d}v.jpg"))
        _touch(str(base / "infrared" / f"{i:05d}i.jpg"))
    _write(str(base / "visible.txt"), _gt_rows())
    _write(str(base / "infrared.txt"), _gt_rows(start=12.0))

    # GTOT: gtot.txt listing + <seq>/{v,i}/ + groundTruth_{v,i}.txt (x1y1x2y2)
    base = root / "gtot" / "Minibus"
    for i in range(N):
        _touch(str(base / "v" / f"{i:03d}.png"))
        _touch(str(base / "i" / f"{i:03d}.png"))
    xyxy = "\n".join(f"{10+i} {20+i} {30+i} {60+i}" for i in range(N)) + "\n"
    _write(str(base / "groundTruth_v.txt"), xyxy)
    _write(str(base / "groundTruth_i.txt"), xyxy)
    _write(str(root / "gtot" / "gtot.txt"), "Minibus\n")

    # VTUAV: test_data/test_{ST,LT}_xxx/<seq>/{rgb,ir}/ + rgb.txt/ir.txt (space)
    for cls, seq in (("test_ST_car", "car_01"), ("test_LT_person", "person_01")):
        base = root / "vtuav" / "test_data" / cls / seq
        for i in range(N):
            _touch(str(base / "rgb" / f"{i:06d}.jpg"))
            _touch(str(base / "ir" / f"{i:06d}.jpg"))
        _write(str(base / "rgb.txt"), _gt_rows(delim=" "))
        _write(str(base / "ir.txt"), _gt_rows(delim=" "))

    # DepthTrack: test/<group>/<seq>/{color,depth}/ + groundtruth.txt w/ NaNs
    base = root / "depthtrack" / "test" / "adapter" / "ball_01"
    for i in range(N):
        _touch(str(base / "color" / f"{i:08d}.jpg"))
        _touch(str(base / "depth" / f"{i:08d}.png"))
    _write(str(base / "groundtruth.txt"),
           "10,20,30,40\nnan,nan,nan,nan\n12,22,32,42\n13,23,33,43\n")

    # LaSOT: <class>/<class-N>/img/%08d.jpg + gt + occlusion/oov, the fixed
    # 280-sequence Protocol-II roster
    from multi_modal_tracking_tpu.eval._benchmark_tables import (
        LASOT_TEST_SEQUENCES)
    for seq in LASOT_TEST_SEQUENCES:
        base = root / "lasot" / seq.split("-")[0] / seq
        _write(str(base / "groundtruth.txt"), _gt_rows())
        _write(str(base / "full_occlusion.txt"), "0,0,1,0\n")
        _write(str(base / "out_of_view.txt"), "0,0,0,1\n")
    for i in range(1, N + 1):
        _touch(str(root / "lasot" / "airplane" / "airplane-1" / "img" / f"{i:08d}.jpg"))

    # GOT-10k: test/list.txt + GOT-10k_Test_000001/*.jpg + groundtruth.txt
    base = root / "got10k" / "test" / "GOT-10k_Test_000001"
    for i in range(1, N + 1):
        _touch(str(base / f"{i:08d}.jpg"))
    _write(str(base / "groundtruth.txt"), _gt_rows(n=1))
    _write(str(root / "got10k" / "test" / "list.txt"), "GOT-10k_Test_000001\n")

    # GOT-10k ltrval: full-size train list; gt only for the vendored val ids
    from multi_modal_tracking_tpu.train.data.datasets.unimodal import (
        data_spec_path)
    train_names = [f"GOT-10k_Train_{i+1:06d}" for i in range(9335)]
    _write(str(root / "got10k" / "train" / "list.txt"),
           "\n".join(train_names) + "\n")
    val_ids = np.loadtxt(data_spec_path("got10k_val_split.txt"),
                         dtype=np.int64).reshape(-1)
    for i in val_ids:
        _write(str(root / "got10k" / "train" / train_names[i] / "groundtruth.txt"),
               _gt_rows(n=1))

    # TrackingNet: TEST/anno/<seq>.txt + TEST/frames/<seq>/<i>.jpg
    base = root / "trackingnet" / "TEST"
    _write(str(base / "anno" / "seq0.txt"), _gt_rows())
    for i in range(N):
        _touch(str(base / "frames" / "seq0" / f"{i}.jpg"))

    # OTB / UAV123 / NFS: real layouts are table-defined — generate every
    # annotation file with the table's row count (frames are path lists the
    # adapters never stat, so image placeholders aren't needed)
    from multi_modal_tracking_tpu.eval._benchmark_tables import (
        NFS_SEQUENCES, OTB_SEQUENCES, UAV123_SEQUENCES)
    for dset, table, delim in (("otb", OTB_SEQUENCES, ","),
                               ("uav", UAV123_SEQUENCES, ","),
                               ("nfs", NFS_SEQUENCES, "\t")):
        for (_, _, start, end, _, _, anno, _, _) in table:
            # per-file distinct values so multi-object entries differ
            _write(str(root / dset / anno),
                   _gt_rows(delim=delim, n=end - start + 1,
                            start=10.0 + sum(map(ord, anno)) % 7))

    # TC128: <seq>/<seq>_gt.txt + <seq>_frames.txt + img/%04d.jpg
    for seq, (s0, s1) in (("Airport_ce", (1, N)), ("Skating", (3, N + 4))):
        base = root / "tc128" / seq
        _write(str(base / f"{seq}_gt.txt"), _gt_rows(n=s1 - s0 + 1))
        _write(str(base / f"{seq}_frames.txt"), f"{s0},{s1}\n")
        for i in range(s0, s1 + 1):
            _touch(str(base / "img" / f"{i:04d}.jpg"))

    # TNL2k test/
    base = root / "tnl2k" / "test" / "advSamp_video"
    for i in range(1, N + 1):
        _touch(str(base / "imgs" / f"{i:05d}.png"))
    _write(str(base / "groundtruth.txt"), _gt_rows())

    paths = {f"{k}_dir": str(root / k) for k in
             ("lasher", "rgbt234", "gtot", "vtuav", "depthtrack", "lasot",
              "got10k", "trackingnet", "otb", "uav", "nfs", "tc128", "tnl2k")}
    pfile = tmp_path / "local_paths.json"
    pfile.write_text(json.dumps(paths))
    monkeypatch.setenv("MMT_LOCAL_PATHS", str(pfile))
    return root


def _load(name):
    from multi_modal_tracking_tpu.eval.datasets import load_dataset
    return load_dataset(name)


def test_lasher_layout(data_root):
    seqs = _load("lasher")
    assert [s.name for s in seqs] == ["seq_a", "seq_b"]
    s = seqs[0]
    assert len(s.frames) == N and all(os.path.isfile(f[0]) for f in s.frames)
    gt = np.asarray(s.ground_truth_rect)
    assert gt.shape == (N, 2, 4) and gt[0, 0, 0] == 10.0
    assert "visible" in s.frames[0][0] and "infrared" in s.frames[0][1]


def test_rgbt234_layout(data_root):
    s = _load("rgbt234")[0]
    gt = np.asarray(s.ground_truth_rect)
    assert gt.shape == (N, 2, 4)
    assert gt[0, 0, 0] == 10.0 and gt[0, 1, 0] == 12.0   # per-modality gt


def test_gtot_layout_converts_xyxy(data_root):
    s = _load("gtot")[0]
    assert s.name == "Minibus"
    gt = np.asarray(s.ground_truth_rect)
    # x1y1x2y2 (10,20,30,60) -> xywh (10,20,20,40)
    assert gt[0, 0].tolist() == [10.0, 20.0, 20.0, 40.0]


def test_vtuav_split_filtering(data_root):
    # class dirs sorted: test_LT_person < test_ST_car
    assert [s.name for s in _load("vtuav")] == ["person_01", "car_01"]
    assert [s.name for s in _load("vtuav_short")] == ["car_01"]
    assert [s.name for s in _load("vtuav_long")] == ["person_01"]
    s = _load("vtuav_short")[0]
    assert np.asarray(s.ground_truth_rect).shape == (N, 2, 4)


def test_depthtrack_nested_layout_and_nan_scrub(data_root):
    seqs = _load("depthtrack")
    assert [s.name for s in seqs] == ["ball_01"]
    s = seqs[0]
    gt = np.asarray(s.ground_truth_rect)
    assert np.isfinite(gt).all()                 # NaN occlusion rows scrubbed
    assert gt[1].sum() == 0.0
    assert s.depth_input and "depth" in s.frames[0][1]


def test_lasot_layout_and_visibility(data_root):
    seqs = _load("lasot")
    assert len(seqs) == 280                     # fixed Protocol-II roster
    s = seqs["airplane-1"]
    assert s.object_class == "airplane"
    assert len(s.frames) == N and s.frames[0].endswith("00000001.jpg")
    assert s.target_visible.tolist() == [1, 1, 0, 0]   # occ at 2, oov at 3


def test_got10k_layout(data_root):
    s = _load("got10k_test")[0]
    assert s.name == "GOT-10k_Test_000001"
    assert len(s.frames) == N
    assert np.asarray(s.ground_truth_rect).shape == (1, 4)   # test: first only


def test_got10k_ltrval_uses_vendored_val_ids(data_root):
    from multi_modal_tracking_tpu.train.data.datasets.unimodal import (
        data_spec_path)
    val_ids = np.loadtxt(data_spec_path("got10k_val_split.txt"),
                         dtype=np.int64).reshape(-1)
    seqs = _load("got10k_ltrval")
    assert len(seqs) == len(val_ids) == 1401
    assert seqs[0].name == f"GOT-10k_Train_{val_ids[0]+1:06d}"


def test_trackingnet_layout(data_root):
    s = _load("trackingnet")[0]
    assert len(s.frames) == N and s.frames[1].endswith("1.jpg")
    assert np.asarray(s.ground_truth_rect).shape == (N, 4)


def test_tnl2k_layout(data_root):
    s = _load("tnl2k")[0]
    assert s.name == "advSamp_video" and len(s.frames) == N
    assert np.asarray(s.ground_truth_rect)[0, 0] == 10.0


@pytest.mark.parametrize("name,n_seqs", [("otb", 100), ("uav", 123), ("nfs", 100)])
def test_table_benchmarks_full_roster(data_root, name, n_seqs):
    """Table mode: the full benchmark roster constructs, every sequence has
    frames == gt rows - initOmit with table-derived paths."""
    from multi_modal_tracking_tpu.eval._benchmark_tables import (
        NFS_SEQUENCES, OTB_SEQUENCES, UAV123_SEQUENCES)
    table = {"otb": OTB_SEQUENCES, "uav": UAV123_SEQUENCES,
             "nfs": NFS_SEQUENCES}[name]
    seqs = _load(name)
    assert len(seqs) == n_seqs
    rows = {r[0]: r for r in table}
    for s in seqs:
        _, path, start, end, nz, ext, _, _, omit = rows[s.name]
        assert len(s.frames) == end - start + 1 - omit
        assert s.frames[0].endswith(f"{start + omit:0{nz}d}.{ext}")
        assert os.path.join(*path.split("/")) in s.frames[0]
        assert np.asarray(s.ground_truth_rect).shape == (len(s.frames), 4)


def test_otb_init_omit_and_multi_object(data_root):
    seqs = {s.name: s for s in _load("otb")}
    # Tiger1 init-omit 5: frames start at 6, gt rows sliced to match
    t = seqs["Tiger1"]
    assert t.frames[0].endswith("0006.jpg")
    assert np.asarray(t.ground_truth_rect).shape[0] == len(t.frames)
    # Jogging/Skating2 expose two objects over the same image directory
    assert "Jogging_1" in seqs and "Jogging_2" in seqs
    assert os.path.dirname(seqs["Jogging_1"].frames[0]) == \
        os.path.dirname(seqs["Jogging_2"].frames[0])
    assert not np.array_equal(np.asarray(seqs["Jogging_1"].ground_truth_rect),
                              np.asarray(seqs["Jogging_2"].ground_truth_rect))


def test_uav123_shared_dir_slices(data_root):
    seqs = {s.name: s for s in _load("uav")}
    # person4_1/person4_2 are frame-range slices of one image dir — the
    # structural case directory-globbing cannot express
    pairs = [(a, b) for a in seqs for b in seqs
             if a < b and os.path.dirname(seqs[a].frames[0]) ==
             os.path.dirname(seqs[b].frames[0])]
    assert pairs, "expected shared-directory sliced sequences in UAV123"
    a, b = pairs[0]
    fa = {os.path.basename(f) for f in seqs[a].frames}
    fb = {os.path.basename(f) for f in seqs[b].frames}
    assert fa != fb


def test_tc128_range_layout_and_ce_filter(data_root):
    seqs = {s.name: s for s in _load("tc128")}
    assert set(seqs) == {"Airport_ce", "Skating"}
    sk = seqs["Skating"]                      # frame range 3..N+4
    assert sk.frames[0].endswith(os.path.join("img", "0003.jpg"))
    assert len(sk.frames) == N + 2
    assert np.asarray(sk.ground_truth_rect).shape == (N + 2, 4)
    assert [s.name for s in _load("tc128ce")] == ["Airport_ce"]


def test_tc128_missing_frames_file_falls_back_to_img_listing(data_root):
    """A sequence with a *_gt.txt but no *_frames.txt must enumerate img/
    instead of raising IndexError (partial/nonstandard TC-128 layouts)."""
    os.remove(str(data_root / "tc128" / "Skating" / "Skating_frames.txt"))
    seqs = {s.name: s for s in _load("tc128")}
    sk = seqs["Skating"]
    assert len(sk.frames) == N + 2            # all img/*.jpg files, sorted
    assert sk.frames[0].endswith(os.path.join("img", "0003.jpg"))


def test_simple_layout_fallback(tmp_path, monkeypatch):
    """Without the table layout, OTB/UAV/NFS fall back to generic
    <seq>/img + groundtruth_rect.txt globbing."""
    root = tmp_path / "alt"
    for name, seq in (("otb", "MySeq"), ("uav", "flight1"), ("nfs", "clip")):
        base = root / name / seq
        for i in range(1, N + 1):
            _touch(str(base / "img" / f"{i:04d}.jpg"))
        _write(str(base / "groundtruth_rect.txt"), _gt_rows())
    pfile = tmp_path / "alt_paths.json"
    pfile.write_text(json.dumps({f"{k}_dir": str(root / k)
                                 for k in ("otb", "uav", "nfs")}))
    monkeypatch.setenv("MMT_LOCAL_PATHS", str(pfile))
    for name, seq in (("otb", "MySeq"), ("uav", "flight1"), ("nfs", "clip")):
        seqs = _load(name)
        assert [s.name for s in seqs] == [seq]
        assert len(seqs[0].frames) == N


@pytest.mark.parametrize("style", ["nulls", "missing"])
def test_unconfigured_paths_yield_empty_rosters(tmp_path, monkeypatch, style):
    """Unset dataset paths — whether the local_paths file is absent or holds
    explicit nulls — must yield EMPTY rosters for every registry adapter
    (no CWD globbing, no TypeError from os.path.join(None, ...))."""
    from multi_modal_tracking_tpu.eval.datasets import dataset_dict, load_dataset
    from multi_modal_tracking_tpu.train.admin import _DEFAULT_KEYS
    pfile = tmp_path / "none_paths.json"
    if style == "nulls":
        pfile.write_text(json.dumps({k: None for k in _DEFAULT_KEYS}))
    monkeypatch.setenv("MMT_LOCAL_PATHS", str(pfile))
    monkeypatch.chdir(tmp_path)          # a CWD glob would still find nothing
    (tmp_path / "decoy" / "img").mkdir(parents=True)  # ...except this decoy
    skip = {"lasot_lmdb",                # require()d lmdb path raises by design
            "synthetic_rgbt", "synthetic_rgb",
            "synthetic_rgbt_hard"}               # generated, no disk paths
    for name in dataset_dict:
        if name in skip:
            continue
        assert len(load_dataset(name)) == 0, name
