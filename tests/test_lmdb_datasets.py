"""LMDB dataset twins against an injected in-memory fake environment
(the `lmdb` package is optional; lmdb_utils caches env handles per path,
so tests pre-populate the cache with a dict-backed fake)."""
import json

import cv2
import numpy as np
import pytest

from multi_modal_tracking_tpu.utils import lmdb_utils
from multi_modal_tracking_tpu.train.data.datasets.lmdb_twins import (
    COCOSeqLmdb, GOT10kLmdb, ImagenetVIDLmdb, LaSOTLmdb, TrackingNetLmdb)


class _FakeTxn:
    def __init__(self, store):
        self._store = store

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def get(self, key):
        return self._store.get(key.decode())


class _FakeEnv:
    def __init__(self, store):
        self._store = store

    def begin(self, write=False):
        return _FakeTxn(self._store)


def _jpg(rng, h=40, w=60):
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


@pytest.fixture
def fake_db(monkeypatch):
    stores = {}

    def install(path, store):
        stores[path] = store
        lmdb_utils._env_cache[path] = _FakeEnv(store)

    yield install
    for p in stores:
        lmdb_utils._env_cache.pop(p, None)


def test_lasot_lmdb(fake_db):
    rng = np.random.default_rng(0)
    seq = "cat/cat-1"
    store = {
        "list.txt": b"cat/cat-1\n",
        f"{seq}/groundtruth.txt": b"10,20,30,40\n12,22,28,38\n",
        f"{seq}/full_occlusion.txt": b"0,0",
        f"{seq}/out_of_view.txt": b"0,1",
        f"{seq}/img/00000001.jpg": _jpg(rng),
        f"{seq}/img/00000002.jpg": _jpg(rng),
    }
    fake_db("/fake/lasot", store)
    ds = LaSOTLmdb(root="/fake/lasot")
    assert ds.get_num_sequences() == 1
    info = ds.get_sequence_info(0)
    np.testing.assert_array_equal(info["bbox"][0], [10, 20, 30, 40])
    np.testing.assert_array_equal(info["visible"], [True, False])
    frames, anno, _ = ds.get_frames(0, [0, 1], info)
    assert len(frames) == 2 and frames[0].shape == (40, 60, 3)
    np.testing.assert_array_equal(anno["bbox"][1], [12, 22, 28, 38])


def test_got10k_lmdb_with_split(fake_db):
    rng = np.random.default_rng(1)
    store = {
        "train/list.txt": b"seq_a\nseq_b\n",
        "train/vottrain_split.txt": b"1\n",
        "train/seq_b/groundtruth.txt": b"5,6,7,8\n",
        "train/seq_b/absence.label": b"0\n",
        "train/seq_b/cover.label": b"7\n",
        "train/seq_b/00000001.jpg": _jpg(rng),
    }
    fake_db("/fake/got10k", store)
    ds = GOT10kLmdb(root="/fake/got10k", split="vottrain")
    assert ds.sequence_list == ["seq_b"]
    info = ds.get_sequence_info(0)
    assert info["visible"][0]
    frames, _, _ = ds.get_frames(0, [0], info)
    assert frames[0].dtype == np.uint8


def test_trackingnet_lmdb(fake_db):
    rng = np.random.default_rng(2)
    fake_db("/fake/tn/TRAIN_0_lmdb", {
        "list.txt": b"vid1\n",
        "anno/vid1.txt": b"1,2,3,4\n5,6,7,8\n",
        "frames/vid1/0.jpg": _jpg(rng),
        "frames/vid1/1.jpg": _jpg(rng),
    })
    ds = TrackingNetLmdb(root="/fake/tn", set_ids=[0])
    assert ds.get_num_sequences() == 1
    frames, anno, _ = ds.get_frames(0, [1])
    np.testing.assert_array_equal(anno["bbox"][0], [5, 6, 7, 8])


def test_coco_lmdb(fake_db):
    rng = np.random.default_rng(3)
    d = {"images": [{"id": 7, "file_name": "im7.jpg"}],
         "annotations": [{"image_id": 7, "bbox": [3, 4, 5, 6], "iscrowd": 0}]}
    fake_db("/fake/coco", {
        "annotations/instances_train2017.json": json.dumps(d).encode(),
        "images/train2017/im7.jpg": _jpg(rng),
    })
    ds = COCOSeqLmdb(root="/fake/coco")
    assert ds.get_num_sequences() == 1
    frames, anno, _ = ds.get_frames(0, [0, 0, 0])
    assert len(frames) == 3
    np.testing.assert_array_equal(anno["bbox"][0], [3, 4, 5, 6])


def test_vid_lmdb(fake_db):
    rng = np.random.default_rng(4)
    cache = [{"bbox": [[1, 2, 3, 4]], "frames": ["f/0.jpg"], "visible": [True]}]
    fake_db("/fake/vid", {
        "cache.json": json.dumps(cache).encode(),
        "f/0.jpg": _jpg(rng),
    })
    ds = ImagenetVIDLmdb(root="/fake/vid")
    info = ds.get_sequence_info(0)
    assert info["visible"][0]
    frames, _, _ = ds.get_frames(0, [0], info)
    assert frames[0].shape == (40, 60, 3)


def test_registry_names():
    from multi_modal_tracking_tpu.train.builders import names2datasets
    with pytest.raises(Exception):
        # no fake env installed and no local paths -> must raise, not return
        names2datasets(["LASOT_lmdb"])


def test_lasot_lmdb_eval_dataset(fake_db, tmp_path):
    """Eval-side lasot_lmdb registry entry: sequences built from lmdb keys,
    frames as (db, key) pairs decodable by the runner's frame loader
    (lib/test/evaluation/lasot_lmdbdataset.py)."""
    rng = np.random.default_rng(5)
    root = str(tmp_path / "lasot_lmdb")
    seq = "dog/dog-3"
    n = 4
    store = {
        "list.txt": f"{seq}\n".encode(),
        f"{seq}/groundtruth.txt": ("\n".join("10,20,30,40" for _ in range(n)) + "\n").encode(),
        f"{seq}/full_occlusion.txt": ",".join("0" for _ in range(n)).encode(),
        f"{seq}/out_of_view.txt": ("0," * (n - 1) + "1").encode(),
    }
    for i in range(1, n + 1):
        store[f"{seq}/img/{i:08d}.jpg"] = _jpg(rng)
    fake_db(root, store)

    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    from multi_modal_tracking_tpu.eval.datasets_rgb import LaSOTLmdbDataset
    seqs = LaSOTLmdbDataset(root=root).get_sequence_list()
    assert len(seqs) == 1
    s = seqs["dog-3"]
    assert s.ground_truth_rect.shape == (n, 4)
    assert s.target_visible.tolist() == [1, 1, 1, 0]

    from multi_modal_tracking_tpu.eval.running import _load_frame
    img = _load_frame(s, 0)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8

    # registry name resolves (constructor needs the configured path, so just
    # assert it's present and errors cleanly without one)
    from multi_modal_tracking_tpu.eval.datasets import dataset_dict
    assert "lasot_lmdb" in dataset_dict
