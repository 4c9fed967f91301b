"""Native C runtime (libmmtrk.so) vs the Python/cv2 oracles.

Mirrors the reference's kernel test strategy (CUDA vs pure-PyTorch,
SURVEY §4): JPEG decode vs cv2, JET LUT bit-exact vs the Python LUT,
sample_target crop within 1 LSB of the cv2 pipeline with an identical pad
mask. Skips when the toolchain can't build the library."""
import numpy as np
import pytest

from multi_modal_tracking_tpu import native

cv2 = pytest.importorskip("cv2")
pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libmmtrk.so not built/available")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_decode_jpeg_matches_cv2(tmp_path_factory, rng):
    tmp = tmp_path_factory.mktemp("jpg")
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    p = str(tmp / "t.jpg")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95])
    ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
    got = native.decode_jpeg(p)
    assert got.shape == ref.shape
    assert int(np.abs(ref.astype(int) - got.astype(int)).max()) == 0


def test_decode_batch_threaded(tmp_path_factory, rng):
    tmp = tmp_path_factory.mktemp("batch")
    paths = []
    for k in range(6):
        p = str(tmp / f"t{k}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (100 + k, 160, 3), np.uint8))
        paths.append(p)
    paths.append(str(tmp / "missing.jpg"))
    buf, hs, ws = native.decode_jpeg_batch(paths, 128, 160, num_threads=3)
    assert hs.tolist()[:6] == [100 + k for k in range(6)]
    assert hs[6] == 0                      # failed decode reported, not fatal
    ref = cv2.cvtColor(cv2.imread(paths[2]), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(buf[2, :102, :160], ref)


def test_jet_exact(rng):
    from multi_modal_tracking_tpu.ops.colormap import apply_jet_np
    gray = rng.integers(0, 255, (64, 64), np.uint8)
    assert np.array_equal(cv2.applyColorMap(gray, cv2.COLORMAP_JET),
                          native.apply_jet(gray))
    img3 = rng.integers(0, 255, (64, 64, 3), np.uint8)
    assert np.array_equal(apply_jet_np(img3), native.apply_jet(img3))


def test_sample_target_parity(rng):
    from multi_modal_tracking_tpu.train.data.processing_utils import sample_target
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    for box in ([50.0, 40, 60, 50], [-10.0, 200, 80, 70], [280.0, 10, 60, 40],
                [10.0, 10, 15, 300]):
        ref_c, ref_rf, ref_m = sample_target(img, box, 4.5, 144)
        out = native.sample_target(img, box, 4.5, 144)
        assert out is not None
        got_c, got_rf, got_m = out
        assert abs(ref_rf - got_rf) < 1e-12
        assert int(np.abs(ref_c.astype(int) - got_c.astype(int)).max()) <= 1
        assert np.array_equal(ref_m, got_m)
