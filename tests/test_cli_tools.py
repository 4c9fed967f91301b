"""CLI utility surface: video converters, comparison videos, cross-dataset
tables, Chinese-labelled plots."""
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_imgs2video_video2imgs_roundtrip(tmp_path):
    from tracking.imgs2video import imgs2video
    from tracking.video2imgs import video2imgs
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for k in range(6):
        cv2.imwrite(str(img_dir / f"{k}.jpg"),
                    rng.integers(0, 255, (64, 80, 3), np.uint8))
    video = imgs2video(str(img_dir), str(tmp_path / "v.mp4"), fps=5)
    assert os.path.getsize(video) > 0
    n = video2imgs(video, str(tmp_path / "back"))
    assert n == 6
    assert len(os.listdir(tmp_path / "back")) == 6


def test_gen_video_cli(tmp_path):
    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    dataset = get_dataset("synthetic_rgbt")
    seq = dataset[0]
    res = tmp_path / "trk" / "synthetic_rgbt"
    res.mkdir(parents=True)
    gt = np.asarray(seq.ground_truth_rect)[:, 0]
    np.savetxt(str(res / f"{seq.name}.txt"), gt, delimiter="\t", fmt="%.2f")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tracking", "gen_video.py"),
         "--dataset_name", "synthetic_rgbt", "--sequence", seq.name,
         "--results", f"mine={tmp_path / 'trk'}",
         "--out_dir", str(tmp_path / "vids"), "--modality", "ir"],
        capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert out.returncode == 0, out.stderr
    assert any(f.endswith(".mp4") for f in os.listdir(tmp_path / "vids"))


def test_crossdatasets_cli(tmp_path):
    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    dataset = get_dataset("synthetic_rgbt")
    res = tmp_path / "trkA" / "synthetic_rgbt"
    res.mkdir(parents=True)
    for seq in dataset:
        gt = np.asarray(seq.ground_truth_rect)[:, 0]
        np.savetxt(str(res / f"{seq.name}.txt"), gt, delimiter="\t", fmt="%.2f")
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tracking", "analysis_results_crossdatasets.py"),
         "--datasets_name", "synthetic_rgbt",
         "--results_glob", str(tmp_path / "trk*")],
        capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert out.returncode == 0, out.stderr
    assert "AUC/Precision" in out.stdout
    assert "synthetic_rgbt" in out.stdout


def test_plot_results_cn(tmp_path):
    from multi_modal_tracking_tpu.eval.analysis import TrackerResults, plot_results
    from multi_modal_tracking_tpu.eval.datasets import get_dataset
    dataset = get_dataset("synthetic_rgbt")
    res = tmp_path / "trk"
    res.mkdir()
    for seq in dataset:
        gt = np.asarray(seq.ground_truth_rect)[:, 0]
        np.savetxt(str(res / f"{seq.name}.txt"), gt, delimiter="\t", fmt="%.2f")
    files = plot_results([TrackerResults(str(res), "mine")], dataset, "synth_cn",
                         result_plot_path=str(tmp_path / "plots"), language="cn")
    assert files and all(os.path.getsize(f) > 0 for f in files)


def test_profile_model_tiny(capsys):
    """profile_model CLI: params/FLOPs/latency on a tiny geometry (CPU)."""
    import importlib
    mod = importlib.import_module("tracking.profile_model")
    mod.profile("mixformer_vit", search_size=64, template_size=32, repeats=2)
    out = capsys.readouterr().out
    assert "params:" in out and "forward FLOPs:" in out and "ms/frame" in out


def test_test_cli_main_synthetic(monkeypatch, tmp_path):
    """Drive the full tracking/test.py main() (runner + result files) on the
    synthetic RGBT dataset with a tiny model geometry."""
    import sys
    import importlib
    import multi_modal_tracking_tpu.eval.params as P
    real_get = P.get_parameters

    def tiny_get(script, *a, **k):
        p = real_get(script, None, None, checkpoint=k.get("checkpoint"))
        c = p.cfg
        c.DATA.SEARCH.SIZE = 64
        c.DATA.TEMPLATE.SIZE = 32
        c.TEST.SEARCH_SIZE = 64
        c.TEST.TEMPLATE_SIZE = 32
        c.MODEL.FUSION_LAYERS = 1
        p.template_size, p.search_size = 32, 64
        return p

    monkeypatch.setattr(P, "get_parameters", tiny_get)
    mod = importlib.import_module("tracking.test")
    argv = ["test.py", "asymmetric_shared_ce",
            "--dataset_name", "synthetic_rgbt",
            "--results_dir", str(tmp_path / "res"), "--chunk", "16"]
    monkeypatch.setattr(sys, "argv", argv)
    mod.main()
    import glob as g
    txts = g.glob(str(tmp_path / "res" / "synthetic_rgbt" / "*.txt"))
    assert len(txts) >= 3          # bbox (+time/score) files per sequence


def test_all_cli_modules_import():
    """Every tracking/*.py CLI must import cleanly and expose main()
    (catches import rot in rarely-driven tools)."""
    import glob as g
    import importlib
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mods = sorted(os.path.basename(p)[:-3]
                  for p in g.glob(os.path.join(repo, "tracking", "*.py")))
    assert len(mods) >= 20
    for name in mods:
        mod = importlib.import_module(f"tracking.{name}")
        assert hasattr(mod, "main"), f"tracking/{name}.py has no main()"


def test_run_classic_cli_dimp_synthetic(tmp_path):
    """Drive tracking/run_classic.py main() (DiMP, learned modules, tiny
    geometry) over the synthetic RGB eval set."""
    import glob as g
    import importlib
    mod = importlib.import_module("tracking.run_classic")
    mod.main(["dimp", "--dataset_name", "synthetic_rgb",
              "--results_dir", str(tmp_path / "res"),
              "--params", "crop_size=96", "refine=false", "memory_size=16",
              "update_interval=8", "init_opt_iter=3"])
    txts = [t for t in g.glob(str(tmp_path / "res" / "synthetic_*.txt"))
            if not t.endswith(("_time.txt", "_score.txt"))]
    assert len(txts) == 3
    boxes = np.loadtxt(txts[0], delimiter="\t")
    assert boxes.shape[1] == 4 and np.isfinite(boxes).all()
