"""Every experiment YAML must pass the strict config overlay.

Parity: the reference's _update_config raises on unknown keys
(lib/config/*/config.py:124-135); this walks experiments/<script>/*.yaml
and overlays each onto its script's default tree, plus the tracking-time
overlays (tracking.yaml, tracking_vis.yaml) used by eval/params.py.
"""
import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXP = os.path.join(REPO, "experiments")

ALL_YAMLS = sorted(glob.glob(os.path.join(EXP, "*", "*.yaml")))


def test_yaml_tree_nonempty():
    assert len(ALL_YAMLS) >= 60
    scripts = {os.path.basename(os.path.dirname(p)) for p in ALL_YAMLS}
    assert {"asymmetric_shared", "asymmetric_shared_ce", "asymmetric_shared_online",
            "mixformer_cvt", "mixformer_vit", "mixformer_convmae",
            "mixformer_vit_rgbt", "mixformer_vit_rgbt_shared",
            "mixformer_vit_rgbt_unibackbone"} <= scripts


@pytest.mark.parametrize("path", ALL_YAMLS,
                         ids=[os.path.relpath(p, EXP) for p in ALL_YAMLS])
def test_yaml_strict_overlay(path):
    from multi_modal_tracking_tpu.config import get_default_config
    script = os.path.basename(os.path.dirname(path))
    cfg = get_default_config(script)
    cfg.update_from_file(path)
    assert cfg.DATA.SEARCH.SIZE % 16 == 0


def test_tracking_overlays():
    from multi_modal_tracking_tpu.eval.params import get_parameters
    p = get_parameters("asymmetric_shared_ce", "baseline", tracking_yaml="tracking")
    assert p.search_size == p.cfg.TEST.SEARCH_SIZE
    pv = get_parameters("asymmetric_shared", "baseline", tracking_yaml="tracking_vis")
    assert pv.cfg.TEST.LOAD_FROME_TRAIN_RESULT
    assert pv.cfg.TEST.SEARCH_CENTER_JITTER == 4.0
    assert pv.cfg.TEST.TEMPLATE_SCALE_JITTER == 0.15


def test_unknown_key_rejected(tmp_path):
    from multi_modal_tracking_tpu.config import get_default_config
    bad = tmp_path / "bad.yaml"
    bad.write_text("MODEL:\n  NO_SUCH_KEY: 1\n")
    cfg = get_default_config("mixformer_vit")
    with pytest.raises((KeyError, ValueError)):
        cfg.update_from_file(str(bad))
