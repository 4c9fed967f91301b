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


def test_tracking_overlay_auto_matches_reference_parameter_files():
    """Reference unimodal parameter files never overlay tracking.yaml
    (lib/test/parameter/mixformer_cvt.py:12 loads only the training YAML);
    the RGBT ones do (asymmetric_shared_ce.py:14-15). 'auto' reproduces
    that split."""
    from multi_modal_tracking_tpu.eval.params import get_parameters
    # RGBT: tracking.yaml wins (SEARCH_FACTOR 4.5 over the default 5.0)
    p = get_parameters("asymmetric_shared_ce", "baseline")
    assert p.search_factor == 4.5
    # unimodal CvT: keeps the script's own 320/5.0 (no overlay)
    p = get_parameters("mixformer_cvt")
    assert p.search_size == 320 and p.search_factor == 5.0
    # explicit overlay still available
    p = get_parameters("mixformer_cvt", tracking_yaml="tracking")
    assert p.search_size == 288 and p.search_factor == 4.5


def test_unknown_key_rejected(tmp_path):
    from multi_modal_tracking_tpu.config import get_default_config
    bad = tmp_path / "bad.yaml"
    bad.write_text("MODEL:\n  NO_SUCH_KEY: 1\n")
    cfg = get_default_config("mixformer_vit")
    with pytest.raises((KeyError, ValueError)):
        cfg.update_from_file(str(bad))


SCRIPTS = ["mixformer_vit", "mixformer_vit_online", "mixformer_cvt",
           "mixformer_cvt_online", "mixformer_convmae", "mixformer_convmae_online",
           "mixformer_vit_rgbt", "mixformer_vit_rgbt_shared",
           "mixformer_vit_rgbt_unibackbone", "asymmetric_shared",
           "asymmetric_shared_ce", "asymmetric_shared_online"]


@pytest.mark.parametrize("script", SCRIPTS)
def test_build_model_all_scripts(script):
    """Every script's default config builds a model whose forward traces
    (abstract eval — no FLOPs spent) with the right output shape."""
    import jax
    import jax.numpy as jnp
    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.eval.evaltracker import is_rgbt_script
    from multi_modal_tracking_tpu.models.build import build_model

    cfg = get_default_config(script)
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32
    if "FUSION_LAYERS" in cfg.MODEL:
        cfg.MODEL.FUSION_LAYERS = 1
    model = build_model(script, cfg)
    lead = 2 if is_rgbt_script(script) else 1
    t = jnp.zeros((lead, 32, 32, 3), jnp.float32)
    s = jnp.zeros((lead, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), t, t, s)
    out = jax.eval_shape(
        lambda v, a, b, c: model.apply(v, a, b, c), variables, t, t, s)
    assert out["pred_boxes"].shape[-1] == 4
