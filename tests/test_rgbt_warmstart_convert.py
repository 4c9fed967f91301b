"""Warm-start conversion wiring for the plain vit_rgbt families.

The reference initialises its RGBT models from an RGB-pretrained unimodal
MixFormer checkpoint: two-stream duplicates backbone.* into
backbone_v/backbone_i (mixformer_vit_rgbt/mixformer.py:447-460), the shared
families duplicate block LNs into _v/_i pairs (asymmetric_shared.py:307-333).
These tests drive those exact load paths end-to-end: the unimodal torch
oracle's state dict (tests/test_torch_convert.py — the reference's parameter
naming) is expanded and converted into each RGBT family, and every backbone
and head parameter must be consumed; only the fusion module (trained from
scratch in the reference) may remain at init.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.test_torch_convert import DIM, HEADS, S_SZ, T_SZ, _Oracle  # noqa: E402

from multi_modal_tracking_tpu.models.asymmetric_shared import RGBTSpec  # noqa: E402
from multi_modal_tracking_tpu.models.vit_rgbt import (  # noqa: E402
    MixFormerViTRGBT, VitRGBTSpec)
from multi_modal_tracking_tpu.utils.torch_convert import (  # noqa: E402
    convert_state_dict, expand_modality_lns, expand_two_stream)


def _tiny_model(variant):
    # Geometry matched to the unimodal torch oracle (head channels = DIM so
    # the oracle's Corner head weights are shape-compatible).
    base = RGBTSpec(search_size=S_SZ, template_size=T_SZ, embed_dim=DIM,
                    depth=2, num_heads=HEADS, head_dim=DIM, fusion_layers=1,
                    drop_path_rate=0.0)
    return MixFormerViTRGBT(spec=VitRGBTSpec(base=base, variant=variant))


def _init_variables(model):
    t = jnp.zeros((2, T_SZ, T_SZ, 3), jnp.float32)
    s = jnp.zeros((2, S_SZ, S_SZ, 3), jnp.float32)
    return jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)


def _convertible_missing(report):
    """Paths legitimately absent from an RGB warm start: the fusion module
    (random-init in the reference too) and non-checkpoint buffers."""
    return [m for m in report["missing"]
            if "fusion_vi" not in m and "score" not in m]


@pytest.mark.parametrize("variant,expand", [
    ("two_stream", expand_two_stream),
    ("unibackbone", lambda sd: sd),
])
def test_rgb_warmstart_covers_backbones(variant, expand):
    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in _Oracle().eval().state_dict().items()}
    sd = expand(sd)

    model = _tiny_model(variant)
    variables = _init_variables(model)
    converted, report = convert_state_dict(sd, variables, verbose=False)

    leftovers = _convertible_missing(report)
    assert leftovers == [], leftovers
    # spot-check the duplication actually landed in both streams
    if variant == "two_stream":
        p = converted["params"]
        v0 = np.asarray(jax.tree_util.tree_leaves(p["backbone_v"])[0])
        i0 = np.asarray(jax.tree_util.tree_leaves(p["backbone_i"])[0])
        np.testing.assert_array_equal(v0, i0)


def test_mae_ln_expansion_covers_shared_backbone():
    """shared variant: block norm1/norm2 become norm{1,2}_{v,i} pairs."""
    torch.manual_seed(0)
    sd = {k: v.numpy() for k, v in _Oracle().eval().state_dict().items()}
    sd = expand_modality_lns(sd)

    model = _tiny_model("shared")
    variables = _init_variables(model)
    converted, report = convert_state_dict(sd, variables, verbose=False)
    leftovers = _convertible_missing(report)
    assert leftovers == [], leftovers
    p = converted["params"]["backbone"]["blocks_0"]
    np.testing.assert_array_equal(np.asarray(p["norm1_v"]["scale"]),
                                  np.asarray(p["norm1_i"]["scale"]))


@pytest.mark.parametrize("variant", ["two_stream", "shared"])
def test_load_variables_autoexpands_unimodal_pth(tmp_path, variant):
    """The trainer warm-start path (utils/checkpoint.load_variables) applies
    the reference's key expansion automatically when a unimodal .pth.tar is
    loaded into an RGBT model (asymmetric_shared_ce.py:643-661)."""
    from multi_modal_tracking_tpu.utils.checkpoint import load_variables

    torch.manual_seed(0)
    oracle = _Oracle().eval()
    path = str(tmp_path / "mixformer_vit_base_online.pth.tar")
    torch.save({"net": oracle.state_dict()}, path)

    model = _tiny_model(variant)
    variables = _init_variables(model)
    loaded = load_variables(path, variables)

    if variant == "two_stream":
        v = np.asarray(loaded["params"]["backbone_v"]["blocks_0"]["norm1"]["scale"])
        i = np.asarray(loaded["params"]["backbone_i"]["blocks_0"]["norm1"]["scale"])
    else:
        blk = loaded["params"]["backbone"]["blocks_0"]
        v = np.asarray(blk["norm1_v"]["scale"])
        i = np.asarray(blk["norm1_i"]["scale"])
    expect = oracle.state_dict()["backbone.blocks.0.norm1.weight"].numpy()
    np.testing.assert_array_equal(v, expect)
    np.testing.assert_array_equal(i, expect)
    # head weights ride along (the reference loads box_head.* too)
    tl0 = np.asarray(jax.tree_util.tree_leaves(
        loaded["params"]["box_head"])[0])
    assert np.isfinite(tl0).all()


@pytest.mark.parametrize("variant", ["two_stream", "shared"])
def test_load_variables_handles_bare_mae_dict(tmp_path, variant):
    """MAE pretrain checkpoints ({"model": ...} envelope, bare blocks.N keys,
    pos_embed/mask_token junk) load into the backbone like the reference's
    get_mixformer_vit (asymmetric_shared_ce.py:515-533)."""
    from multi_modal_tracking_tpu.utils.checkpoint import load_variables

    torch.manual_seed(0)
    sd = _Oracle().eval().state_dict()
    mae = {k[len("backbone."):]: v for k, v in sd.items()
           if k.startswith("backbone.") and not k.startswith("backbone.pe_")}
    mae["pos_embed"] = torch.zeros(1, 5, DIM)       # dropped on load
    mae["mask_token"] = torch.zeros(1, 1, DIM)
    mae["cls_token"] = torch.zeros(1, 1, DIM)       # skipped (vit.cls_token=None)
    path = str(tmp_path / "mae_pretrain_vit_base.pth")
    torch.save({"model": mae}, path)

    model = _tiny_model(variant)
    variables = _init_variables(model)
    loaded = load_variables(path, variables)

    expect = sd["backbone.blocks.0.norm1.weight"].numpy()
    if variant == "two_stream":
        for stream in ("backbone_v", "backbone_i"):
            np.testing.assert_array_equal(
                np.asarray(loaded["params"][stream]["blocks_0"]["norm1"]["scale"]),
                expect)
    else:
        blk = loaded["params"]["backbone"]["blocks_0"]
        np.testing.assert_array_equal(np.asarray(blk["norm1_v"]["scale"]), expect)
        np.testing.assert_array_equal(np.asarray(blk["norm1_i"]["scale"]), expect)
