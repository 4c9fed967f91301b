"""Reference-import parity for the REST of the model zoo.

tests/test_reference_import_parity.py retires transcription risk for the
flagship; this module does the same for the other families: each case
imports the genuine reference model file, builds it with the reference's
own config loader + a real experiment YAML, converts the state dict through
utils/torch_convert into the model our build_model() registry produces for
the same script name, and requires matching boxes on a random batch.

Covered: unimodal ViT / CvT / ConvMAE, RGBT two-stream / shared /
uni-backbone, asymmetric_shared (non-CE), and the four SPM score-branch
online variants (pred_scores on the predicted-box path must match too).
(CE flagship + CE mask modes in test_reference_import_parity.py.)
"""
import importlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.models.build import build_model
from multi_modal_tracking_tpu.utils.torch_convert import convert_state_dict

from tests import reference_oracle

B = 1
_BUFFERS = ("pos_embed", "cx", "cy", "coord_x", "coord_y",
            "num_batches_tracked", "indice")

# script -> (reference module, build fn, experiment yaml, bimodal?)
FAMILIES = {
    "mixformer_vit": ("lib.models.mixformer_vit.mixformer",
                      "build_mixformer_vit", "baseline", False),
    "mixformer_cvt": ("lib.models.mixformer_cvt.mixformer",
                      "build_mixformer_cvt", "baseline", False),
    "mixformer_convmae": ("lib.models.mixformer_convmae.mixformer",
                          "build_mixformer_convmae", "baseline", False),
    "mixformer_vit_rgbt": ("lib.models.mixformer_vit_rgbt.mixformer",
                           "build_mixformer_vit_rgbt",
                           "attention_lasher_newfusion_2layer", True),
    "mixformer_vit_rgbt_shared": ("lib.models.mixformer_vit_rgbt.mixformer_shared",
                                  "build_mixformer_vit_rgbt_shared",
                                  "attention_lasher_newfusion_2layer_lnspecific",
                                  True),
    "mixformer_vit_rgbt_unibackbone": ("lib.models.mixformer_vit_rgbt.mixformer_unibackbone",
                                       "build_mixformer_vit_rgbt_uni",
                                       "attention_lasher_newfusion_2layer",
                                       True),
    "asymmetric_shared": ("lib.models.mixformer_vit_rgbt.asymmetric_shared",
                          "build_asymmetric_shared",
                          "attention_lasher_newfusion_2layer", True),
    # SPM score-branch (online) variants: forward with run_score_head=True
    # must also match pred_scores
    "mixformer_vit_online": ("lib.models.mixformer_vit.mixformer_online",
                             "build_mixformer_vit_online_score",
                             "baseline", False),
    "mixformer_cvt_online": ("lib.models.mixformer_cvt.mixformer_online",
                             "build_mixformer_cvt_online_score",
                             "baseline", False),
    "mixformer_convmae_online": ("lib.models.mixformer_convmae.mixformer_online",
                                 "build_mixformer_convmae_online_score",
                                 "baseline", False),
    "asymmetric_shared_online": ("lib.models.mixformer_vit_rgbt.asymmetric_shared_online",
                                 "build_asymmetric_shared_online_score",
                                 "attention_lasher_newfusion_2layer", True),
}

_SCORE = tuple(s for s in FAMILIES if s.endswith("online"))


def _build_pair(script):
    mod_name, fn_name, yaml_name, bimodal = FAMILIES[script]
    reference_oracle.install()
    mod = importlib.import_module(mod_name)
    ref_cfg = reference_oracle.load_reference_config(script, yaml_name)
    ref_cfg.MODEL.BACKBONE.PRETRAINED = False        # no ckpt files here
    torch.manual_seed(0)
    build = getattr(mod, fn_name)
    try:
        oracle = build(ref_cfg, train=False)
    except TypeError:                                # build_mixformer_cvt(cfg)
        oracle = build(ref_cfg)
    oracle = oracle.eval()
    with torch.no_grad():
        for m in oracle.modules():                   # exercise BN-stat convert
            if hasattr(m, "running_mean") and isinstance(
                    getattr(m, "running_mean"), torch.Tensor):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.5)

    from multi_modal_tracking_tpu.eval.params import get_parameters
    cfg = get_parameters(script, yaml_name).cfg
    assert cfg.DATA.SEARCH.SIZE == ref_cfg.DATA.SEARCH.SIZE
    assert cfg.DATA.TEMPLATE.SIZE == ref_cfg.DATA.TEMPLATE.SIZE
    model = build_model(script, cfg)
    T, S = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
    nb = 2 * B if bimodal else B
    tz = jnp.zeros((nb, T, T, 3), jnp.float32)
    sz = jnp.zeros((nb, S, S, 3), jnp.float32)
    score = script in _SCORE
    variables = jax.jit(
        lambda r, a, b_, c: model.init(r, a, b_, c, run_score_head=score)
    )(jax.random.PRNGKey(0), tz, tz, sz)

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    frozen = bool(cfg.MODEL.get("HEAD_FREEZE_BN", False))
    new_vars, report = convert_state_dict(sd, variables, verbose=False,
                                          frozen_head_bn=frozen)
    return oracle, model, new_vars, report, sd, (T, S, bimodal)


@pytest.fixture(scope="module", params=sorted(FAMILIES))
def family(request):
    return request.param, _build_pair(request.param)


# Dead parameters the genuine reference models CARRY but never use in the
# tracking forward (classification head + final norm + cls token; the
# flagship nulls them at asymmetric_shared_ce.py:511-514, the unimodal
# models do not) — correct for the converter to skip.
_DEAD = ("backbone.cls_token", "backbone.norm.", "backbone.head.")


def test_full_checkpoint_converts(family):
    script, (_, _, _, report, sd, _) = family
    skipped = [k for k in report["skipped"]
               if not any(b in k for b in _BUFFERS)
               and not any(k.startswith(d) for d in _DEAD)]
    assert skipped == [], (script, skipped)
    assert not report["shape_mismatch"], (script, report["shape_mismatch"])
    assert report["missing"] == [], (script, report["missing"])


def test_box_parity(family):
    script, (oracle, model, new_vars, _, _, (T, S, bimodal)) = family
    rng = np.random.default_rng(11)
    mk = lambda sz: rng.standard_normal((B, sz, sz, 3)).astype(np.float32)
    as_torch = lambda a: torch.tensor(a).permute(0, 3, 1, 2)
    if bimodal:
        pairs = [(mk(T), mk(T)), (mk(T), mk(T)), (mk(S), mk(S))]
        t_args = [[as_torch(v), as_torch(i)] for v, i in pairs]
        j_args = [jnp.asarray(np.concatenate([v, i], axis=0))
                  for v, i in pairs]
    else:
        arrs = [mk(T), mk(T), mk(S)]
        t_args = [as_torch(a) for a in arrs]
        j_args = [jnp.asarray(a) for a in arrs]
    score = script in _SCORE
    with torch.no_grad():
        out = oracle(*t_args, run_score_head=True) if score \
            else oracle(*t_args)
    out_dict = out[0] if isinstance(out, tuple) else out
    want = (out[1] if isinstance(out, tuple) else out["pred_boxes"])
    want = want.numpy().reshape(B, 4)
    got_dict = model.apply(new_vars, *j_args, run_score_head=score)
    got = np.asarray(got_dict["pred_boxes"]).reshape(B, 4)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    if score:
        # gt_bboxes=None -> SPM scored on the PREDICTED box (forward_head)
        want_s = out_dict["pred_scores"].numpy().reshape(B)
        got_s = np.asarray(got_dict["pred_scores"]).reshape(B)
        np.testing.assert_allclose(got_s, want_s, atol=5e-4, rtol=1e-3)
