"""Growth-exact masked template ring: unit equivalence per model family.

The reference's online tracker GROWS its multi-template buffer one commit at
a time (lib/test/tracker/mixformer_cvt_online.py:152-162: start at
[template], torch.cat-append until online_size, then replace at forget_id).
Our ring is statically `online_size` slots; set_online takes a slot_mask and
masks unfilled slots out of every attention.  These tests pin the core
property: a masked ring with n live slots (dead slots filled with garbage)
must produce the same set_online cache semantics and forward_test outputs as
an unmasked buffer holding exactly those n templates — for every online
family (ViT / CvT strided-k/v / ConvMAE).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.models.convmae import (ConvMAESpec,
                                                     MixFormerConvMAE)
from multi_modal_tracking_tpu.models.cvt import CvTSpec, MixFormerCvT
from multi_modal_tracking_tpu.models.mixformer import MixFormer, ViTSpec

T_SZ, S_SZ = 32, 64


def _vit():
    return MixFormer(spec=ViTSpec(search_size=S_SZ, template_size=T_SZ,
                                  embed_dim=64, depth=2, num_heads=2,
                                  head_dim=64, nlayer_head=2),
                     with_score=True)


def _cvt():
    return MixFormerCvT(spec=CvTSpec(search_size=S_SZ, template_size=T_SZ,
                                     num_stages=3, depth=(1, 1, 2),
                                     dim_embed=(16, 24, 32),
                                     num_heads=(1, 2, 4), head_dim=32,
                                     drop_path_rate=(0.0, 0.0, 0.0)),
                        with_score=True)


def _convmae():
    return MixFormerConvMAE(spec=ConvMAESpec(search_size=S_SZ,
                                             template_size=T_SZ,
                                             embed_dim=(16, 24, 32),
                                             depth=(1, 1, 2), num_heads=4,
                                             head_type="CORNER_UP",
                                             head_dim=32, head_freeze_bn=True,
                                             drop_path_rate=0.0),
                            with_score=True)


@pytest.mark.parametrize("family", ["vit", "cvt", "convmae"])
def test_masked_ring_equals_short_buffer(family):
    model = {"vit": _vit, "cvt": _cvt, "convmae": _convmae}[family]()
    t0 = jnp.zeros((1, T_SZ, T_SZ, 3), jnp.float32)
    s0 = jnp.zeros((1, S_SZ, S_SZ, 3), jnp.float32)
    variables = jax.jit(lambda r, a, b, c: model.init(
        r, a, b, c, run_score_head=True))(jax.random.PRNGKey(0), t0, t0, s0)

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(1, T_SZ, T_SZ, 3)), jnp.float32)
    ots = jnp.asarray(rng.normal(size=(3, T_SZ, T_SZ, 3)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(1, S_SZ, S_SZ, 3)), jnp.float32)

    for n_live in (1, 2, 3):
        mask = (jnp.arange(3) < n_live).astype(jnp.float32)
        # dead slots hold garbage — they must be invisible
        ring = jnp.where(mask[:, None, None, None] > 0, ots, 7.7)
        c_masked = model.apply(variables, t, ring, mask,
                               method=model.set_online)
        c_short = model.apply(variables, t, ots[:n_live],
                              method=model.set_online)
        o_masked = model.apply(variables, s, c_masked, run_score_head=True,
                               method=model.forward_test)
        o_short = model.apply(variables, s, c_short, run_score_head=True,
                              method=model.forward_test)
        np.testing.assert_allclose(np.asarray(o_masked["pred_boxes"]),
                                   np.asarray(o_short["pred_boxes"]),
                                   atol=1e-5, rtol=0,
                                   err_msg=f"{family} n_live={n_live}")
        np.testing.assert_allclose(np.asarray(o_masked["pred_scores"]),
                                   np.asarray(o_short["pred_scores"]),
                                   atol=1e-5, rtol=0,
                                   err_msg=f"{family} n_live={n_live}")
        # the final template map feeds the score head — must match too
        np.testing.assert_allclose(np.asarray(c_masked["template"]),
                                   np.asarray(c_short["template"]),
                                   atol=1e-5, rtol=0)
