"""Model-semantics parity vs inline torch oracles and structural invariants."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from multi_modal_tracking_tpu.models.vit import MixedAttention, MixFormerViT
from multi_modal_tracking_tpu.models.asymmetric_shared import (
    AsymCrossModalAttention, AsymSharedViT, ce_keep_schedule)


def _np(x):
    return np.asarray(x)


def torch_asym_unimodal(x, Wqkv, bqkv, Wp, bp, heads, n_mt):
    """Reference asymmetric mixed attention semantics
    (mixformer_vit/mixformer.py:51-77) as a torch oracle."""
    x = torch.tensor(x)
    B, N, C = x.shape
    qkv = x @ torch.tensor(Wqkv) + torch.tensor(bqkv)
    qkv = qkv.reshape(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = (C // heads) ** -0.5
    q_mt, q_s = q[:, :, :n_mt], q[:, :, n_mt:]
    k_mt, v_mt = k[:, :, :n_mt], v[:, :, :n_mt]
    a1 = ((q_mt @ k_mt.transpose(-2, -1)) * scale).softmax(-1)
    x_mt = (a1 @ v_mt).transpose(1, 2).reshape(B, n_mt, C)
    a2 = ((q_s @ k.transpose(-2, -1)) * scale).softmax(-1)
    x_s = (a2 @ v).transpose(1, 2).reshape(B, N - n_mt, C)
    out = torch.cat([x_mt, x_s], 1)
    return (out @ torch.tensor(Wp) + torch.tensor(bp)).numpy()


def test_mixed_attention_vs_torch():
    rng = np.random.default_rng(0)
    B, n_mt, n_s, C, heads = 2, 8, 12, 32, 4
    x = rng.standard_normal((B, n_mt + n_s, C)).astype(np.float32)
    attn = MixedAttention(dim=C, num_heads=heads)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), n_mt)
    p = variables["params"]
    got = _np(attn.apply(variables, jnp.asarray(x), n_mt))
    ref = torch_asym_unimodal(x, _np(p["qkv"]["kernel"]), _np(p["qkv"]["bias"]),
                              _np(p["proj"]["kernel"]), _np(p["proj"]["bias"]),
                              heads, n_mt)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def torch_asym_crossmodal(xv, xi, Wqkv, bqkv, Wp, bp, heads, n_mt):
    """Reference cross-modal asymmetric attention
    (asymmetric_shared.py:55-104) as a torch oracle."""
    xv, xi = torch.tensor(xv), torch.tensor(xi)
    B, N, C = xv.shape
    qkv = torch.cat([xv, xi], 0) @ torch.tensor(Wqkv) + torch.tensor(bqkv)
    qkv = qkv.reshape(2 * B, N, 3, heads, C // heads)
    qkvV, qkvI = qkv[:B].permute(2, 0, 3, 1, 4), qkv[B:].permute(2, 0, 3, 1, 4)
    scale = (C // heads) ** -0.5

    def split(t):
        return t[:, :, :n_mt], t[:, :, n_mt:]

    qV, kV, vV = qkvV[0], qkvV[1], qkvV[2]
    qI, kI, vI = qkvI[0], qkvI[1], qkvI[2]
    q_mt_V, q_s_V = split(qV); k_mt_V, k_s_V = split(kV); v_mt_V, v_s_V = split(vV)
    q_mt_I, q_s_I = split(qI); k_mt_I, k_s_I = split(kI); v_mt_I, v_s_I = split(vI)
    k_mt = torch.cat([k_mt_V, k_mt_I], 2)
    v_mt = torch.cat([v_mt_V, v_mt_I], 2)

    def att(q, k, v):
        a = ((q @ k.transpose(-2, -1)) * scale).softmax(-1)
        return (a @ v).transpose(1, 2).reshape(B, q.shape[2], C)

    x_mt_V = att(q_mt_V, k_mt_V, v_mt_V)
    x_mt_I = att(q_mt_I, k_mt_I, v_mt_I)
    x_s_V = att(q_s_V, torch.cat([k_mt, k_s_V], 2), torch.cat([v_mt, v_s_V], 2))
    x_s_I = att(q_s_I, torch.cat([k_mt, k_s_I], 2), torch.cat([v_mt, v_s_I], 2))
    xV = torch.cat([x_mt_V, x_s_V], 1)
    xI = torch.cat([x_mt_I, x_s_I], 1)
    out = torch.cat([xV, xI], 0) @ torch.tensor(Wp) + torch.tensor(bp)
    # t->s attention for CE (asymmetric_shared_ce.py:203)
    a_t2s = ((torch.cat([q_mt_V, q_mt_I], 2) @ torch.cat([k_s_V, k_s_I], 2).transpose(-2, -1))
             * scale).softmax(-1)
    return out[:B].numpy(), out[B:].numpy(), a_t2s.numpy()


def test_crossmodal_attention_vs_torch():
    rng = np.random.default_rng(1)
    B, n_mt, n_s, C, heads = 2, 8, 12, 32, 4
    xv = rng.standard_normal((B, n_mt + n_s, C)).astype(np.float32)
    xi = rng.standard_normal((B, n_mt + n_s, C)).astype(np.float32)
    attn = AsymCrossModalAttention(dim=C, num_heads=heads)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(xv), jnp.asarray(xi), n_mt)
    p = variables["params"]
    got_v, got_i, got_a = attn.apply(variables, jnp.asarray(xv), jnp.asarray(xi), n_mt,
                                     return_attention=True)
    ref_v, ref_i, ref_a = torch_asym_crossmodal(
        xv, xi, _np(p["qkv"]["kernel"]), _np(p["qkv"]["bias"]),
        _np(p["proj"]["kernel"]), _np(p["proj"]["bias"]), heads, n_mt)
    np.testing.assert_allclose(_np(got_v), ref_v, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(_np(got_i), ref_i, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(_np(got_a), ref_a, atol=2e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def tiny_vit():
    m = MixFormerViT(img_size_s=48, img_size_t=32, patch_size=16, embed_dim=64,
                     depth=2, num_heads=2)
    rng = np.random.default_rng(2)
    t = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    ot = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((1, 48, 48, 3)).astype(np.float32))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), t, t, s)
    return m, variables, t, ot, s


def test_online_cache_matches_full_forward(tiny_vit):
    """set_online + forward_test must reproduce the full forward's search
    features exactly (templates never attend to search, so caching per-block
    template k/v is lossless) — the invariant behind the reference's
    forward_test fast path."""
    m, variables, t, ot, s = tiny_vit
    _, _, s_full = jax.jit(m.apply)(variables, t, ot, s)
    tmpl, mem, _ = jax.jit(lambda v, a, b: m.apply(v, a, b, method=m.set_online))(variables, t, ot)
    s_test = jax.jit(lambda v, x, mem: m.apply(v, x, mem, method=m.forward_test))(variables, s, mem)
    np.testing.assert_allclose(_np(s_test), _np(s_full), atol=1e-5, rtol=1e-4)


def test_ce_schedule_static_lengths():
    keeps, final = ce_keep_schedule(324, 12, [3, 6, 9], [0.7, 0.7, 0.7], None)
    assert keeps[3] == 227 and keeps[6] == 159 and keeps[9] == 112
    assert final == 112
    keeps, final = ce_keep_schedule(324, 12, [3, 6, 9], [0.7] * 3, 1.0)
    assert all(k is None for k in keeps) and final == 324


def test_ce_prunes_and_recovers_positions():
    m = AsymSharedViT(img_size_s=64, img_size_t=32, patch_size=16, embed_dim=64,
                      depth=2, num_heads=2, ce_loc=(0,), ce_keep_ratio=(0.5,))
    rng = np.random.default_rng(3)
    B = 1
    t = jnp.asarray(rng.standard_normal((2 * B, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((2 * B, 64, 64, 3)).astype(np.float32))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), t, t, s)
    _, _, s_out = jax.jit(lambda v, t, s: m.apply(v, t, t, s, 0.5))(variables, t, s)
    s_tok = _np(s_out).reshape(2 * B, -1, 64)
    nonzero = (np.abs(s_tok).sum(-1) > 1e-8).sum(axis=1)
    # 16 search tokens, keep ceil(0.5*16)=8 per modality; rest restored as 0.
    assert list(nonzero) == [8, 8]

    # keep rate 1.0 (static no-op) must equal a CE-free model with the same
    # params exactly (CE adds no parameters).
    m_nce = AsymSharedViT(img_size_s=64, img_size_t=32, patch_size=16, embed_dim=64,
                          depth=2, num_heads=2, ce_loc=None, ce_keep_ratio=None)
    _, _, a = jax.jit(lambda v, t, s: m.apply(v, t, t, s, 1.0))(variables, t, s)
    _, _, b = jax.jit(lambda v, t, s: m_nce.apply(v, t, t, s))(variables, t, s)
    np.testing.assert_allclose(_np(a), _np(b), atol=1e-6)


def test_convmae_cache_losslessness():
    """ConvMAE set_online + forward_test must reproduce the joint forward's
    boxes (the same contract as ViT/CvT; guards the eval-side cached-k/v
    dispatch for mixformer_convmae)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.models.convmae import build_mixformer_convmae
    cfg = get_default_config("mixformer_convmae")
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32
    model = build_mixformer_convmae(cfg)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    ot = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, ot, s)
    full = jax.jit(lambda v: model.apply(v, t, ot, s))(variables)
    cache = jax.jit(lambda v: model.apply(v, t, ot, method=model.set_online))(variables)
    fast = jax.jit(lambda v, c: model.apply(v, s, c, method=model.forward_test))(
        variables, cache)
    np.testing.assert_allclose(np.asarray(fast["pred_boxes"]),
                               np.asarray(full["pred_boxes"]),
                               rtol=1e-4, atol=1e-5)


def test_pos_embed_matches_reference_layout():
    """Non-circular spec test for the MAE sin-cos layout (pos_utils.py:28,
    42-45): the FIRST embed_dim/2 channels encode the COLUMN (w) coordinate
    — `np.meshgrid(grid_w, grid_h)` puts the w array in grid[0], which the
    reference feeds first despite naming it emb_h. Converted backbones were
    trained against that order; an [h; w] layout transposes token geometry."""
    import numpy as np
    from multi_modal_tracking_tpu.ops.pos_embed import get_2d_sincos_pos_embed

    dim, g = 8, 4
    emb = get_2d_sincos_pos_embed(dim, g)           # (16, 8), row-major (h, w)
    omega = 1.0 / 10000 ** (np.arange(dim // 4) / (dim / 4.0))
    for tok in range(g * g):
        r, c = divmod(tok, g)
        first = np.concatenate([np.sin(c * omega), np.cos(c * omega)])
        second = np.concatenate([np.sin(r * omega), np.cos(r * omega)])
        np.testing.assert_allclose(emb[tok], np.concatenate([first, second]),
                                   atol=1e-6)
