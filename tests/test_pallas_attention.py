"""Pallas fused asymmetric mixed attention vs the two-call XLA reference.

Runs the kernel in interpreter mode on CPU (the kernel body is identical to
what Mosaic compiles on TPU). Mirrors the reference's kernel test strategy:
CUDA-vs-pure-PyTorch forward equality + gradcheck
(lib/models/.../deformable_attention/ops/test.py, SURVEY §4)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import multi_modal_tracking_tpu.ops.attention as A


@pytest.fixture
def qkv():
    rng = np.random.default_rng(0)
    B, H, N, D = 2, 3, 40, 16
    return tuple(jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
                 for _ in range(3))


def test_forward_matches_xla(qkv):
    q, k, v = qkv
    for n_mt in (8, 16, 32):
        ref = A.mixed_attention_xla(q, k, v, n_mt, 0.25)
        got = A.mixed_attention_fused(q, k, v, n_mt, 0.25, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_gradients_match_xla(qkv):
    q, k, v = qkv
    n_mt = 16

    def loss(fn, q, k, v):
        return (fn(q, k, v, n_mt, 0.25) ** 2).sum() if fn is A.mixed_attention_xla \
            else (fn(q, k, v, n_mt, 0.25, True) ** 2).sum()

    gr = jax.grad(lambda *a: loss(A.mixed_attention_xla, *a), argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(lambda *a: loss(A.mixed_attention_fused, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)


def test_gradients_match_xla_asymmetric_keys(qkv):
    """Nk > Nq (the flagship CE fused key layout): fused bwd kernel must
    produce exact grads for rectangular probability matrices too."""
    q, k, v = qkv
    rng = np.random.default_rng(5)
    extra = jnp.asarray(rng.standard_normal((2, 3, 24, 16)).astype(np.float32))
    k2 = jnp.concatenate([k, extra], axis=2)
    v2 = jnp.concatenate([v, jnp.flip(extra, axis=2)], axis=2)
    n_mt = 16

    gr = jax.grad(lambda a, b, c: (A.mixed_attention_xla(a, b, c, n_mt, 0.25)
                                   ** 2).sum(), argnums=(0, 1, 2))(q, k2, v2)
    gg = jax.grad(lambda a, b, c: (A.mixed_attention_fused(a, b, c, n_mt, 0.25,
                                                           True) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k2, v2)
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)


def test_gradients_xla_fallback_above_bwd_max_n(qkv, monkeypatch):
    """N above _BWD_MAX_N routes the backward to the XLA recompute path."""
    q, k, v = qkv
    monkeypatch.setattr(A, "_BWD_MAX_N", 8)      # force the fallback
    gr = jax.grad(lambda a, b, c: (A.mixed_attention_xla(a, b, c, 16, 0.25)
                                   ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(lambda a, b, c: (A.mixed_attention_fused(a, b, c, 16, 0.25,
                                                           True) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-4)


def test_template_rows_ignore_search_keys(qkv):
    """Asymmetry semantics: template outputs must be invariant to search
    tokens (the property that makes the online k/v cache lossless)."""
    q, k, v = qkv
    n_mt = 16
    out1 = A.mixed_attention_fused(q, k, v, n_mt, 0.25, True)
    k2 = k.at[:, :, n_mt:].set(jnp.flip(k[:, :, n_mt:], axis=2) + 3.0)
    v2 = v.at[:, :, n_mt:].set(0.0)
    out2 = A.mixed_attention_fused(q, k2, v2, n_mt, 0.25, True)
    np.testing.assert_allclose(np.asarray(out1[:, :, :n_mt]),
                               np.asarray(out2[:, :, :n_mt]), atol=1e-6)
    assert not np.allclose(np.asarray(out1[:, :, n_mt:]),
                           np.asarray(out2[:, :, n_mt:]))


def test_model_uses_kernel_when_forced(monkeypatch):
    """MixedAttention module routes through the fused kernel under
    FORCE_INTERPRET and produces the same output as the XLA path."""
    from multi_modal_tracking_tpu.models.vit import MixFormerViT
    m = MixFormerViT(img_size_s=48, img_size_t=32, patch_size=16,
                     embed_dim=32, depth=1, num_heads=2)
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((1, 48, 48, 3)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), t, t, s)
    ref = m.apply(variables, t, t, s)
    monkeypatch.setattr(A, "FORCE_INTERPRET", True)
    got = m.apply(variables, t, t, s)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_flagship_cross_modal_fused_matches_xla(monkeypatch):
    """AsymCrossModalAttention: the single fused-kernel formulation (merged
    per-modality key layouts) must equal the 4-call XLA path exactly."""
    from multi_modal_tracking_tpu.models.asymmetric_shared import (
        AsymCrossModalAttention)
    attn = AsymCrossModalAttention(dim=32, num_heads=2)
    rng = np.random.default_rng(2)
    B, n_mt, n_s = 2, 8, 12
    x_v = jnp.asarray(rng.standard_normal((B, n_mt + n_s, 32)).astype(np.float32))
    x_i = jnp.asarray(rng.standard_normal((B, n_mt + n_s, 32)).astype(np.float32))
    variables = attn.init(jax.random.PRNGKey(0), x_v, x_i, n_mt)
    ref_v, ref_i, _ = attn.apply(variables, x_v, x_i, n_mt)
    monkeypatch.setattr(A, "FORCE_INTERPRET", True)
    got_v, got_i, _ = attn.apply(variables, x_v, x_i, n_mt)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                               atol=1e-5, rtol=1e-4)
