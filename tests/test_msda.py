"""MSDeformAttn sampling vs the torch grid_sample oracle (the reference's own
CUDA-kernel parity oracle, ms_deform_attn_func.py:41-61 semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multi_modal_tracking_tpu.ops.msda import ms_deform_attn


def torch_oracle(value, spatial_shapes, loc, weights):
    value = torch.tensor(value)
    loc = torch.tensor(loc)
    weights = torch.tensor(weights)
    N, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    vlist = value.split([h * w for h, w in spatial_shapes], dim=1)
    grids = 2 * loc - 1
    samples = []
    for lid, (H, W) in enumerate(spatial_shapes):
        v = vlist[lid].flatten(2).transpose(1, 2).reshape(N * M, D, H, W)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (N*M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        samples.append(s)
    w = weights.transpose(1, 2).reshape(N * M, 1, Lq, L * P)
    out = (torch.stack(samples, dim=-2).flatten(-2) * w).sum(-1).view(N, M * D, Lq)
    return out.transpose(1, 2).contiguous().numpy()


def test_msda_matches_grid_sample_oracle():
    rng = np.random.default_rng(0)
    N, M, D, P = 2, 4, 8, 4
    shapes = ((18, 18), (18, 18))
    S = sum(h * w for h, w in shapes)
    Lq = S
    value = rng.standard_normal((N, S, M, D)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(N, Lq, M, len(shapes), P, 2)).astype(np.float32)
    w = rng.uniform(0, 1, size=(N, Lq, M, len(shapes), P)).astype(np.float32)
    w = w / w.sum(axis=(3, 4), keepdims=True)

    ref = torch_oracle(value, shapes, loc, w)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_msda_mixed_level_sizes():
    rng = np.random.default_rng(1)
    N, M, D, P = 1, 2, 4, 3
    shapes = ((9, 12), (5, 7))
    S = sum(h * w for h, w in shapes)
    Lq = 17
    value = rng.standard_normal((N, S, M, D)).astype(np.float32)
    loc = rng.uniform(0, 1, size=(N, Lq, M, len(shapes), P, 2)).astype(np.float32)
    w = rng.uniform(0, 1, size=(N, Lq, M, len(shapes), P)).astype(np.float32)
    ref = torch_oracle(value, shapes, loc, w)
    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_msda_differentiable():
    import jax
    rng = np.random.default_rng(2)
    shapes = ((6, 6),)
    value = jnp.asarray(rng.standard_normal((1, 36, 2, 4)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0.2, 0.8, size=(1, 10, 2, 1, 2, 2)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, size=(1, 10, 2, 1, 2)).astype(np.float32))
    g = jax.grad(lambda l: ms_deform_attn(value, shapes, l, w).sum())(loc)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_dense_and_gather_lowerings_agree():
    """Above _DENSE_MAX_SOURCE the gather path runs; both lowerings must
    produce the same numbers on the same inputs."""
    import multi_modal_tracking_tpu.ops.msda as M
    rng = np.random.default_rng(5)
    B, Mh, D, P = 2, 4, 8, 4
    shapes = ((6, 7), (3, 4))
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.standard_normal((B, S, Mh, D)), jnp.float32)
    Lq = 10
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Lq, Mh, 2, P, 2)), jnp.float32)
    attw = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((B, Lq, Mh, 2, P)), jnp.float32), axis=(-2, -1))
    dense = M.ms_deform_attn(value, shapes, loc, attw)
    orig = M._DENSE_MAX_SOURCE
    try:
        M._DENSE_MAX_SOURCE = 0          # force the gather lowering
        gather = M.ms_deform_attn(value, shapes, loc, attw)
    finally:
        M._DENSE_MAX_SOURCE = orig
    np.testing.assert_allclose(np.asarray(dense), np.asarray(gather),
                               rtol=1e-5, atol=1e-5)


def test_msda_pallas_matches_xla_interpret():
    """Fused Pallas lowering (interpret mode on CPU) == XLA composition,
    forward and gradients — the same parity contract the reference enforces
    for its CUDA kernel (ops/test.py:31-41,54+)."""
    from multi_modal_tracking_tpu.ops import msda as msda_mod
    rng = np.random.default_rng(11)
    B, M, D, P = 2, 4, 16, 4
    shapes = ((6, 7), (5, 4))
    S = sum(h * w for h, w in shapes)
    Lq = 9
    value = jnp.asarray(rng.standard_normal((B, S, M, D)).astype(np.float32))
    # include out-of-range locations to exercise the dead-tap (-1) path
    loc = jnp.asarray(rng.uniform(-0.15, 1.15, (B, Lq, M, len(shapes), P, 2))
                      .astype(np.float32))
    w = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((B, Lq, M, len(shapes), P)).astype(np.float32)), -1)

    ref = msda_mod._ms_deform_attn_xla(value, shapes, loc, w)
    got = msda_mod.ms_deform_attn_fused(value, shapes, loc, w, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    def loss_ref(v, l, ww):
        return (msda_mod._ms_deform_attn_xla(v, shapes, l, ww) ** 2).sum()

    def loss_fused(v, l, ww):
        return (msda_mod.ms_deform_attn_fused(v, shapes, l, ww, True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(value, loc, w)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(value, loc, w)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_msda_dispatcher_pallas_toggle():
    from multi_modal_tracking_tpu.ops import msda as msda_mod
    rng = np.random.default_rng(12)
    shapes = ((4, 4),)
    value = jnp.asarray(rng.standard_normal((1, 16, 2, 8)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0.1, 0.9, (1, 5, 2, 1, 4, 2)).astype(np.float32))
    w = jnp.full((1, 5, 2, 1, 4), 0.25, jnp.float32)
    base = msda_mod.ms_deform_attn(value, shapes, loc, w)
    old = msda_mod.FORCE_INTERPRET
    msda_mod.FORCE_INTERPRET = True
    try:
        via_kernel = msda_mod.ms_deform_attn(value, shapes, loc, w)
    finally:
        msda_mod.FORCE_INTERPRET = old
    np.testing.assert_allclose(np.asarray(via_kernel), np.asarray(base),
                               atol=1e-5, rtol=1e-5)
