"""Modulated deformable conv (DCNv2) vs a straightforward numpy oracle, and
the deformable-conv fusion modules (mmcv ModulatedDeformConv2d parity)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.ops.deform_conv import modulated_deform_conv2d


def _oracle(x, offset, mask, weight, stride=1, padding=1, dg=1):
    """Literal per-pixel DCNv2 (NHWC), zero outside borders."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    Ho = (H + 2 * padding - kh) // stride + 1
    Wo = (W + 2 * padding - kw) // stride + 1
    cg = Cin // dg
    off = offset.reshape(B, Ho, Wo, dg, kh * kw, 2)
    m = mask.reshape(B, Ho, Wo, dg, kh * kw)
    out = np.zeros((B, Ho, Wo, Cout), np.float64)

    def bil(img, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        acc = np.zeros(img.shape[-1])
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xc = y0 + dy, x0 + dx
                w = (1 - abs(y - yy)) * (1 - abs(xx - xc))
                if 0 <= yy < img.shape[0] and 0 <= xc < img.shape[1] and w > 0:
                    acc += w * img[yy, xc]
        return acc

    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                col = np.zeros((kh * kw, Cin))
                for g in range(dg):
                    for t in range(kh * kw):
                        ky, kx = divmod(t, kw)
                        y = i * stride - padding + ky + off[b, i, j, g, t, 0]
                        xx = j * stride - padding + kx + off[b, i, j, g, t, 1]
                        col[t, g * cg:(g + 1) * cg] = \
                            bil(x[b, :, :, g * cg:(g + 1) * cg], y, xx) * m[b, i, j, g, t]
                out[b, i, j] = np.einsum("kc,kco->o", col,
                                         weight.reshape(kh * kw, Cin, Cout))
    return out


@pytest.mark.parametrize("dg", [1, 2])
def test_dcnv2_matches_oracle(dg):
    rng = np.random.default_rng(0)
    B, H, W, Cin, Cout = 1, 6, 7, 4, 5
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    offset = (rng.standard_normal((B, H, W, dg * 9 * 2)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (B, H, W, dg * 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32)
    got = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), deform_groups=dg))
    want = _oracle(x, offset, mask, weight, dg=dg)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_zero_offset_equals_plain_conv():
    """With zero offsets and unit mask, DCNv2 is an ordinary conv — the
    init-state behaviour the zero-initialised offset conv relies on
    (fusion_utils.py:51-52)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 6)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 6, 4)).astype(np.float32)
    offset = np.zeros((2, 8, 8, 18), np.float32)
    mask = np.ones((2, 8, 8, 9), np.float32)
    got = np.asarray(modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(weight)))
    want = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_deform_fusion_modules():
    from multi_modal_tracking_tpu.models.fusion import build_fusion
    rng = np.random.default_rng(2)
    xv = jnp.asarray(rng.standard_normal((2, 6, 6, 16)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((2, 6, 6, 16)).astype(np.float32))
    for cls in ("RGBT_Fusion_2", "RGBT_Fusion_3"):
        fusion = build_fusion(cls, 16, 0, 0)
        variables = fusion.init(jax.random.PRNGKey(0), xv, xi)
        out = fusion.apply(variables, xv, xi)
        assert out.shape == (2, 6, 6, 16)
        assert np.isfinite(np.asarray(out)).all()
    # gradients flow (the reference needed a hand-written CUDA backward)
    fusion = build_fusion("RGBT_Fusion_2", 16, 0, 0)
    variables = fusion.init(jax.random.PRNGKey(0), xv, xi)
    g = jax.grad(lambda v: (fusion.apply(v, xv, xi) ** 2).sum())(variables)
    leaves = jax.tree.leaves(g["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_attention_fusion_variants():
    """The full Attention_Fusion_* zoo builds, runs and differentiates.

    Covers the three DeformAttn_type paths (bimodal / bimodal_2 / normal,
    reference deformable_encoder.py:119-124) and the raw-sum wrapper
    (Attention_Fusion_1, fusion_utils.py:113-126)."""
    import jax
    from multi_modal_tracking_tpu.models.fusion import build_fusion
    rng = np.random.default_rng(3)
    C = 32
    xv = jnp.asarray(rng.standard_normal((1, 4, 4, C)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((1, 4, 4, C)).astype(np.float32))
    for cls in ("Attention_Fusion_1", "Attention_Fusion_512",
                "Attention_Fusion_Bimodal_2"):
        fusion = build_fusion(cls, C, d_model=C, num_encoder_layers=1)
        variables = fusion.init(jax.random.PRNGKey(0), xv, xi)
        out = jax.jit(fusion.apply)(variables, xv, xi)
        assert out.shape == (1, 4, 4, C), cls
        assert np.isfinite(np.asarray(out)).all(), cls
        g = jax.grad(lambda v: (fusion.apply(v, xv, xi) ** 2).sum())(variables)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(g["params"])), cls


def test_bimodal2_predicts_per_modal_offsets():
    """bimodal_2 gives each modality its own offsets: with modal inputs
    swapped the two halves must NOT mirror exactly (they would for the
    shared 'bimodal' prediction when queries are modality-symmetric)."""
    import jax
    from multi_modal_tracking_tpu.models.fusion import MSDeformAttnBimodal
    rng = np.random.default_rng(4)
    C, H, W = 16, 3, 3
    src = jnp.asarray(rng.standard_normal((1, 2 * H * W, C)).astype(np.float32))
    ys, xs = np.meshgrid((np.arange(H) + .5) / H, (np.arange(W) + .5) / W, indexing="ij")
    ref1 = np.stack([xs.ravel(), ys.ravel()], -1)
    ref = jnp.asarray(np.tile(np.concatenate([ref1, ref1], 0)[:, None], (1, 2, 1)),
                      jnp.float32)
    shapes = ((H, W), (H, W))
    for attn_type in ("bimodal", "bimodal_2", "normal"):
        m = MSDeformAttnBimodal(d_model=C, attn_type=attn_type)
        v = m.init(jax.random.PRNGKey(1), src, ref, src, shapes)
        out = m.apply(v, src, ref, src, shapes)
        assert out.shape == (1, 2 * H * W, C), attn_type
        assert np.isfinite(np.asarray(out)).all(), attn_type
    # parameter widths differ: bimodal_2 predicts 2x offsets/weights
    m1 = MSDeformAttnBimodal(d_model=C, attn_type="bimodal")
    m2 = MSDeformAttnBimodal(d_model=C, attn_type="bimodal_2")
    p1 = m1.init(jax.random.PRNGKey(1), src, ref, src, shapes)["params"]
    p2 = m2.init(jax.random.PRNGKey(1), src, ref, src, shapes)["params"]
    assert (p2["sampling_offsets"]["kernel"].shape[-1]
            == 2 * p1["sampling_offsets"]["kernel"].shape[-1])
    assert (p2["attention_weights"]["kernel"].shape[-1]
            == 2 * p1["attention_weights"]["kernel"].shape[-1])


def test_fusion_offset_chunk_layout_matches_mmcv(monkeypatch):
    """RGBT_Fusion_2 semantics (fusion_utils.py:56-57): offset = cat(o1, o2)
    — with deform_groups=2, o1 IS group 0's per-tap interleaved (dy, dx)
    pairs and o2 group 1's. Interleaving o1/o2 channelwise (all-dy/all-dx)
    would scramble converted fusion_offset weights."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from multi_modal_tracking_tpu.models import fusion as fusion_mod
    from multi_modal_tracking_tpu.ops import deform_conv as dc

    captured = {}
    real = dc.modulated_deform_conv2d

    def spy(x, offset, mask, weight, **kw):
        captured["offset"] = offset
        return real(x, offset, mask, weight, **kw)

    monkeypatch.setattr(dc, "modulated_deform_conv2d", spy)

    fus = fusion_mod.DeformConvFusion(out_channels=8, deform_groups=2)
    x = jnp.ones((1, 4, 4, 4), jnp.float32)
    variables = fus.init(jax.random.PRNGKey(0), x[..., :2], x[..., 2:],
                         train=False)
    # bias the offset conv so raw output = [0..53] per pixel (weights are
    # zero-init, so raw == bias everywhere)
    bias = jnp.arange(54, dtype=jnp.float32)
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    p = variables["params"]["fusion_offset"]
    p["bias"] = bias
    fus.apply(variables, x[..., :2], x[..., 2:], train=False,
              mutable=["batch_stats"])
    off = np.asarray(captured["offset"])[0, 0, 0]
    # reference: cat(o1, o2) = channels [0..17] then [18..35] verbatim
    np.testing.assert_array_equal(off, np.arange(36, dtype=np.float32))
