"""Alpha-Refine (box -> mask) network and runtime wrapper."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.models.alpha_refine import (ARcmSeg,
                                                          AlphaRefineNet,
                                                          RefineSpec,
                                                          build_alpha_refine)


@pytest.fixture(scope="module")
def ar():
    net, variables, spec = build_alpha_refine(input_sz=64, output_sz=64)
    return net, variables, spec


def test_mask_shapes_and_range(ar):
    net, variables, spec = ar
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray([[16.0, 16, 32, 32], [20.0, 12, 24, 30]])
    logits = jax.jit(lambda v, pr, br, pt: net.apply(
        v, pr, br, pt, method=net.forward_train))(variables, p, b, p)
    assert logits.shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(logits)).all()


def test_kernel_caching_equals_joint(ar):
    """init_ref + __call__ must equal forward_train (the runtime split)."""
    net, variables, spec = ar
    rng = np.random.default_rng(1)
    p_ref = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    p_test = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray([[16.0, 16, 32, 32]])
    joint = net.apply(variables, p_ref, b, p_test, method=net.forward_train)
    kernel = net.apply(variables, p_ref, b, method=net.init_ref)
    split = net.apply(variables, p_test, kernel)
    np.testing.assert_allclose(np.asarray(split), np.asarray(joint),
                               atol=1e-5, rtol=1e-4)


def test_runtime_wrapper_full_frame(ar):
    pytest.importorskip("cv2")
    net, variables, spec = ar
    w = ARcmSeg(variables, spec)
    rng = np.random.default_rng(2)
    frame = rng.integers(0, 255, (120, 160, 3), np.uint8)
    w.initialize(frame, [50.0, 40, 40, 30])
    mask = w.get_mask(frame, [52.0, 41, 38, 29])
    assert mask.shape == (120, 160)
    assert 0.0 <= float(mask.min()) and float(mask.max()) <= 1.0
