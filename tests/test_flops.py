"""utils/flops.py: matmul/conv-only FLOP counting vs hand-computed truths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.utils.flops import matmul_conv_flops


def test_plain_matmul():
    a = jnp.zeros((8, 32)); b = jnp.zeros((32, 16))
    assert matmul_conv_flops(jnp.dot, a, b) == 2 * 8 * 32 * 16


def test_batched_einsum():
    a = jnp.zeros((4, 6, 8, 10)); b = jnp.zeros((4, 6, 10, 12))
    f = lambda x, y: jnp.einsum("bhmk,bhkn->bhmn", x, y)
    assert matmul_conv_flops(f, a, b) == 2 * 4 * 6 * 8 * 10 * 12


def test_conv():
    x = jnp.zeros((2, 16, 16, 3))
    k = jnp.zeros((4, 4, 3, 8))
    f = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (4, 4), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # out 4x4 spatial: 2 * B * OH * OW * Cout * Cin * KH * KW
    assert matmul_conv_flops(f, x, k) == 2 * 2 * 4 * 4 * 8 * 3 * 4 * 4


def test_scan_multiplies_by_length():
    a = jnp.zeros((8, 8))
    def f(x):
        def body(c, _):
            return c @ a, None
        out, _ = jax.lax.scan(body, x, None, length=5)
        return out
    assert matmul_conv_flops(f, jnp.zeros((8, 8))) == 5 * 2 * 8 * 8 * 8


def test_grad_counts_backward_matmuls():
    """Backward matmuls appear natively in the grad jaxpr: a 2-layer chain
    differentiated wrt both weights costs fwd(2) + dW2 + dh + dW1 = 5
    matmuls of equal size."""
    one = 2 * 4 * 16 * 16
    x = jnp.zeros((4, 16))

    def loss(ws):
        return ((x @ ws["w1"]) @ ws["w2"]).sum()

    ws = {"w1": jnp.zeros((16, 16)), "w2": jnp.zeros((16, 16))}
    assert matmul_conv_flops(loss, ws) == 2 * one
    assert matmul_conv_flops(jax.value_and_grad(loss), ws) == 5 * one


def test_jit_boundary_is_transparent():
    a = jnp.zeros((8, 32)); b = jnp.zeros((32, 16))
    assert matmul_conv_flops(jax.jit(jnp.dot), a, b) == 2 * 8 * 32 * 16
