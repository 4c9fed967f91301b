"""Analytic model-FLOP counting from the jaxpr.

`XLA cost_analysis()` counts every HLO op — gathers, scatters, elementwise,
reductions — so it overstates the MFU numerator (BENCH_r02 quoted 70 TFLOP/s
effective on a chip whose measured matmul ceiling is 57-62, VERDICT r2 #5).
The convention for MFU (PaLM appendix B, nanoGPT) counts MATMUL/CONV FLOPs
only: this walker sums 2*M*N*K over every `dot_general` and the equivalent
for every `conv_general_dilated` in the UNOPTIMISED jaxpr, recursing through
pjit/scan/cond/remat/custom-vjp, multiplying scan bodies by their trip count.
Counting the jaxpr of a value_and_grad+update step therefore includes the
backward pass natively (transposed matmuls are dot_generals too) — no 3x
heuristic.  This is the same accounting the reference does by hand in
tracking/profile_model.py get_complexity_* (:43-80), made mechanical.
"""
from __future__ import annotations

import math
from typing import Any

import jax
from jax import core as jcore
import numpy as np


def _dot_flops(eqn) -> float:
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    dims = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dims
    batch = math.prod(a.shape[i] for i in lb) if lb else 1
    k = math.prod(a.shape[i] for i in lc) if lc else 1
    m = math.prod(a.shape[i] for i in range(len(a.shape))
                  if i not in set(lc) | set(lb))
    n = math.prod(b.shape[i] for i in range(len(b.shape))
                  if i not in set(rc) | set(rb))
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = (eqn.params.get("feature_group_count", 1) *
              eqn.params.get("batch_group_count", 1))
    batch = out.shape[dn.out_spec[0]]
    c_out = out.shape[dn.out_spec[1]]
    out_spatial = math.prod(out.shape[i] for i in dn.out_spec[2:])
    c_in = lhs.shape[dn.lhs_spec[1]]
    kernel = math.prod(rhs.shape[i] for i in dn.rhs_spec[2:])
    return 2.0 * batch * out_spatial * c_out * (c_in // groups) * kernel


def _count_jaxpr(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _count_jaxpr(eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # no static trip count; count one body iteration (rare here)
            total += _count_jaxpr(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(_count_jaxpr(b.jaxpr)
                         for b in eqn.params["branches"])
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += _count_jaxpr(sub.jaxpr
                                          if hasattr(sub, "jaxpr") else sub)
                    break
    return total


def matmul_conv_flops(fn, *args, **kwargs) -> float:
    """Total matmul+conv FLOPs of one call of `fn` (abstract evaluation — no
    execution, no compile)."""
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return _count_jaxpr(jaxpr.jaxpr)
