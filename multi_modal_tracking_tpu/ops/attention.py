"""Fused asymmetric mixed attention (the MixFormer hot op) as a Pallas kernel.

Semantics (lib/models/mixformer_vit/mixformer.py Attention.forward :51-77):
tokens are [templates (n_mt) ; search (N - n_mt)]; template queries attend
only to template keys, search queries attend to every key. The reference
implements this as two separate SDPA calls; XLA materialises both (Nq, Nk)
probability matrices in HBM. This kernel fuses mask + softmax + both matmuls
in VMEM per (batch, head) grid cell — the attention matrix never touches
HBM, which is the classic flash-attention bandwidth win at training batch
sizes (12 blocks x batch x (904x904) f32 ≈ GBs of traffic per step).

The asymmetry is one static mask: allowed(i, j) = (i >= n_mt) | (j < n_mt).

Backward: custom VJP with the same rematerialisation trade (residuals are
only q/k/v instead of the N² matrix). For token counts within the VMEM
budget (_BWD_MAX_N) the recompute + all three grads run as a second fused
Pallas kernel (_attn_bwd_kernel, measured 1.9x the XLA lowering as an
isolated op at the flagship train shape — but a net LOSS in the full train
graph, see use_pallas_default, so differentiated calls default to XLA);
above _BWD_MAX_N the backward falls back to plain XLA ops.

Tests run the kernel in interpreter mode on CPU against the two-call XLA
reference (tests/test_pallas_attention.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mask(n_mt: int, nq: int, nk: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
    return (rows >= n_mt) | (cols < n_mt)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_mt: int, scale: float):
    q = q_ref[0, 0]                                # (N, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(_mask(n_mt, q.shape[0], k.shape[0]), s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(p.astype(v.dtype), v,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _mixed_attention_fwd_pallas(q, k, v, n_mt: int, scale: float,
                                interpret: bool = False):
    """q: (B, H, Nq, D); k/v: (B, H, Nk, D) -> (B, H, Nq, D).

    Nq may differ from Nk (the cross-modal flagship passes per-modality key
    layouts with extra template keys); the asymmetric mask threshold n_mt
    applies to both axes."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    kernel = functools.partial(_attn_kernel, n_mt=n_mt, scale=scale)

    def spec(n):
        return pl.BlockSpec((1, 1, n, D), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[spec(Nq), spec(Nk), spec(Nk)],
        out_specs=spec(Nq),
        out_shape=jax.ShapeDtypeStruct((B, H, Nq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Nq * Nk * D,
            bytes_accessed=(B * H * (Nq + 2 * Nk) * D + B * H * Nq * D)
            * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
        interpret=interpret,
    )(q, k, v)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                     n_mt: int, scale: float):
    """Fused backward per (batch, head) cell: recompute p in VMEM, then all
    three grads without the (Nq, Nk) matrices ever touching HBM."""
    q = q_ref[0, 0]                                # (Nq, D)
    k = k_ref[0, 0]                                # (Nk, D)
    v = v_ref[0, 0]
    g = g_ref[0, 0]                                # (Nq, D) cotangent
    mask = _mask(n_mt, q.shape[0], k.shape[0])
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)     # (Nq, Nk) f32
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    ds = jnp.where(mask, ds, 0.0) * scale          # (Nq, Nk) f32
    dq_ref[0, 0] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)


#: Largest key/query count for the whole-(Nq, Nk)-per-cell backward kernel:
#: four f32 (Nq, Nk) temporaries must fit the ~16 MB VMEM scoped stack
#: (N=640 -> 4 x 1.6 MB; flagship train is N=452).
_BWD_MAX_N = 640


def _mixed_attention_bwd_pallas(q, k, v, g, n_mt: int, scale: float,
                                interpret: bool = False):
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    kernel = functools.partial(_attn_bwd_kernel, n_mt=n_mt, scale=scale)

    def spec(n):
        return pl.BlockSpec((1, 1, n, D), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[spec(Nq), spec(Nk), spec(Nk), spec(Nq)],
        out_specs=[spec(Nq), spec(Nk), spec(Nk)],
        out_shape=[jax.ShapeDtypeStruct((B, H, Nq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, Nk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Nk, D), v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * B * H * Nq * Nk * D,
            bytes_accessed=4 * B * H * (Nq + 2 * Nk) * D * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
        interpret=interpret,
    )(q, k, v, g)


def mixed_attention_xla(q, k, v, n_mt: int, scale: float):
    """Two-call XLA reference (identical math to the reference's
    Attention.forward). q/k/v: (B, H, N, D)."""
    q_mt, q_s = q[:, :, :n_mt], q[:, :, n_mt:]
    k_mt, v_mt = k[:, :, :n_mt], v[:, :, :n_mt]

    def attend(qq, kk, vv):
        a = jnp.einsum("bhqd,bhkd->bhqk", qq, kk) * scale
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(qq.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", a, vv)

    x_mt = attend(q_mt, k_mt, v_mt)
    x_s = attend(q_s, k, v)
    return jnp.concatenate([x_mt, x_s], axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def mixed_attention_fused(q, k, v, n_mt: int, scale: float,
                          interpret: bool = False):
    """Pallas-fused asymmetric mixed attention with exact XLA backward."""
    return _mixed_attention_fwd_pallas(q, k, v, n_mt, scale, interpret)


def _fused_fwd(q, k, v, n_mt, scale, interpret):
    out = _mixed_attention_fwd_pallas(q, k, v, n_mt, scale, interpret)
    return out, (q, k, v)


def _fused_bwd(n_mt, scale, interpret, res, g):
    q, k, v = res
    if max(q.shape[2], k.shape[2]) <= _BWD_MAX_N:
        # Fused Pallas backward: probabilities recomputed and consumed
        # entirely in VMEM (see _attn_bwd_kernel).
        return tuple(_mixed_attention_bwd_pallas(q, k, v, g, n_mt, scale,
                                                 interpret))
    # Exact gradients via recomputed probabilities (rematerialisation).
    mask = _mask(n_mt, q.shape[2], k.shape[2])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    ds = jnp.where(mask, ds, 0.0) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


mixed_attention_fused.defvjp(_fused_fwd, _fused_bwd)


def use_pallas_default(*arrays) -> bool:
    """True when the fused kernel should run for THIS call: the explicit
    USE_PALLAS override if set, otherwise False — there is NO automatic
    dispatch (every measured production shape loses in-graph; see below).
    The array arguments are accepted (callers pass q/k/v) so a future
    shape-aware policy can slot in without touching call sites; they are
    deliberately unused today.

    Measured on a v5e chip (2026-08-17, scan-chained ops, scalar-fetch
    timing), pallas vs XLA, ISOLATED op:
      forward-only:  B2xH12xN452 1.01x | B32xN452 1.44x | B16xH16xN864 1.64x
      fwd+bwd with the fused VMEM backward (_attn_bwd_kernel, N <= 640):
                     B32xN452 1.93x | B32xNq452xNk580 (CE cross-modal) 1.76x
      fwd+bwd when the backward falls back to XLA recompute (N > 640):
                     B16xH16xN864 0.83x — a net LOSS vs plain XLA
      under vmap (batched tracker lockstep): bench regressed 470->434 f/s
    IN-GRAPH cached forward_track (2026-08-18, K>=1024-chained scans):
    B=1 Pallas 2.00 ms vs XLA 1.84 ms; lockstep B=16 37.0 vs 35.6 ms — the
    device's measured ~57-62 TFLOP/s matmul ceiling (artifacts/
    profile_peak.py), not attention-matrix HBM traffic, bounds both.
    IN-GRAPH (full flagship train step, B=16, 24-step draws, interleaved
    processes): XLA 118.3 ms vs Pallas 122.3 ms, consistent across draws —
    the isolated fwd+bwd win does NOT survive XLA's fusion context (the
    custom-call boundary blocks the surrounding elementwise fusions that the
    two-call lowering keeps).

    Policy: OPT-IN ONLY (USE_PALLAS=True / the use_pallas= argument).
    Auto-dispatch is off because (a) every production path measured so far
    either loses in-graph (train fwd+bwd), regresses under vmap (batched
    lockstep 470->434 f/s), or is below the isolated-win region (B*H=24
    single-stream); the remaining candidate — large-batch forward-only
    eval — is unmeasured in-graph; and (b) the flagship's cached-template
    fast paths always run the XLA lowering, so auto-dispatching the full
    forward would silently break their bit-identity invariant (CLAUDE.md)
    on exactly the shapes where the kernel fires."""
    if USE_PALLAS is not None:
        return USE_PALLAS
    return False


def mixed_attention(q, k, v, n_mt: int, scale: float,
                    use_pallas: Optional[bool] = None):
    """Dispatcher: XLA two-call lowering by default; the fused Pallas kernels
    (fwd, and the VMEM backward within _BWD_MAX_N) on explicit opt-in only
    (USE_PALLAS / the use_pallas= argument — see use_pallas_default for the
    measurements behind the default). Tests run the kernels in interpreter
    mode via ops.attention.FORCE_INTERPRET."""
    if use_pallas is None:
        use_pallas = use_pallas_default(q, k, v)
    if use_pallas or FORCE_INTERPRET:
        return mixed_attention_fused(q, k, v, n_mt, scale, FORCE_INTERPRET)
    return mixed_attention_xla(q, k, v, n_mt, scale)


#: Explicit dispatch override: True -> always fused kernel, False/None ->
#: XLA lowering (the measured default; see use_pallas_default).
USE_PALLAS: Optional[bool] = None

#: Test hook: run the Pallas kernel in interpreter mode (CPU).
FORCE_INTERPRET = False
