"""Multi-scale deformable attention sampling (MSDeformAttn core op).

Parity target: the reference's CUDA extension
(lib/models/mixformer_vit_rgbt/deformable_attention/ops/src/cuda/*, exposed as
MSDeformAttnFunction) whose numerics are defined by the pure-PyTorch oracle
`ms_deform_attn_core_pytorch`
(ops/functions/ms_deform_attn_func.py:41-61): per (query, head, level, point)
bilinear sampling with grid_sample(align_corners=False, padding_mode='zeros')
at pixel coordinate loc * size - 0.5, followed by an attention-weighted sum.

TPU-first design — three lowerings behind one signature:
  - PALLAS (default on TPU): per (batch, head) grid cell the 16 bilinear
    taps (4 points x 4 corners, attention weights folded in) are compare-
    accumulated into one interpolation matrix A (Lq, H*W) held in VMEM, and
    sampling becomes one MXU matmul A @ V per level. The tracking-shape maps
    (2 levels of 18x18, Lq=648) never leave VMEM; the whole op is ~0.1 GFLOP
    of dense matmul instead of the gather/tiny-einsum soup XLA derives.
    Backward is a custom VJP that recomputes through the XLA composition
    (exact — the op is a differentiable composition, standard remat trade).
  - DENSE XLA (CPU / fallback, levels with H*W <= _DENSE_MAX_SOURCE): same
    interpolation-matrix idea as one einsum per level.
  - GATHER XLA for large maps where a dense matrix would not pay off.

Shapes (L levels with static spatial shapes):
  value              : (B, S, M, D)        S = sum_l H_l*W_l
  spatial_shapes     : static tuple ((H_0, W_0), ...)
  sampling_locations : (B, Lq, M, L, P, 2) normalised to [0, 1], (x, y)
  attention_weights  : (B, Lq, M, L, P)
  returns            : (B, Lq, M * D)
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilinear_sample_level(value_l: jax.Array, loc: jax.Array, H: int, W: int) -> jax.Array:
    """Sample one level.

    value_l : (B, H*W, M, D)
    loc     : (B, Lq, M, P, 2) in [0, 1], (x, y)
    returns : (B, Lq, M, P, D)
    """
    B, _, M, D = value_l.shape
    x = loc[..., 0] * W - 0.5   # (B, Lq, M, P) pixel coords
    y = loc[..., 1] * H - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi, wgt):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        flat = yi_c * W + xi_c                                   # (B, Lq, M, P)
        # Gather per (batch, head): move head next to batch, take_along_axis.
        v = value_l.transpose(0, 2, 1, 3)                        # (B, M, HW, D)
        idx = flat.transpose(0, 2, 1, 3).reshape(B, M, -1)       # (B, M, Lq*P)
        g = jnp.take_along_axis(v, idx[..., None], axis=2)       # (B, M, Lq*P, D)
        g = g.reshape(B, M, flat.shape[1], flat.shape[3], D).transpose(0, 2, 1, 3, 4)
        w = (wgt * inside.astype(value_l.dtype))[..., None]      # (B, Lq, M, P, 1)
        return g * w

    out = tap(x0i, y0i, (1 - fx) * (1 - fy))
    out = out + tap(x0i + 1, y0i, fx * (1 - fy))
    out = out + tap(x0i, y0i + 1, (1 - fx) * fy)
    out = out + tap(x0i + 1, y0i + 1, fx * fy)
    return out


_DENSE_MAX_SOURCE = 4096     # use the einsum lowering for levels this small

#: Per-level source-size bound for the Pallas lowering: A is (Lq, H*W) in
#: VMEM per grid cell.
_PALLAS_MAX_SOURCE = 4096

#: Explicit dispatch override: True -> always Pallas, False -> always XLA,
#: None -> auto by backend (mirrors ops.attention.USE_PALLAS).
USE_PALLAS: Optional[bool] = None

#: Test hook: run the Pallas kernel in interpreter mode (CPU).
FORCE_INTERPRET = False




def _dense_sample_level(value_l: jax.Array, loc: jax.Array, attw: jax.Array,
                        H: int, W: int) -> jax.Array:
    """One level via a dense interpolation matrix (attention weights folded).

    value_l : (B, H*W, M, D)
    loc     : (B, Lq, M, P, 2) in [0, 1], (x, y)
    attw    : (B, Lq, M, P)
    returns : (B, Lq, M, D) — already summed over points.
    """
    B, S, M, D = value_l.shape
    dt = value_l.dtype
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(dt)
    fy = (y - y0).astype(dt)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    cols = jnp.arange(W, dtype=jnp.int32)
    rows = jnp.arange(H, dtype=jnp.int32)

    def axis_mat(i0, f, n, idx):
        # (..., n): weight (1-f) at i0 and f at i0+1, zero outside [0, n)
        e0 = (idx == i0[..., None]).astype(dt)
        e1 = (idx == (i0 + 1)[..., None]).astype(dt)
        return e0 * (1 - f)[..., None] + e1 * f[..., None]

    Ax = axis_mat(x0i, fx, W, cols)                   # (B, Lq, M, P, W)
    Ay = axis_mat(y0i, fy, H, rows)                   # (B, Lq, M, P, H)
    # fold attention weights and sum over points -> (B, Lq, M, H*W)
    A = jnp.einsum("blmph,blmpw->blmhw", Ay * attw.astype(dt)[..., None], Ax)
    A = A.reshape(B, -1, M, S)
    return jnp.einsum("blms,bsmd->blmd", A, value_l)


def _tap_tables(spatial_shapes, sampling_locations, attention_weights):
    """Fold bilinear corner weights and attention weights into per-tap
    (flat index, weight) tables.

    Returns idx (B, M, Lq, L*16) int32 (-1 = dead tap) and
    w (B, M, Lq, L*16) f32, tap-major within each level.
    """
    loc = sampling_locations.astype(jnp.float32)
    attw = attention_weights.astype(jnp.float32)
    B, Lq, M = loc.shape[0], loc.shape[1], loc.shape[2]
    P = loc.shape[4]
    idx_levels, w_levels = [], []
    for lid, (H, W) in enumerate(spatial_shapes):
        idx_parts, w_parts = [], []
        x = loc[:, :, :, lid, :, 0] * W - 0.5          # (B, Lq, M, P)
        y = loc[:, :, :, lid, :, 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        aw = attw[:, :, :, lid]                        # (B, Lq, M, P)
        for xi, yi, bw in ((x0i, y0i, (1 - fx) * (1 - fy)),
                           (x0i + 1, y0i, fx * (1 - fy)),
                           (x0i, y0i + 1, (1 - fx) * fy),
                           (x0i + 1, y0i + 1, fx * fy)):
            inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx_parts.append(jnp.where(inside, yi * W + xi, -1))
            w_parts.append(bw * aw)
        # (B, Lq, M, P, 4) -> (B, Lq, M, P*4), P-major within the level
        idx_levels.append(jnp.stack(idx_parts, -1).reshape(B, Lq, M, P * 4))
        w_levels.append(jnp.stack(w_parts, -1).reshape(B, Lq, M, P * 4))
    idx = jnp.concatenate(idx_levels, axis=-1)         # (B, Lq, M, L*P*4)
    w = jnp.concatenate(w_levels, axis=-1)
    return idx.transpose(0, 2, 1, 3), w.transpose(0, 2, 1, 3)


def _msda_kernel(idx_ref, w_ref, v_ref, o_ref, *, spatial_shapes,
                 taps_per_level, acc_dtype):
    """One batch element, ALL heads: per head build A (Lq, S_l) from the tap
    tables and matmul with V. Heads are a static python loop inside one grid
    cell — with M=8 tiny per-head problems, a (B, M) grid spent more time in
    per-cell launch overhead than in compute (6 fusion layers x 8 cells
    dominated the fusion cost at tracking shapes)."""
    M = idx_ref.shape[1]
    Lq = idx_ref.shape[3]          # tap tables arrive tap-major: (M, T, Lq)
    D = v_ref.shape[3]

    def head_body(m, carry):
        # dynamic head index: one head's temporaries live at a time (a python
        # unroll kept all M heads' (Lq, S_l) tap buffers live and blew the
        # 16 MB VMEM stack)
        acc = jnp.zeros((Lq, D), jnp.float32)
        off = 0
        toff = 0
        for (H, W) in spatial_shapes:
            S_l = H * W
            # Build A TRANSPOSED, (S_l, Lq): each tap is then a row-vector
            # (1, Lq) splat across sublanes — the cheap broadcast direction.
            # Building (Lq, S_l) directly needs a (Lq, 1) lane-extract +
            # lane-broadcast per tap, which measured ~8x slower (the A-build
            # was 90% of the kernel). The MXU takes the transposed operand
            # natively in the dot_general below.
            iota_s = jax.lax.broadcasted_iota(jnp.int32, (S_l, Lq), 0)
            A_T = jnp.zeros((S_l, Lq), jnp.float32)
            for t in range(taps_per_level):
                idx_t = idx_ref[0, m, toff + t: toff + t + 1, :]   # (1, Lq)
                w_t = w_ref[0, m, toff + t: toff + t + 1, :]
                A_T = A_T + jnp.where(iota_s == idx_t,
                                      w_t.astype(jnp.float32), 0.0)
            V_l = v_ref[0, m, off: off + S_l, :]                    # (S_l, D)
            acc = acc + jax.lax.dot_general(
                A_T.astype(acc_dtype), V_l,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            off += S_l
            toff += taps_per_level
        o_ref[0, m] = acc.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, M, head_body, 0)


def _msda_pallas_fwd(value, spatial_shapes, sampling_locations,
                     attention_weights, interpret=False):
    B, S, M, D = value.shape
    Lq = sampling_locations.shape[1]
    idx, w = _tap_tables(spatial_shapes, sampling_locations, attention_weights)
    # bf16 A rides the MXU at full rate; its 8-bit mantissa covers the
    # bilinear-weight resolution needed at 18x18 tracking maps. Keep f32
    # when the value itself is f32 (CPU tests / strict parity).
    acc_dtype = value.dtype if value.dtype == jnp.bfloat16 else jnp.float32
    T = idx.shape[-1]
    kernel = functools.partial(_msda_kernel, spatial_shapes=tuple(spatial_shapes),
                               taps_per_level=T // len(spatial_shapes),
                               acc_dtype=acc_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, M, T, Lq), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, T, Lq), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, S, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, Lq, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, Lq, D), value.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * Lq * S * D,
            bytes_accessed=(2 * B * M * Lq * T * 4 + B * S * M * D
                            * value.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
        # tap-major (T, Lq) layout: each tap row is a native (1, Lq) lane
        # vector splat across sublanes in the kernel's A_T build
    )(idx.transpose(0, 1, 3, 2), w.astype(acc_dtype).transpose(0, 1, 3, 2),
      value.transpose(0, 2, 1, 3))
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, M * D)


def _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                        attention_weights):
    """Differentiable XLA composition (dense / gather lowerings)."""
    B, S, M, D = value.shape
    Lq = sampling_locations.shape[1]
    L = len(spatial_shapes)
    assert sampling_locations.shape[3] == L

    sizes = [h * w for h, w in spatial_shapes]
    assert sum(sizes) == S
    offs = 0
    out = None
    gathered = []
    for lid, (H, W) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value, offs, offs + sizes[lid], axis=1)
        offs += sizes[lid]
        if sizes[lid] <= _DENSE_MAX_SOURCE:
            o = _dense_sample_level(value_l, sampling_locations[:, :, :, lid],
                                    attention_weights[:, :, :, lid], H, W)
            out = o if out is None else out + o
        else:
            gathered.append((lid, _bilinear_sample_level(
                value_l, sampling_locations[:, :, :, lid], H, W)))
    if gathered:
        samp = jnp.stack([g for _, g in gathered], axis=3)   # (B, Lq, M, Lg, P, D)
        attw = attention_weights[:, :, :, [lid for lid, _ in gathered]]
        o = (samp * attw[..., None]).sum(axis=(3, 4))
        out = o if out is None else out + o
    return out.reshape(B, Lq, M * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_fused(value, spatial_shapes, sampling_locations,
                         attention_weights, interpret=False):
    """Pallas-fused MSDA forward with exact XLA backward (see module doc)."""
    return _msda_pallas_fwd(value, spatial_shapes, sampling_locations,
                            attention_weights, interpret)


def _fused_fwd(value, spatial_shapes, loc, attw, interpret):
    out = _msda_pallas_fwd(value, spatial_shapes, loc, attw, interpret)
    return out, (value, loc, attw)


def _msda_bwd_kernel(idxT_ref, wT_ref, v_ref, g_ref, dv_ref,
                     dwtT_ref, *, spatial_shapes, taps_per_level, acc_dtype):
    """Backward of the folded-tap formulation, one batch element per cell.

    out[q] = sum_t w[q,t] * V[idx[q,t]]  per level, so
      dV   = A^T @ g          (A^T built tap-by-tap like the forward's A)
      dw[q,t] = (g @ V^T)[q, idx[q,t]]   (extracted with the same one-hots)
    Both are VMEM compare-accumulates + MXU matmuls; the chain from dw to
    d(attention_weights) / d(sampling_locations) is cheap elementwise work
    done outside the kernel. The XLA dense-vjp alternative materialises the
    (B, Lq, M, S) one-hot matrices in HBM and dominated the train step.

    Grid is (B, M) — one head per cell: the backward holds A_T, dWf AND both
    outputs live, so an all-heads cell overflows the 16 MB VMEM stack at
    train batch. Everything runs in the transposed (source-major) orientation
    so every tap touch is a native (1, Lq) row broadcast / row store."""
    Lq = idxT_ref.shape[3]
    D = v_ref.shape[3]
    g_m = g_ref[0, 0]                                       # (Lq, D)
    off = 0
    toff = 0
    for (H, W) in spatial_shapes:
        S_l = H * W
        V_l = v_ref[0, 0, off: off + S_l, :]                # (S_l, D)
        # --- dV = A^T @ g ----------------------------------------------
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (S_l, Lq), 0)
        A_T = jnp.zeros((S_l, Lq), jnp.float32)
        for t in range(taps_per_level):
            # tap-major layout: native (1, Lq) rows, no per-tap relayout
            idx_t = idxT_ref[0, 0, toff + t: toff + t + 1, :]    # (1, Lq)
            w_t = wT_ref[0, 0, toff + t: toff + t + 1, :]
            A_T = A_T + jnp.where(iota_s == idx_t,
                                  w_t.astype(jnp.float32), 0.0)
        dv_ref[0, 0, off: off + S_l, :] = jax.lax.dot_general(
            A_T.astype(acc_dtype), g_m,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        # --- dw[q,t] = dWf[q, idx[q,t]], transposed: dWfT[s, q] --------
        dWfT = jax.lax.dot_general(
            V_l, g_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (S_l, Lq)
        for t in range(taps_per_level):
            idx_t = idxT_ref[0, 0, toff + t: toff + t + 1, :]    # (1, Lq)
            picked = jnp.where(iota_s == idx_t, dWfT, 0.0)
            dwtT_ref[0, 0, toff + t: toff + t + 1, :] = jnp.sum(
                picked, axis=0, keepdims=True).astype(dwtT_ref.dtype)
        off += S_l
        toff += taps_per_level


def _msda_pallas_bwd(value, spatial_shapes, loc, attw, g, interpret=False):
    """Pallas backward: returns (dValue, dLoc, dAttw) matching primal dtypes."""
    B, S, M, D = value.shape
    Lq = loc.shape[1]
    L = len(spatial_shapes)
    P = loc.shape[4]
    idx, w = _tap_tables(spatial_shapes, loc, attw)         # (B, M, Lq, T)
    T = idx.shape[-1]
    acc_dtype = value.dtype if value.dtype == jnp.bfloat16 else jnp.float32
    g4 = g.reshape(B, Lq, M, D).transpose(0, 2, 1, 3)        # (B, M, Lq, D)
    kernel = functools.partial(
        _msda_bwd_kernel, spatial_shapes=tuple(spatial_shapes),
        taps_per_level=T // L, acc_dtype=acc_dtype)

    def spec(*shape):
        nd = len(shape)
        return pl.BlockSpec((1, 1) + shape,
                            (lambda b, m: (b, m) + (0,) * nd),
                            memory_space=pltpu.VMEM)

    dv, dwt = pl.pallas_call(
        kernel,
        grid=(B, M),
        in_specs=[spec(T, Lq), spec(T, Lq), spec(S, D),
                  spec(Lq, D)],
        out_specs=[spec(S, D), spec(T, Lq)],
        out_shape=[jax.ShapeDtypeStruct((B, M, S, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, M, T, Lq), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * M * Lq * S * D,
            bytes_accessed=(2 * B * M * Lq * T * 4
                            + 2 * B * S * M * D * value.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx.transpose(0, 1, 3, 2),
      w.astype(acc_dtype).transpose(0, 1, 3, 2),
      value.transpose(0, 2, 1, 3).astype(acc_dtype),
      g4.astype(acc_dtype))

    dvalue = dv.transpose(0, 2, 1, 3).astype(value.dtype)    # (B, S, M, D)

    # chain dw (folded tap weights) -> dAttw, dLoc, recomputing the bilinear
    # factors (cheap (B, Lq, M, P) elementwise work)
    dwt = dwt.transpose(0, 3, 1, 2)                          # (B, Lq, M, T)
    dwt = dwt.reshape(B, Lq, M, L, P, 4)
    locf = loc.astype(jnp.float32)
    attf = attw.astype(jnp.float32)
    dAw = jnp.zeros((B, Lq, M, L, P), jnp.float32)
    dLoc = jnp.zeros((B, Lq, M, L, P, 2), jnp.float32)
    for lid, (H, W) in enumerate(spatial_shapes):
        x = locf[:, :, :, lid, :, 0] * W - 0.5
        y = locf[:, :, :, lid, :, 1] * H - 0.5
        fx = x - jnp.floor(x)
        fy = y - jnp.floor(y)
        aw = attf[:, :, :, lid]
        d = dwt[:, :, :, lid]                                # (B, Lq, M, P, 4)
        bw = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                        (1 - fx) * fy, fx * fy], axis=-1)
        dAw = dAw.at[:, :, :, lid].set(jnp.sum(bw * d, axis=-1))
        dbw = aw[..., None] * d                              # (B, Lq, M, P, 4)
        dfx = (-(1 - fy) * dbw[..., 0] + (1 - fy) * dbw[..., 1]
               - fy * dbw[..., 2] + fy * dbw[..., 3])
        dfy = (-(1 - fx) * dbw[..., 0] - fx * dbw[..., 1]
               + (1 - fx) * dbw[..., 2] + fx * dbw[..., 3])
        dLoc = dLoc.at[:, :, :, lid, :, 0].set(dfx * W)
        dLoc = dLoc.at[:, :, :, lid, :, 1].set(dfy * H)
    return (dvalue, dLoc.astype(loc.dtype), dAw.astype(attw.dtype))


def _fused_bwd(spatial_shapes, interpret, res, g):
    value, loc, attw = res
    fits = all(h * w <= _PALLAS_MAX_SOURCE for h, w in spatial_shapes)
    if fits:
        return _msda_pallas_bwd(value, spatial_shapes, loc, attw, g,
                                interpret)
    # Fallback: recompute through the DENSE one-hot lowering — its vjp is
    # matmuls with transposed interpolation matrices, all MXU work. (A
    # gather-lowering recompute was measured ~2x slower end-to-end at train
    # batch: its vjp is scatter-adds, which TPUs serialise.)
    _, vjp = jax.vjp(
        lambda v, l, w: _ms_deform_attn_xla(v, spatial_shapes, l, w),
        value, loc, attw)
    return vjp(g)


ms_deform_attn_fused.defvjp(_fused_fwd, _fused_bwd)


def use_pallas_default() -> bool:
    """True when the fused kernel should be used: explicit USE_PALLAS
    override if set, else TPU backend auto-detect."""
    if USE_PALLAS is not None:
        return USE_PALLAS
    return jax.default_backend() == "tpu" and not FORCE_INTERPRET


def ms_deform_attn(value: jax.Array,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jax.Array,
                   attention_weights: jax.Array,
                   use_pallas: Optional[bool] = None) -> jax.Array:
    """Multi-scale deformable attention core (see module docstring).

    Dispatches to the Pallas kernel on TPU when every level's map fits the
    VMEM-resident interpolation matrix, else the XLA composition."""
    if use_pallas is None:
        use_pallas = use_pallas_default()
    fits = all(h * w <= _PALLAS_MAX_SOURCE for h, w in spatial_shapes)
    if (use_pallas or FORCE_INTERPRET) and fits:
        return ms_deform_attn_fused(value, tuple(spatial_shapes),
                                    sampling_locations, attention_weights,
                                    FORCE_INTERPRET)
    return _ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                               attention_weights)

