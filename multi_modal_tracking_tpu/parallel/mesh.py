"""Device mesh + sharding helpers (the TPU-native replacement for the
reference's NCCL DDP stack, SURVEY.md §2.6).

The reference is single-node data-parallel (torchrun + DDP + NCCL +
DistributedSampler + SyncBN). Here the same capability is one 'data' mesh
axis: batches are sharded on it, params/optimizer state are replicated, and
XLA's SPMD partitioner inserts the gradient all-reduces over ICI. BatchNorm
statistics are computed over the *global* (logical) batch under GSPMD, so
SyncBatchNorm semantics come for free — no wrapper module needed.

Multi-host: call jax.distributed.initialize() before create_mesh(); the same
code then spans hosts (DCN) transparently.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the default platform; if it has fewer devices than
    requested, fall back to the (possibly virtualised) CPU backend so
    multi-chip code paths can be exercised on a single-chip host."""
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        devs = jax.devices("cpu")
    if n_devices is not None:
        assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def create_mesh_2d(n_data: int, n_model: int,
                   axes: Sequence[str] = ("data", "model")) -> Mesh:
    """2-D (data x model) mesh for combined data + tensor parallelism.

    The reference has no TP (models are <= ViT-L, SURVEY §2.6); here it comes
    from GSPMD: annotate the params with param_shardings() and the SAME train
    step emits Megatron-style column/row-parallel matmuls with all-reduces
    over ICI — no model-code changes."""
    devs = jax.devices()
    need = n_data * n_model
    if len(devs) < need:
        devs = jax.devices("cpu")
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[:need]).reshape(n_data, n_model), tuple(axes))


def param_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """Megatron-style tensor-parallel PartitionSpecs for a flax param tree.

    Column-parallel (shard the output dim): attention qkv, MLP fc1/linear1.
    Row-parallel (shard the input dim): attention out-proj, MLP fc2/linear2.
    Everything else (LNs, biases of row-parallel layers, embeds, convs,
    heads) replicated. Biases of column-parallel layers shard with their
    outputs. Dims that don't divide the model axis stay replicated."""
    if model_axis not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    n_model = mesh.shape[model_axis]
    col_names = {"qkv", "fc1", "linear1"}
    row_names = {"proj", "fc2", "linear2", "output_proj"}

    def spec_for(path, x):
        names = [getattr(k, "key", str(k)) for k in path]
        owner = names[-2] if len(names) >= 2 else ""
        leaf = names[-1]
        if x.ndim >= 2 and leaf == "kernel":
            if owner in col_names and x.shape[-1] % n_model == 0:
                return P(*([None] * (x.ndim - 1)), model_axis)
            if owner in row_names and x.shape[-2] % n_model == 0:
                return P(*([None] * (x.ndim - 2)), model_axis, None)
        if leaf == "bias" and owner in col_names and x.shape[-1] % n_model == 0:
            return P(*([None] * (x.ndim - 1)), model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec_for(p, x)), params)


def fsdp_shardings(tree, mesh: Mesh, axis: str = "data",
                   min_size: int = 1024):
    """ZeRO/FSDP-style shardings: every large parameter (and, applied to a
    TrainState, its Adam moments — optax mirrors the param tree, so the same
    path rules hit mu/nu) is sharded along the `axis` mesh dimension on its
    largest divisible dim. Under GSPMD the train step then all-gathers each
    weight just before use and reduce-scatters its gradient, so per-device
    parameter + optimizer memory drops ~mesh.shape[axis]x while the step
    stays numerically identical to replicated DP (tests/test_fsdp.py).

    The reference has nothing like this (plain DDP replicates everything);
    it's the TPU-native capability that unlocks models larger than one
    chip's HBM. Small leaves (< min_size elements) and dims that don't
    divide the axis stay replicated — sharding them would cost more in
    collective latency than it saves."""
    if axis not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    n = mesh.shape[axis]

    def spec_for(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.size < min_size or \
                not _is_inexact(x):
            return P()
        # largest dim divisible by the axis size, preferring trailing dims
        # (kernel output dims — keeps gathered layouts contiguous)
        for d in sorted(range(x.ndim), key=lambda d: (x.shape[d], d), reverse=True):
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return P(*spec)
        return P()

    return jax.tree.map(lambda x: NamedSharding(mesh, spec_for(x)), tree)


def _is_inexact(x) -> bool:
    """Float/complex leaves only: integer leaves (step counters, MultiSteps
    counters) stay replicated. Leaves with no dtype (python scalars in an
    opt_state) are replicated too. jnp.issubdtype (not np) so extended
    dtypes like bfloat16 classify as inexact."""
    dtype = getattr(x, "dtype", None)
    return dtype is not None and jnp.issubdtype(dtype, jnp.inexact)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host pytree of arrays with leading batch dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
