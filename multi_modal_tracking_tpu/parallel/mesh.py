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
