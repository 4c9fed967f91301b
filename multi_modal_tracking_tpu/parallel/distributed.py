"""Multi-host bootstrap + host-local batch sharding.

Parity target: the reference's DDP bootstrap (lib/train/run_training_ddp.py:
91-99 dist_init + per-rank seeding :18-24, torchrun launch tracking/train.py:
41-45). The TPU-native shape of the same capability:

- one `jax.distributed.initialize()` call forms the host group over DCN
  (replaces `dist.init_process_group("nccl")` + torchrun env plumbing);
- the global mesh then spans every host's chips; gradient all-reduces ride
  ICI within a slice and DCN across slices, inserted by GSPMD — there is no
  DDP wrapper to apply;
- each host feeds only its own shard of the global batch
  (`shard_host_batch`, the DistributedSampler analogue);
- rank gating is `jax.process_index() == 0` (checkpoints/logs).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Form the multi-host process group. Returns True if a group was formed.

    Explicit args win; otherwise standard env vars are honoured
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU-pod metadata auto-detection built into jax.distributed.initialize).
    A no-op for single-process runs (nothing configured) so the same CLI
    works on one host.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not (coordinator_address or on_pod):
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except ValueError as e:
        # Swallow ONLY the "could not determine a coordinator" class of
        # failure: some environments export TPU_WORKER_HOSTNAMES with
        # unusable contents (e.g. proxied single-chip setups), where
        # auto-detection cannot even produce an address. Genuine pod
        # connect/barrier failures (RuntimeError) must propagate — silently
        # falling back there would split-brain a real multi-host job.
        if coordinator_address:
            raise
        print(f"jax.distributed auto-init failed ({e}); single-process run")
        return False
    return True


def is_main_process() -> bool:
    """Rank-0 gate (reference lib/utils/misc.py:is_main_process)."""
    return jax.process_index() == 0


def process_seed(base_seed: int) -> int:
    """Per-process seed (run_training_ddp.py:18-24 base_seed + local_rank)."""
    return base_seed + jax.process_index()


def shard_host_batch(batch, mesh, axis: str = "data"):
    """Assemble a globally-sharded batch from each host's LOCAL slice.

    Single-process: a plain sharded device_put (identical to
    parallel.mesh.shard_batch). Multi-process: each host passes only its own
    `global_batch_size / process_count` samples and the result is a global
    jax.Array whose addressable shards are exactly this host's data — the
    DistributedSampler equivalent, with no cross-host copy.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
