"""Multi-host bootstrap helpers + --params__ CLI passthrough.

Parity targets: lib/train/run_training_ddp.py:18-24,91-99 (per-rank seeding,
dist_init), DistributedSampler semantics (base_functions.py:232), and
tracking/test.py:72-92 (--params__* dynamic overrides).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multi_modal_tracking_tpu.parallel.distributed import (
    initialize_distributed, is_main_process, process_seed, shard_host_batch)
from multi_modal_tracking_tpu.parallel.mesh import create_mesh, shard_batch


def test_initialize_noop_single_process(monkeypatch):
    for v in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
              "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    assert initialize_distributed() is False
    assert is_main_process()
    assert process_seed(42) == 42


def test_shard_host_batch_matches_shard_batch():
    mesh = create_mesh(8)
    batch = {"x": np.arange(64, dtype=np.float32).reshape(16, 4),
             "y": np.ones((16,), np.float32)}
    a = shard_host_batch(batch, mesh)
    b = shard_batch(batch, mesh)
    for k in batch:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # the leading dim really is spread over the 8 devices
    assert len(a["x"].addressable_shards) == 8
    assert a["x"].addressable_shards[0].data.shape == (2, 4)


def test_loader_uses_local_batch_slice(monkeypatch):
    """With N processes the per-host loader batch is BATCH_SIZE // N."""
    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.train import builders

    cfg = get_default_config("asymmetric_shared_ce")
    cfg.DATA.TRAIN.DATASETS_NAME = ["SyntheticRGBT"]
    cfg.DATA.TRAIN.SAMPLE_PER_EPOCH = 8
    cfg.DATA.VAL.DATASETS_NAME = []
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.NUM_WORKER = 0
    cfg.DATA.SEARCH.SIZE = 64
    cfg.DATA.TEMPLATE.SIZE = 32

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    train_loader, _ = builders.build_dataloaders(cfg, seed=0)
    assert train_loader.batch_size == 2


def test_params_passthrough_parser():
    import argparse
    from tracking.test import _parse_params_overrides
    parser = argparse.ArgumentParser()
    out = _parse_params_overrides(
        parser, ["--params__search_area_scale", "4.55",
                 "--params__model=ep300.msgpack",
                 "--params__debug", "True"])
    assert out == {"search_area_scale": 4.55, "model": "ep300.msgpack",
                   "debug": True}
    with pytest.raises(SystemExit):
        _parse_params_overrides(parser, ["--bogus", "1"])
