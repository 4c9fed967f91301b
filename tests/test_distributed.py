"""Multi-host bootstrap helpers + --params__ CLI passthrough.

Parity targets: lib/train/run_training_ddp.py:18-24,91-99 (per-rank seeding,
dist_init), DistributedSampler semantics (base_functions.py:232), and
tracking/test.py:72-92 (--params__* dynamic overrides).
"""
import os

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


_WORKER_SRC = '''
import os, sys
import numpy as np
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, {repo!r})
from multi_modal_tracking_tpu.parallel.distributed import (
    initialize_distributed, is_main_process, shard_host_batch, process_seed)
from multi_modal_tracking_tpu.parallel.mesh import create_mesh

ok = initialize_distributed(f"localhost:{{port}}", 2, pid)
assert ok and jax.process_count() == 2 and jax.process_index() == pid
mesh = create_mesh(4)

# Host-local slice of the global batch [0, 1, 2, 3]
local = np.arange(2, dtype=np.float32) + 2 * pid
g = shard_host_batch({{"x": local}}, mesh)

# Cross-host reduction: global sum must see BOTH hosts' data.
total = float(jax.jit(lambda b: b["x"].sum())(g))
assert total == 6.0, total

# Gradient of a global-mean loss == full-batch gradient (the DDP all-reduce
# equivalence: d/dw mean_i (w*x_i - 1)^2 at w=2 over x=[0,1,2,3]).
grad = float(jax.jit(jax.grad(lambda w, b: ((w * b["x"] - 1.0) ** 2).mean()))(2.0, g))
expect = float(np.mean(2 * (2.0 * np.arange(4) - 1.0) * np.arange(4)))
assert abs(grad - expect) < 1e-6, (grad, expect)

assert is_main_process() == (pid == 0)
assert process_seed(100) == 100 + pid
print(f"worker {{pid}} ok")
'''


def test_two_process_multihost_cpu(tmp_path):
    """Real 2-process jax.distributed bootstrap (gloo CPU collectives):
    initialize_distributed forms the group, shard_host_batch assembles a
    global array from host-local slices, and cross-host reductions/grads
    match full-batch values (the reference's DDP all-reduce semantics,
    run_training_ddp.py:91-99)."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    import pathlib
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    worker.write_text(_WORKER_SRC.format(repo=repo))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([_sys.executable, str(worker), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"worker {i} ok" in out
