"""Test configuration: force an 8-device CPU mesh before jax initialises.

Multi-device sharding tests run on virtual CPU devices
(xla_force_host_platform_device_count), which the NCCL-based reference could
never do; kernels are validated against cv2 / torch-cpu oracles.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# This XLA CPU build defaults to low-precision matmuls (bf16-equivalent);
# pin full f32 so oracle comparisons are deterministic. Production code sets
# precision explicitly on parity-critical ops and uses bf16 elsewhere.
jax.config.update("jax_default_matmul_precision", "highest")
