"""Persistent XLA compilation cache wiring.

Compiles through the axon tunnel cost 20-40 s when healthy and can degrade
to 20+ minutes when the remote compile service is congested (CLAUDE.md);
a warm persistent-cache entry bypasses the remote compile entirely. Every
long-lived entry point (Trainer, create_tracker) calls this idempotently so
CLI subprocess chains (train -> test -> analysis, the rehearsal artifacts)
stop re-compiling identical programs per process.
"""
from __future__ import annotations

import os


def enable_persistent_compile_cache(path: str | None = None) -> None:
    """Point jax at the on-disk compilation cache unless already configured."""
    import jax
    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return
    path = path or os.environ.get(
        "MMT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_comp"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass          # cache is an optimisation, never a requirement
