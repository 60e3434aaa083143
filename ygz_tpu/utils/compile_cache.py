"""Persistent XLA compilation cache, shared by bench/tests/tools.

One call makes every jit compile land in (and load from) a repo-local cache
directory. This is load-bearing on the tunneled TPU: server-side XLA
compiles degrade the link's dispatch RTT from ~0.1 ms to 26-50 ms for many
minutes (the round-2 benchmark collapse), while cache LOADS do not — so a
fully warm cache is the difference between an RTT-bound and a kernel-bound
steady state. The cache lives in the repo (not /tmp) so it survives
machine-level /tmp cleanup between benchmark rounds.
"""
from __future__ import annotations

import os


def cache_dir() -> str:
    env = os.environ.get("YGZ_JAX_CACHE")
    if env:
        return env
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, ".jax_cache")


def enable():
    """Point jax's persistent compilation cache at the repo-local dir."""
    import jax

    d = cache_dir()
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d
