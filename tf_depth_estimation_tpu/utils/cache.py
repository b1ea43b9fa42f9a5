"""Persistent XLA compilation cache.

Compiles through the axon tunnel take minutes; JAX's persistent cache works through it
(measured: 9.6 s -> 0.6 s for a cached DispNet forward) and equally accelerates the CPU
test suite.  Call ``enable_compilation_cache()`` before the first jit in a process.
"""
from __future__ import annotations

import os


def enable_compilation_cache(directory: str | None = None,
                             min_compile_secs: float = 1.0) -> str:
    import jax

    directory = directory or os.environ.get(
        "TFDE_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return directory
