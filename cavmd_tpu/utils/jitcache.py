"""Persistent XLA compilation cache for benchmark / driver entry points.

The N=100k fused step takes minutes to compile through the remote TPU
compile service; the persistent cache makes re-runs of unchanged code
start in seconds. Enabled by the benchmark scripts and the CLI driver —
NOT at package import (library users own their jax config).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(path: str | None = None) -> None:
    """Point jax at an on-disk compilation cache (idempotent).

    ``CAVMD_JIT_CACHE=0`` disables; ``CAVMD_JIT_CACHE=<dir>`` overrides
    the location (default: ``<repo>/.jax_cache``).
    """
    env = os.environ.get("CAVMD_JIT_CACHE")
    if env == "0":
        return
    path = path or (env if env else _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
