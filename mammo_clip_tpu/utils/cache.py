"""Persistent XLA compilation cache setup.

One place owns the cache recipe (dir env var + min-compile-time threshold):
a drifted copy in one script would silently lose cache hits there, and on
this class of TPU deployment a fresh B5 train-step compile costs 10-40 min
through the remote compile service, so a lost hit is a real outage. Every
CLI driver and benchmark script calls this before building executables.

The reference has no analogue (torch eager recompiles nothing); this is
XLA-specific infrastructure.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = "/root/repo/.jax_cache"


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument, ``MAMMO_CLIP_JAX_CACHE`` env var,
    the repo-local default. Returns the directory used. Safe to call more
    than once (last call wins, same as jax.config semantics).
    """
    import jax

    cache_dir = cache_dir or os.environ.get("MAMMO_CLIP_JAX_CACHE", _DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took >= 1 s to compile: the default (a few seconds)
    # would skip the many mid-size executables (eval fns, embed fns) whose
    # remote compiles still cost minutes on a relay toolchain.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
