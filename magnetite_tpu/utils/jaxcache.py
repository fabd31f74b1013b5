"""Persistent XLA compilation cache helper.

Compiles dominate wall time on repeat runs (minutes over a remote-TPU
tunnel); examples and benchmarks opt in with one call. The default path is
per-user to avoid permission collisions on shared machines; override with
MAGNETITE_JAX_CACHE.
"""

from __future__ import annotations

import getpass
import os
import tempfile


_SHARED = os.path.join(tempfile.gettempdir(), "magnetite_tpu_jax_cache")


def _default_path() -> str:
    # prefer the established shared dir when this user can write it (keeps
    # warm caches from tests/bench); otherwise a per-user dir avoids
    # permission collisions on shared machines
    if os.path.isdir(_SHARED) and os.access(_SHARED, os.W_OK):
        return _SHARED
    return f"{_SHARED}_{getpass.getuser()}"


def enable_persistent_cache(min_compile_secs: float = 1.0) -> str:
    import jax

    path = os.environ.get("MAGNETITE_JAX_CACHE", _default_path())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return path
