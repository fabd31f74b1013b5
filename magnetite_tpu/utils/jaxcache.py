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


def _user_suffix() -> str:
    try:
        return getpass.getuser()
    except Exception:  # no passwd entry / USER env (container UIDs)
        return str(os.getuid()) if hasattr(os, "getuid") else "user"


def _default_path() -> str:
    # prefer the established shared dir only when THIS user owns it (a
    # merely-writable dir planted by another user could feed poisoned
    # compiled executables into the process); otherwise per-user
    try:
        owned = os.path.isdir(_SHARED) and os.stat(_SHARED).st_uid == os.getuid()
    except (OSError, AttributeError):
        owned = False
    if owned:
        return _SHARED
    return f"{_SHARED}_{_user_suffix()}"


def ensure_default_cache() -> None:
    """Engage the persistent compile cache unless the user configured one
    (or opted out with MAGNETITE_NO_JAX_CACHE=1).

    Called by the library's compile entry points (fem/solve.compile_problem,
    the parallel/sweep compilers): cold XLA compiles of the large sweep /
    refined-AMG graphs run minutes over a remote-TPU tunnel, and an
    opt-in-only cache meant every fresh process paid them again.

    Accelerator backends only: CPU compiles are local and fast, and XLA's
    CPU AOT cache loads log machine-feature-mismatch noise to stderr on
    every entry (its tuning flags masquerade as target features), which
    would dirty CLI output for every CPU user."""
    if os.environ.get("MAGNETITE_NO_JAX_CACHE", "") not in ("", "0"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:  # user already configured one
        return
    if jax.default_backend() == "cpu":
        return
    # cache config only -- no backendprobe here: a library compile call
    # must never flip the process's platform under the caller
    path = os.environ.get("MAGNETITE_JAX_CACHE") or _default_path()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def enable_persistent_cache(min_compile_secs: float = 1.0) -> str:
    import jax

    # Some hosts install a sitecustomize that force-registers an
    # accelerator plugin and OVERRIDES jax_platforms at interpreter
    # startup, which makes `JAX_PLATFORMS=cpu python example.py`
    # silently ignore the request (and hang when the accelerator is
    # unreachable). Restore the env var's intent here: every example and
    # benchmark funnels through this helper before touching jax.
    from . import backendprobe

    backendprobe.apply()

    path = os.environ.get("MAGNETITE_JAX_CACHE")
    if path is None:
        path = _default_path()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return path
