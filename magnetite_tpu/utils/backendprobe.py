"""Killable-subprocess backend reachability probe.

The TPU on this host is reached through a network tunnel that is
occasionally down. JAX backend initialization has no timeout: the first
`jax.devices()` / `device_put` in a process then blocks forever, taking
the whole program (bench harness, driver compile check, CLI run) with it.
A hang cannot be recovered in-process -- backend init holds the runtime
lock -- so the only safe pattern is to probe from a subprocess that CAN
be killed, and fall back to the CPU backend when the accelerator is
unreachable.

The site environment sets JAX_PLATFORMS=axon globally and its plugin
re-overrides `jax_platforms` at interpreter startup, so a fallback must
(a) overwrite the env var for child processes and (b) re-apply
`jax.config.update("jax_platforms", ...)` after `import jax` in this
process (see `apply()`).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_PROBE_SRC = (
    "import jax\n"
    "x = jax.device_put(jax.numpy.ones(4))\n"
    "assert float(x.sum()) == 4.0\n"
    "print(jax.devices()[0].platform)\n"
)


def ensure_reachable_backend(probe_timeout: float = 180.0, probes: int = 2):
    """Return (platform, fallback_reason); forces CPU if the probe fails.

    fallback_reason is None when the default backend answered the probe.
    On failure, JAX_PLATFORMS=cpu is exported so both this process (via
    `apply()`) and every child process land on the CPU backend.
    A pre-set ``JAX_PLATFORMS=cpu`` needs no probe: cpu cannot hang.
    """
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return "cpu", None
    reason = "unknown"
    for i in range(probes):
        if i:
            time.sleep(30)  # ride out a momentary tunnel blip
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True,
                text=True,
                timeout=probe_timeout,
            )
        except subprocess.TimeoutExpired:
            reason = f"backend probe hung >{probe_timeout}s (tunnel down?)"
            continue
        if r.returncode == 0:
            return r.stdout.strip().splitlines()[-1], None
        reason = f"backend probe rc {r.returncode}: {r.stderr[-200:]}"
    os.environ["JAX_PLATFORMS"] = "cpu"
    return "cpu", reason


def apply() -> None:
    """Re-apply the JAX_PLATFORMS env var to the live jax config.

    Must run after `import jax` and before any backend touch; the site
    TPU plugin overwrites jax_platforms at interpreter startup, so the
    env var alone does not stick in an already-started process.
    """
    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and jax.config.jax_platforms != env_platforms:
        jax.config.update("jax_platforms", env_platforms)
