"""Backend-reachability probe: never hang a process on a down TPU tunnel.

The real probe spawns a subprocess that imports jax; these tests fake the
subprocess layer so they run fast and deterministically on any box.
"""

import subprocess

import pytest

from magnetite_tpu.utils import backendprobe


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)


def test_preset_cpu_skips_probe(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("probe subprocess should not run")

    monkeypatch.setattr(subprocess, "run", boom)
    assert backendprobe.ensure_reachable_backend() == ("cpu", None)


def test_probe_success_returns_platform(monkeypatch):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return subprocess.CompletedProcess(cmd, 0, stdout="axon\n", stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    platform, reason = backendprobe.ensure_reachable_backend()
    assert (platform, reason) == ("axon", None)
    assert len(calls) == 1
    import os

    assert os.environ.get("JAX_PLATFORMS") is None  # no fallback exported


def test_probe_hang_falls_back_to_cpu(monkeypatch):
    import os

    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # the site default
    sleeps = []
    monkeypatch.setattr(backendprobe.time, "sleep", sleeps.append)

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))

    monkeypatch.setattr(subprocess, "run", fake_run)
    platform, reason = backendprobe.ensure_reachable_backend(
        probe_timeout=1.0, probes=3
    )
    assert platform == "cpu"
    assert "hung" in reason
    assert os.environ["JAX_PLATFORMS"] == "cpu"  # exported for children
    assert len(sleeps) == 2  # blip ride-out between retries, not before 1st


def test_probe_error_falls_back_with_stderr(monkeypatch):
    import os

    def fake_run(cmd, **kw):
        return subprocess.CompletedProcess(
            cmd, 1, stdout="", stderr="RuntimeError: no devices"
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    platform, reason = backendprobe.ensure_reachable_backend(probes=1)
    assert platform == "cpu"
    assert "no devices" in reason
    assert os.environ["JAX_PLATFORMS"] == "cpu"


def test_apply_syncs_env_to_live_config(monkeypatch):
    """apply() copies the env var into jax.config (idempotent when equal).

    The suite runs on the CPU backend already, so exercise only the
    no-op direction -- flipping the live config to another platform
    mid-suite would poison every later test.
    """
    import jax

    monkeypatch.setenv("JAX_PLATFORMS", jax.config.jax_platforms or "cpu")
    before = jax.config.jax_platforms
    backendprobe.apply()
    assert jax.config.jax_platforms == (before or "cpu")
