"""Host allocator tuning (utils/hostmem.py)."""

import ctypes
import sys

import pytest

from magnetite_tpu.utils.hostmem import tune_glibc_malloc


def _is_glibc() -> bool:
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL(None)
        libc.gnu_get_libc_version  # glibc-only symbol
        return True
    except (OSError, AttributeError):
        return False


def test_tune_glibc_malloc_applies():
    """On a glibc Linux host the tuning MUST take effect -- a silent
    False would regress the 21 s -> 6 s host-prep win (DESIGN.md §8)
    without any test noticing."""
    if not _is_glibc():
        pytest.skip("not a glibc host")
    assert tune_glibc_malloc() is True


def test_tune_is_idempotent_and_restorable():
    if not _is_glibc():
        pytest.skip("not a glibc host")
    assert tune_glibc_malloc(64 << 20) is True
    # restore the package default
    assert tune_glibc_malloc() is True


def test_non_linux_returns_false(monkeypatch):
    monkeypatch.setattr(sys, "platform", "darwin")
    assert tune_glibc_malloc() is False


def test_env_gate_disables_tuning(monkeypatch):
    """MAGNETITE_NO_MALLOC_TUNE=1 leaves the process allocator alone --
    the high-water-mark RSS trade is wrong for long-lived embedders."""
    monkeypatch.setenv("MAGNETITE_NO_MALLOC_TUNE", "1")
    assert tune_glibc_malloc() is False
