"""Host allocator tuning (utils/hostmem.py)."""

import sys

from magnetite_tpu.utils.hostmem import tune_glibc_malloc


def test_tune_glibc_malloc_applies_on_linux():
    applied = tune_glibc_malloc()
    if sys.platform.startswith("linux"):
        # glibc returns 1 for both mallopt calls on any mainstream distro;
        # a musl/odd-libc host may legitimately return False
        assert applied in (True, False)
    else:
        assert applied is False


def test_threshold_fits_c_int():
    # mallopt takes a C int; the default must not overflow it
    assert (1 << 30) < 2**31


def test_import_side_effect_is_idempotent():
    # calling again (package import already did once) must not fail
    assert tune_glibc_malloc() in (True, False)
    assert tune_glibc_malloc(64 << 20) in (True, False)
    # restore the package default
    tune_glibc_malloc()
