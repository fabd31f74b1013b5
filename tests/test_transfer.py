"""Host->device transfer helpers (utils/transfer.py).

Runs on CPU: the scheduling (piece splits, group order, output order)
is identical across backends; only the tunnel's throughput pathology
that motivated it is TPU-specific.
"""

import numpy as np
import pytest

from magnetite_tpu.utils.transfer import (
    _CHUNK_BYTES,
    _ascending_parts,
    chunked_device_put,
    packed_device_put,
)


def test_ascending_parts_cover_exactly():
    arr = np.arange(90 * (1 << 20) // 8, dtype=np.float64)  # 90 MB
    parts = _ascending_parts(arr)
    assert len(parts) > 1
    np.testing.assert_array_equal(np.concatenate(parts), arr)
    # head pieces ascend, none above the chunk size
    sizes = [p.nbytes for p in parts]
    assert all(s <= _CHUNK_BYTES for s in sizes[:-1])
    assert sizes[:3] == sorted(sizes[:3])


def test_ascending_parts_2d_rows():
    arr = np.zeros((300_000, 48), dtype=np.float64)  # ~115 MB, wide rows
    parts = _ascending_parts(arr)
    assert sum(p.shape[0] for p in parts) == arr.shape[0]
    assert all(p.shape[1] == 48 for p in parts)


def test_chunked_device_put_small_roundtrip():
    arr = np.random.default_rng(0).random(1000)
    out = np.asarray(chunked_device_put(arr))
    np.testing.assert_array_equal(out, arr)


def test_chunked_device_put_large_roundtrip():
    arr = np.random.default_rng(1).random(10_000_000)  # 80 MB -> split
    out = np.asarray(chunked_device_put(arr))
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("seed,n_arrays", [(2, 5), (3, 30)])
def test_packed_device_put_preserves_order(seed, n_arrays):
    rng = np.random.default_rng(seed)
    arrays = [
        rng.random(int(rng.integers(10, 200_000))) for _ in range(n_arrays)
    ]
    # mix in a large one so both the grouped and sequential paths run
    arrays.insert(2, rng.random(9_000_000))  # 72 MB
    outs = packed_device_put(arrays)
    assert len(outs) == len(arrays)
    for a, d in zip(arrays, outs):
        np.testing.assert_array_equal(np.asarray(d), a)


def test_packed_device_put_mixed_dtypes_and_shapes():
    rng = np.random.default_rng(4)
    arrays = [
        rng.random((100, 3)).astype(np.float32),
        rng.integers(0, 100, size=(50,)).astype(np.int32),
        rng.random((7, 2, 3)),
        np.zeros((1,), dtype=np.float64),
    ]
    outs = packed_device_put(arrays)
    for a, d in zip(arrays, outs):
        out = np.asarray(d)
        assert out.dtype == a.dtype and out.shape == a.shape
        np.testing.assert_array_equal(out, a)
