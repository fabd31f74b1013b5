"""Host->device transfer helpers for the tunneled TPU.

Measured on the axon tunnel (656 MB f64): ONE device_put streams at
~43 MB/s, but splitting the same array into >=4 pieces and uploading them
back-to-back pipelines at 1.5-2.4 GB/s -- a ~25x difference. Large
compile-time operands (assembled operator bands, AMG hierarchies) go
through `chunked_device_put`, which uploads ~64 MB slices and
concatenates on device (one HBM pass, microseconds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK_BYTES = 64 << 20


def chunked_device_put(arr: np.ndarray, chunk_bytes: int = _CHUNK_BYTES):
    """device_put `arr` (split along axis 0 when large), returns jax array."""
    arr = np.ascontiguousarray(arr)
    if arr.nbytes <= chunk_bytes or arr.shape[0] < 2:
        return jax.device_put(arr)
    n_chunks = min(-(-arr.nbytes // chunk_bytes), arr.shape[0])
    parts = [jax.device_put(p) for p in np.array_split(arr, n_chunks)]
    return jnp.concatenate(parts, axis=0)
