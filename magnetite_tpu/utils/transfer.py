"""Host->device transfer helpers for the tunneled TPU.

Two measured pathologies of the shared tunnel (656 MB f64 operand):

* ONE `device_put` of the whole array streams at ~43 MB/s.
* One pytree-batched put of uniform 64 MB pieces helps only when the
  link is already "warm": cold it still measures 36-160 MB/s, and any
  intervening compile/solve traffic re-cools it, so in a real pipeline
  every big upload is cold.
* Issuing the pieces as SEQUENTIAL `device_put` calls with an ascending
  size head (4, 8, 16, 32 MB, then 64 MB pieces), SYNCING each head
  piece, rides the link's per-completed-transfer ramp with payload
  bytes: interleaved A/B gives 2-9x over the batched uniform put in
  every round, and the synced head beats the unsynced ascending issue
  7x on a cold link (312 vs 45 MB/s; they tie warm). Warm ceiling
  measured ~2 GB/s, weather-dependent.

Small arrays are the opposite trade: per-call dispatch costs ~26 ms over
the tunnel, so a 22-array AMG hierarchy uploads ~4x faster as ONE
pytree-batched put. `packed_device_put` applies both rules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK_BYTES = 64 << 20
_RAMP_MB = (4, 8, 16, 32)
# above this, an array gets its own synced ascending-piece puts; below,
# it batches with the other smalls (grouped ascending when the total is
# large). Kept well under _CHUNK_BYTES so no single cold group put ever
# starts with a large un-ramped transfer.
_SEQUENTIAL_MIN_BYTES = 16 << 20


def _ascending_parts(
    arr: np.ndarray, tail_bytes: int = _CHUNK_BYTES
) -> list[np.ndarray]:
    """Split along axis 0 into ramp-head pieces then `tail_bytes` pieces."""
    row_bytes = max(arr.nbytes // max(arr.shape[0], 1), 1)
    parts = []
    off = 0
    for mb in _RAMP_MB:
        k = max((mb << 20) // row_bytes, 1)
        if (mb << 20) >= tail_bytes or off + k >= arr.shape[0]:
            break
        parts.append(arr[off : off + k])
        off += k
    k = max(tail_bytes // row_bytes, 1)
    while off < arr.shape[0]:
        parts.append(arr[off : off + k])
        off += k
    return parts


def _put_ascending(parts: list[np.ndarray]) -> list:
    """device_put pieces sequentially, SYNCING each ramp-head piece.

    The link ramps per COMPLETED transfer: without the syncs all pieces
    pipeline out while the link is still cold (interleaved A/B: 45 MB/s
    unsynced vs 312 MB/s with a synced head on the same cold link; warm
    they tie). The tail pieces stream unsynced at the ramped rate.
    """
    n_head = min(len(_RAMP_MB) + 1, len(parts) - 1)
    devs = []
    for p in parts[:n_head]:
        d = jax.device_put(p)
        jax.block_until_ready(d)
        devs.append(d)
    devs += [jax.device_put(p) for p in parts[n_head:]]
    return devs


def chunked_device_put(arr: np.ndarray, chunk_bytes: int = _CHUNK_BYTES):
    """device_put `arr` (sequential ascending pieces when large)."""
    arr = np.ascontiguousarray(arr)
    if arr.nbytes <= chunk_bytes or arr.shape[0] < 2:
        return jax.device_put(arr)
    return jnp.concatenate(
        _put_ascending(_ascending_parts(arr, chunk_bytes)), axis=0
    )


def packed_device_put(arrays):
    """Upload a sequence of host arrays, minimizing tunnel pathologies.

    Small arrays (each under the chunk size) batch into pytree puts —
    one call when the total is tiny (per-call ~26 ms dispatch dominates,
    e.g. a coarse-mesh AMG hierarchy), ascending-size GROUPS of calls
    when the total is large (a 153 MB hierarchy cold measured 210 MB/s
    as one call vs 4.8 GB/s grouped). Each large array follows as
    sequential ascending piece puts (module docstring). The small groups
    are issued first so they double as the start of the link ramp.
    Returns device arrays in input order.
    """
    arrs = [np.ascontiguousarray(a) for a in arrays]
    small_idx = [
        i
        for i, a in enumerate(arrs)
        if a.nbytes <= _SEQUENTIAL_MIN_BYTES or a.shape[0] < 2
    ]
    out: list = [None] * len(arrs)
    if small_idx:
        small_bytes = sum(arrs[i].nbytes for i in small_idx)
        if small_bytes <= 16 << 20:
            groups = [small_idx]
        else:
            # ascending cumulative-size groups: ~4 MB, ~12, ~36, 64-cap
            order = sorted(small_idx, key=lambda i: arrs[i].nbytes)
            groups, group, gbytes, cap = [], [], 0, 4 << 20
            for i in order:
                group.append(i)
                gbytes += arrs[i].nbytes
                if gbytes >= cap:
                    groups.append(group)
                    group, gbytes = [], 0
                    cap = min(cap * 3, _CHUNK_BYTES)
            if group:
                groups.append(group)
        for k, g in enumerate(groups):
            devs = jax.device_put([arrs[i] for i in g])
            if k + 1 < len(groups):
                # ramp groups must COMPLETE to warm the link (see
                # _put_ascending); the last group streams unsynced
                jax.block_until_ready(devs)
            for i, d in zip(g, devs):
                out[i] = d
    for i, a in enumerate(arrs):
        if out[i] is None:
            out[i] = jnp.concatenate(
                _put_ascending(_ascending_parts(a)), axis=0
            )
    return out
