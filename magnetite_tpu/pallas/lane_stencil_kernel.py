"""Pallas TPU kernel for the lane-batched stencil SpMV (design sweeps).

Sweep fields are [2, R, C, B] with the variant batch B as the minor (lane)
dimension (parallel/sweep.py). The XLA formulation reads nine shifted
windows of the padded field per matvec (~9x the compulsory traffic, HBM
has no cache to merge them); this kernel streams u once per neighbor tile
and forms every shifted view in-register:

  * rows: the grid walks row blocks; three overlapping BlockSpecs of the
    same array deliver (prev, cur, next) blocks, and the one-row halos are
    stitched in-register -- same trick as the blocked single-field kernel
    (pallas/stencil_kernel.py).
  * cols: sublane rolls (axis -2); the lane axis B is never shuffled.
  * stencil: [9,2,2,tr,C] per row block, broadcast over lanes.

u is read 3x and written once: ~4x less traffic than the XLA version's
materialized shifts. Guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def lane_kernel_applicable(rows: int, cols: int, lanes: int, dtype) -> bool:
    """f32, lane-aligned batch, a >=2-row tile's working set fits VMEM."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if lanes % 128 != 0 or rows < 4:
        return False
    return _pick_tile(cols, lanes) is not None


def _pick_tile(cols: int, lanes: int):
    for tr in (8, 4, 2):
        u_bytes = 3 * 2 * tr * cols * lanes * 4 * 2  # 3 specs, dbl-buffered
        out_bytes = 2 * tr * cols * lanes * 4 * 2
        band_bytes = 36 * tr * cols * 4 * 2
        if u_bytes + out_bytes + band_bytes <= _VMEM_BUDGET:
            return tr
    return None


def _kernel(st_ref, up_ref, uc_ref, un_ref, o_ref, *, tr: int, cols: int, wrap: bool):
    from ..fem.stencil import OFFSETS

    dtype = o_ref.dtype
    lanes = o_ref.shape[-1]
    acc0 = jnp.zeros((tr, cols, lanes), dtype=dtype)
    acc1 = jnp.zeros((tr, cols, lanes), dtype=dtype)

    if not wrap:
        sub = jax.lax.broadcasted_iota(jnp.int32, (tr, cols, lanes), 1)
        first_col = sub == 0
        last_col = sub == cols - 1

    ext0 = jnp.concatenate(
        [up_ref[0, -1:], uc_ref[0], un_ref[0, :1]], axis=0
    )  # [tr+2, C, B]
    ext1 = jnp.concatenate(
        [up_ref[1, -1:], uc_ref[1], un_ref[1, :1]], axis=0
    )
    for s, (dr, dt) in enumerate(OFFSETS):
        u0 = jax.lax.slice_in_dim(ext0, 1 + dr, 1 + dr + tr, axis=0)
        u1 = jax.lax.slice_in_dim(ext1, 1 + dr, 1 + dr + tr, axis=0)
        if dt == 0:
            v0, v1 = u0, u1
        else:
            shift = jnp.int32((-dt) % cols)
            v0 = pltpu.roll(u0, shift, axis=1)
            v1 = pltpu.roll(u1, shift, axis=1)
            if not wrap:
                edge = last_col if dt == 1 else first_col
                v0 = jnp.where(edge, 0.0, v0)
                v1 = jnp.where(edge, 0.0, v1)
        s00 = st_ref[0, s, 0, 0][:, :, None]  # [tr, C, 1] broadcast over B
        s01 = st_ref[0, s, 0, 1][:, :, None]
        s10 = st_ref[0, s, 1, 0][:, :, None]
        s11 = st_ref[0, s, 1, 1][:, :, None]
        acc0 = acc0 + s00 * v0 + s01 * v1
        acc1 = acc1 + s10 * v0 + s11 * v1
    o_ref[0] = acc0
    o_ref[1] = acc1


@partial(jax.jit, static_argnames=("rows", "wrap", "interpret"))
def lane_stencil_matvec_pallas(
    stencil: jax.Array,  # [9, 2, 2, R, C]
    u: jax.Array,  # [2, R, C, B]
    rows: int,
    wrap: bool,
    interpret: bool = False,
) -> jax.Array:
    cols = stencil.shape[-1]
    lanes = u.shape[-1]
    tr = _pick_tile(cols, lanes)
    rows_pad = -(-rows // tr) * tr
    g = rows_pad // tr

    # pre-tile bands per row block (loop-invariant under jit: hoisted)
    st = stencil
    if rows_pad != rows:
        st = jnp.pad(st, ((0, 0), (0, 0), (0, 0), (0, rows_pad - rows), (0, 0)))
    st_tiled = st.reshape(9, 2, 2, g, tr, cols).transpose(3, 0, 1, 2, 4, 5)

    # one zero row-tile above and below for the edge blocks' halo streams
    u_pad = jnp.pad(u, ((0, 0), (tr, tr + rows_pad - rows), (0, 0), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel, tr=tr, cols=cols, wrap=wrap),
        out_shape=jax.ShapeDtypeStruct((2, rows_pad, cols, lanes), u.dtype),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 9, 2, 2, tr, cols),
                lambda i: (i, i * 0, i * 0, i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, tr, cols, lanes),
                lambda i: (i * 0, i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, tr, cols, lanes),
                lambda i: (i * 0, i + 1, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, tr, cols, lanes),
                lambda i: (i * 0, i + 2, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, tr, cols, lanes),
            lambda i: (i * 0, i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(st_tiled, u_pad, u_pad, u_pad)
    return out[:, :rows]
