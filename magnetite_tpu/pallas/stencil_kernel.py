"""Pallas TPU kernel for the 9-point block-stencil SpMV.

The XLA stencil matvec (fem/stencil.py) materializes nine shifted copies of
u per application -- ~2x the ideal HBM traffic. This kernel streams the
stencil bands through VMEM once, keeps the whole (zero-row-padded) u field
resident in VMEM, and forms all nine shifted views in-register per row tile:

  traffic per matvec = 36*R*C*4 (bands) + 2*R*C*4 (u) + 2*R*C*4 (y)

i.e. the compulsory reads only. Column shifts are lane rolls
(pltpu.roll); row shifts are dynamic sublane slices into the padded u.

Used for the finest multigrid level / CG operator when shapes warrant it
(cols a multiple of 128, u small enough for VMEM); smaller or CPU cases fall
back to the XLA path. Guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fem.stencil import OFFSETS

_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_row_tile(rows: int, cols: int, dtype_bytes: int = 4) -> int:
    """Largest row tile whose double-buffered band stream + resident u fit."""
    u_bytes = 2 * (rows + 2) * cols * dtype_bytes
    for tr in (64, 32, 16, 8):
        band_bytes = 9 * 4 * tr * cols * dtype_bytes * 2  # double-buffered
        out_bytes = 2 * tr * cols * dtype_bytes * 2
        if u_bytes + band_bytes + out_bytes <= _VMEM_BUDGET:
            return tr
    return 8


def pallas_applicable(rows: int, cols: int, dtype=jnp.float32) -> bool:
    """Kernel constraints: lane-aligned cols, u resident in VMEM."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if cols % 128 != 0 or rows < 16:
        return False
    u_bytes = 2 * (rows + 2) * cols * 4
    return u_bytes <= _VMEM_BUDGET // 2


def _kernel(st_ref, u_ref, o_ref, *, tile_rows: int, cols: int, wrap: bool):
    i = pl.program_id(0)
    dtype = o_ref.dtype
    acc0 = jnp.zeros((tile_rows, cols), dtype=dtype)
    acc1 = jnp.zeros((tile_rows, cols), dtype=dtype)

    if not wrap:
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, cols), 1)
        first_col = lane == 0
        last_col = lane == cols - 1

    # One aligned extended load per component (Mosaic requires dynamic
    # sublane starts to be 8-aligned); the three row shifts become static
    # in-register slices of the extended block.
    ext0 = u_ref[0, pl.ds(i * tile_rows, tile_rows + 16), :]
    ext1 = u_ref[1, pl.ds(i * tile_rows, tile_rows + 16), :]
    for dr in (-1, 0, 1):
        # padded row index of global row (i*tile_rows + k + dr) is +8,
        # relative to the extended block start it is 8 + dr + k
        u0 = jax.lax.slice_in_dim(ext0, 8 + dr, 8 + dr + tile_rows, axis=0)
        u1 = jax.lax.slice_in_dim(ext1, 8 + dr, 8 + dr + tile_rows, axis=0)
        for dt in (-1, 0, 1):
            s = (dr + 1) * 3 + (dt + 1)
            if dt == 0:
                v0, v1 = u0, u1
            else:
                shift = (-dt) % cols  # pltpu.roll requires shift >= 0
                v0 = pltpu.roll(u0, shift, axis=1)
                v1 = pltpu.roll(u1, shift, axis=1)
                if not wrap:
                    edge = last_col if dt == 1 else first_col
                    v0 = jnp.where(edge, 0.0, v0)
                    v1 = jnp.where(edge, 0.0, v1)
            s00 = st_ref[s, 0, 0]
            s01 = st_ref[s, 0, 1]
            s10 = st_ref[s, 1, 0]
            s11 = st_ref[s, 1, 1]
            acc0 = acc0 + s00 * v0 + s01 * v1
            acc1 = acc1 + s10 * v0 + s11 * v1
    o_ref[0] = acc0
    o_ref[1] = acc1


@partial(jax.jit, static_argnames=("wrap", "interpret"))
def stencil_matvec_pallas(
    stencil: jax.Array, u: jax.Array, wrap: bool, interpret: bool = False
) -> jax.Array:
    """y = K u via the Pallas kernel. stencil [9,2,2,R,C], u [2,R,C]."""
    _, _, _, rows, cols = stencil.shape
    tr = _pick_row_tile(rows, cols)
    rows_pad = -(-rows // tr) * tr
    pad_r = rows_pad - rows

    # 8 zero rows above, 8+pad below: row shifts stay in-bounds AND the
    # kernel's extended loads start 8-aligned
    u_pad = jnp.pad(u, ((0, 0), (8, 8 + pad_r), (0, 0)))
    st_pad = (
        jnp.pad(stencil, ((0, 0), (0, 0), (0, 0), (0, pad_r), (0, 0)))
        if pad_r
        else stencil
    )

    grid = rows_pad // tr
    out = pl.pallas_call(
        partial(_kernel, tile_rows=tr, cols=cols, wrap=wrap),
        out_shape=jax.ShapeDtypeStruct((2, rows_pad, cols), u.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (9, 2, 2, tr, cols),
                lambda i: (0, 0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole padded u
        ],
        out_specs=pl.BlockSpec(
            (2, tr, cols), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(st_pad, u_pad)
    return out[:, :rows, :]
