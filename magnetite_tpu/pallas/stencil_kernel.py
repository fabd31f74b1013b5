"""Pallas TPU kernel for the 9-point block-stencil SpMV.

The XLA stencil matvec (fem/stencil.py) materializes nine shifted copies of
u per application -- ~2x the ideal HBM traffic. This kernel reads every band
exactly once and keeps the whole (zero-row-padded) u field resident in VMEM.

Band layout is the whole trick. The assembled stencil [9, 2, 2, R, C] would
make each grid step fetch 36 separate strided row-tile planes -- measured
~360 GB/s on v5e, descriptor-overhead-bound. Pre-tiling the bands to
[G, 9, 2, 2, tr, C] (G = R/tr row tiles) turns each grid step's band read
into ONE contiguous 36*tr*C*4-byte DMA: measured ~735 GB/s (~90% of the
v5e's 819 GB/s HBM roofline). The pre-tile transpose costs one pass over the
bands and is done once per assembly (`pretile_stencil`), amortized over all
CG/multigrid applications via `make_pallas_stencil_operator`.

Inside the kernel, column shifts are lane rolls (pltpu.roll, cheap) and row
shifts are static sublane slices of an 8-aligned extended load.

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

_VMEM_BUDGET = 12 * 1024 * 1024


def pick_row_tile(rows: int, cols: int, dtype_bytes: int = 4) -> int:
    """Largest row tile whose double-buffered band DMA + resident u fit."""
    rows_pad16 = -(-rows // 16) * 16
    u_bytes = 2 * (rows_pad16 + 16) * cols * dtype_bytes
    for tr in (64, 32, 16, 8):
        band_bytes = 36 * tr * cols * dtype_bytes * 2  # double-buffered
        out_bytes = 2 * tr * cols * dtype_bytes * 2
        if u_bytes + band_bytes + out_bytes <= _VMEM_BUDGET:
            return tr
    return 8


def _resident_applicable(rows: int, cols: int) -> bool:
    """Whole-u-in-VMEM variant: fastest (u read once per matvec)."""
    u_bytes = 2 * (rows + 32) * cols * 4
    return u_bytes <= _VMEM_BUDGET // 2


def pallas_applicable(rows: int, cols: int, dtype=jnp.float32) -> bool:
    """Kernel constraints: f32, lane-aligned cols, enough rows to tile.

    Grids whose u field fits half the VMEM budget use the resident-u
    kernel; larger grids use the row-blocked variant (u streamed in row
    tiles with one halo row of overlap), so there is no upper size limit.
    """
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if cols % 128 != 0 or rows < 16:
        return False
    # blocked variant needs the per-step working set to fit
    tr = 8
    band_bytes = 36 * tr * cols * 4 * 2
    u_bytes = 3 * 2 * tr * cols * 4 * 2
    out_bytes = 2 * tr * cols * 4 * 2
    return band_bytes + u_bytes + out_bytes <= _VMEM_BUDGET


def pretile_stencil(stencil: jax.Array, tile_rows: int) -> jax.Array:
    """[9, 2, 2, R, C] -> [G, 9, 2, 2, tr, C] with zero row padding.

    One device transpose per assembly; makes each kernel grid step's band
    read a single contiguous DMA.
    """
    _, _, _, rows, cols = stencil.shape
    rows_pad = -(-rows // tile_rows) * tile_rows
    if rows_pad != rows:
        stencil = jnp.pad(
            stencil, ((0, 0), (0, 0), (0, 0), (0, rows_pad - rows), (0, 0))
        )
    g = rows_pad // tile_rows
    return stencil.reshape(9, 2, 2, g, tile_rows, cols).transpose(
        3, 0, 1, 2, 4, 5
    )


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
                # pltpu.roll wants shift >= 0 and an i32 operand (a bare
                # Python int lowers to i64 under jax_enable_x64)
                shift = jnp.int32((-dt) % cols)
                v0 = pltpu.roll(u0, shift, axis=1)
                v1 = pltpu.roll(u1, shift, axis=1)
                if not wrap:
                    edge = last_col if dt == 1 else first_col
                    v0 = jnp.where(edge, 0.0, v0)
                    v1 = jnp.where(edge, 0.0, v1)
            s00 = st_ref[0, s, 0, 0]
            s01 = st_ref[0, s, 0, 1]
            s10 = st_ref[0, s, 1, 0]
            s11 = st_ref[0, s, 1, 1]
            acc0 = acc0 + s00 * v0 + s01 * v1
            acc1 = acc1 + s10 * v0 + s11 * v1
    o_ref[0] = acc0
    o_ref[1] = acc1


@partial(jax.jit, static_argnames=("rows", "wrap", "interpret"))
def _matvec_tiled(
    stencil_tiled: jax.Array,
    u: jax.Array,
    rows: int,
    wrap: bool,
    interpret: bool = False,
) -> jax.Array:
    """y = K u from pre-tiled bands [G, 9, 2, 2, tr, C]; u [2, R, C]."""
    g, _, _, _, tr, cols = stencil_tiled.shape
    rows_pad = g * tr

    # 8 zero rows above, below enough that the last tile's extended load
    # (tr + 16 rows from an 8-aligned start) stays in bounds
    u_pad = jnp.pad(u, ((0, 0), (8, 8 + rows_pad - rows), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel, tile_rows=tr, cols=cols, wrap=wrap),
        out_shape=jax.ShapeDtypeStruct((2, rows_pad, cols), u.dtype),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 9, 2, 2, tr, cols),
                # i*0 keeps every index i32-typed: literal 0s lower to i64
                # under jax_enable_x64, which Mosaic rejects
                lambda i: (i, i * 0, i * 0, i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            # whole padded u, resident across grid steps; the explicit
            # index map keeps its block indices i32 under x64 too
            pl.BlockSpec(
                (2, rows_pad + 16, cols),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, tr, cols), lambda i: (i * 0, i, i * 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(stencil_tiled, u_pad)
    return out[:, :rows, :]


def _pick_row_tile_blocked(cols: int) -> int:
    """Row tile for the blocked variant (per-step working set only)."""
    for tr in (32, 16, 8):
        band_bytes = 36 * tr * cols * 4 * 2
        u_bytes = 3 * 2 * tr * cols * 4 * 2
        out_bytes = 2 * tr * cols * 4 * 2
        if band_bytes + u_bytes + out_bytes <= _VMEM_BUDGET:
            return tr
    return 8


def _kernel_blocked(
    st_ref, up_ref, uc_ref, un_ref, o_ref, *, tile_rows: int, cols: int, wrap: bool
):
    """Row-blocked variant: u streamed as (prev, cur, next) row tiles.

    The extended field for output rows [i*tr, (i+1)*tr) is the current tile
    plus one halo row from each neighbor tile -- built in-register from the
    three streamed blocks, so u of ANY size works (3x u reads vs the
    resident kernel's 1x; bands dominate traffic either way).
    """
    dtype = o_ref.dtype
    acc0 = jnp.zeros((tile_rows, cols), dtype=dtype)
    acc1 = jnp.zeros((tile_rows, cols), dtype=dtype)

    if not wrap:
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, cols), 1)
        first_col = lane == 0
        last_col = lane == cols - 1

    ext0 = jnp.concatenate(
        [up_ref[0, -1:, :], uc_ref[0], un_ref[0, :1, :]], axis=0
    )  # [tr+2, C]
    ext1 = jnp.concatenate(
        [up_ref[1, -1:, :], uc_ref[1], un_ref[1, :1, :]], axis=0
    )
    for dr in (-1, 0, 1):
        u0 = jax.lax.slice_in_dim(ext0, 1 + dr, 1 + dr + tile_rows, axis=0)
        u1 = jax.lax.slice_in_dim(ext1, 1 + dr, 1 + dr + tile_rows, axis=0)
        for dt in (-1, 0, 1):
            s = (dr + 1) * 3 + (dt + 1)
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
            acc0 = acc0 + st_ref[0, s, 0, 0] * v0 + st_ref[0, s, 0, 1] * v1
            acc1 = acc1 + st_ref[0, s, 1, 0] * v0 + st_ref[0, s, 1, 1] * v1
    o_ref[0] = acc0
    o_ref[1] = acc1


@partial(jax.jit, static_argnames=("rows", "wrap", "interpret"))
def _matvec_blocked(
    stencil_tiled: jax.Array,
    u: jax.Array,
    rows: int,
    wrap: bool,
    interpret: bool = False,
) -> jax.Array:
    """Blocked y = K u: bands [G,9,2,2,tr,C], u [2,R,C] of any size."""
    g, _, _, _, tr, cols = stencil_tiled.shape
    rows_pad = g * tr

    # one zero tile above and below: the (prev, next) streams of the edge
    # tiles land in zeros, reproducing the operator's zero row padding
    u_pad = jnp.pad(u, ((0, 0), (tr, tr + rows_pad - rows), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel_blocked, tile_rows=tr, cols=cols, wrap=wrap),
        out_shape=jax.ShapeDtypeStruct((2, rows_pad, cols), u.dtype),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 9, 2, 2, tr, cols),
                lambda i: (i, i * 0, i * 0, i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            # (prev, cur, next) row tiles of the padded u; +1 block offset
            # accounts for the zero tile prepended above
            pl.BlockSpec(
                (2, tr, cols), lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, tr, cols), lambda i: (i * 0, i + 1, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, tr, cols), lambda i: (i * 0, i + 2, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, tr, cols), lambda i: (i * 0, i, i * 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(stencil_tiled, u_pad, u_pad, u_pad)
    return out[:, :rows, :]


def make_pallas_stencil_operator(
    stencil: jax.Array, wrap: bool, interpret: bool = False
):
    """Pre-tile once, return op(u) for hot loops (CG / multigrid smoothing).

    Call under jit with a loop-invariant stencil: XLA hoists the pre-tile
    transpose out of the solver loop, so it costs one band pass per solve.
    Grids whose u fits VMEM get the resident-u kernel; larger grids the
    row-blocked one. interpret=True emulates the kernel in pure JAX (CPU
    parity tests, incl. inside shard_map).
    """
    rows, cols = stencil.shape[-2], stencil.shape[-1]
    if _resident_applicable(rows, cols):
        tr = pick_row_tile(rows, cols)
        stencil_tiled = pretile_stencil(stencil, tr)

        def op(u: jax.Array) -> jax.Array:
            return _matvec_tiled(stencil_tiled, u, rows, wrap, interpret=interpret)

        return op

    tr = _pick_row_tile_blocked(cols)
    stencil_tiled = pretile_stencil(stencil, tr)

    def op(u: jax.Array) -> jax.Array:
        return _matvec_blocked(stencil_tiled, u, rows, wrap, interpret=interpret)

    return op


def stencil_matvec_pallas(
    stencil: jax.Array, u: jax.Array, wrap: bool, interpret: bool = False
) -> jax.Array:
    """One-shot y = K u (pretiles per call -- use the operator factory for
    loops). stencil [9,2,2,R,C], u [2,R,C]."""
    rows, cols = stencil.shape[-2], stencil.shape[-1]
    if _resident_applicable(rows, cols):
        tr = pick_row_tile(rows, cols)
        return _matvec_tiled(
            pretile_stencil(stencil, tr), u, rows, wrap, interpret=interpret
        )
    tr = _pick_row_tile_blocked(cols)
    return _matvec_blocked(
        pretile_stencil(stencil, tr), u, rows, wrap, interpret=interpret
    )
