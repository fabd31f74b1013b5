"""Pallas TPU kernel for the DIA (diagonal-band) block SpMV.

The XLA roll formulation (fem/dia.dia_matvec) measures ~130 GB/s on v5e at
41 bands / 500k nodes: every `jnp.roll` materializes a shifted copy of the
[m, N] field, and the band planes arrive as 4D strided reads. This kernel
streams each band exactly once from a pre-tiled contiguous layout and keeps
the whole (zero-padded) u field resident in VMEM -- the same recipe that
took the structured stencil kernel to ~97% of HBM roofline
(pallas/stencil_kernel.py).

Flat-vector shifts on a 2D tile are the one new trick. u is reshaped to
[R, C] with C = 512 lanes; a flat offset `off` decomposes as
off = dr*C + dt with 0 <= dt < C, so

    u[n + off]  =  (lane < C - dt) ? rolled(u[r + dr]) : rolled(u[r + dr + 1])

-- one sublane-shifted row slice pair, one lane roll each, one select.
Row shifts are static slices of an 8-aligned extended load (Mosaic
requires dynamic sublane starts to be 8-aligned); dt == 0 offsets skip the
roll/select entirely. Bands are zero wherever a shifted index would fall
outside [0, N), exactly like the XLA path, so the zero row padding
reproduces dia_matvec's wrap-contributes-zero contract.

The block size m is generic: m=2 serves the node-DOF operator, m=3 the
coarse AMG levels (3 near-nullspace modes per aggregate). When the full
band set would not fit VMEM double-buffered, the offsets are split into
chunks and one pallas_call per chunk accumulates into the same output --
each band plane still streams from HBM exactly once; only the (small,
VMEM-resident) u field is re-read per chunk.

Reference parity note: this accelerates the same operator the reference
applies via CSR SpMV inside argmin CG (/root/reference/src/solver.rs:23-37);
band storage + shifted reads is the TPU-native equivalent of that hot loop.

Used for f32 DIA/hybrid operators (AMG level-0 smoothing, f32 CG, the
factored AMG transfer compositions) and the banded coarse AMG operators.
Guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024
_LANES = 512
# sanity cap on the sublane span of the extended load: a renumbered mesh's
# bandwidth is ~sqrt(N); beyond this the mesh ordering is band-hostile and
# the ELL path should have been chosen anyway
_MAX_ROW_SPAN = 256


def _plan(offsets: tuple[int, ...], cols: int):
    """Static (dr, dt) decomposition per band offset: off = dr*cols + dt,
    0 <= dt < cols."""
    plan = []
    for off in offsets:
        dr = off // cols
        dt = off - dr * cols
        plan.append((int(dr), int(dt)))
    return tuple(plan)


def _spans(plan) -> tuple[int, int]:
    """(top, dr_max): rows of zero padding needed above, and the largest
    row reach below (dt > 0 carries into row dr + 1)."""
    dr_min = min(dr for dr, _ in plan)
    dr_max = max(dr + (1 if dt > 0 else 0) for dr, dt in plan)
    return max(-dr_min, 0), max(dr_max, 0)


def _u_bytes(offsets: tuple[int, ...], n_nodes: int, m: int) -> int:
    plan = _plan(offsets, _LANES)
    top, dr_max = _spans(plan)
    rows_pad = -(-(-(-n_nodes // _LANES)) // 8) * 8
    return m * (top + rows_pad + dr_max + 8) * _LANES * 4


def dia_pallas_applicable(
    offsets: tuple[int, ...], n_nodes: int, dtype=jnp.float32, m: int = 2
) -> bool:
    """Kernel constraints: f32, bounded band reach, resident u plus at
    least one double-buffered single-band tile within the VMEM budget
    (larger band sets stream as chunks)."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if not offsets or n_nodes < 8 * _LANES:
        return False
    plan = _plan(offsets, _LANES)
    top, dr_max = _spans(plan)
    if top + dr_max > _MAX_ROW_SPAN:
        return False
    tr = 8
    band_bytes = m * m * tr * _LANES * 4 * 2  # one band, double-buffered
    out_bytes = m * tr * _LANES * 4 * 2
    return (
        _u_bytes(offsets, n_nodes, m) + band_bytes + out_bytes
        <= _VMEM_BUDGET
    )


def _chunk_layout(
    d: int, m: int, u_bytes: int
) -> tuple[int, int]:
    """(tile_rows, bands_per_chunk) fitting the VMEM budget.

    Prefers the largest row tile with all bands in one chunk; falls back
    to splitting the band set at tr=8."""
    for tr in (32, 16, 8):
        band_bytes = d * m * m * tr * _LANES * 4 * 2
        out_bytes = m * tr * _LANES * 4 * 2
        if u_bytes + band_bytes + out_bytes <= _VMEM_BUDGET:
            return tr, d
    tr = 8
    out_bytes = m * tr * _LANES * 4 * 2
    per_band = m * m * tr * _LANES * 4 * 2
    avail = _VMEM_BUDGET - u_bytes - out_bytes
    return tr, max(1, avail // per_band)


def pretile_dia_bands(
    bands: jax.Array, tile_rows: int, cols: int
) -> jax.Array:
    """[D, m, m, N] -> [G, D, m, m, tr, C] zero-padded; makes each grid
    step's band read one contiguous DMA (one transpose pass per solve,
    hoisted out of CG/smoother loops by jit)."""
    d, m = bands.shape[0], bands.shape[1]
    n = bands.shape[-1]
    rows = -(-n // cols)
    rows_pad = -(-rows // tile_rows) * tile_rows
    flat_pad = rows_pad * cols - n
    if flat_pad:
        bands = jnp.pad(
            bands, ((0, 0), (0, 0), (0, 0), (0, flat_pad))
        )
    g = rows_pad // tile_rows
    return bands.reshape(d, m, m, g, tile_rows, cols).transpose(
        3, 0, 1, 2, 4, 5
    )


def _kernel(
    bt_ref, u_ref, o_ref, *, m: int, tile_rows: int, cols: int, plan,
    top: int, ext_len: int,
):
    i = pl.program_id(0)
    dtype = o_ref.dtype
    accs = [jnp.zeros((tile_rows, cols), dtype=dtype) for _ in range(m)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, cols), 1)

    # one aligned extended load per component; every row shift becomes a
    # static in-register slice of it
    exts = [u_ref[c, pl.ds(i * tile_rows, ext_len), :] for c in range(m)]

    slices: dict[int, tuple] = {}

    def row_slice(dr: int):
        if dr not in slices:
            s = top + dr
            slices[dr] = tuple(
                jax.lax.slice_in_dim(e, s, s + tile_rows, axis=0)
                for e in exts
            )
        return slices[dr]

    for d_idx, (dr, dt) in enumerate(plan):
        a = row_slice(dr)
        if dt == 0:
            v = a
        else:
            b = row_slice(dr + 1)
            # bring flat element n+off into lane position: roll left by dt
            shift = jnp.int32((-dt) % cols)
            carry = lane >= cols - dt
            v = tuple(
                jnp.where(
                    carry, pltpu.roll(b[c], shift, axis=1),
                    pltpu.roll(a[c], shift, axis=1),
                )
                for c in range(m)
            )
        for ci in range(m):
            acc = accs[ci]
            for cj in range(m):
                acc = acc + bt_ref[0, d_idx, ci, cj] * v[cj]
            accs[ci] = acc
    for ci in range(m):
        o_ref[ci] = accs[ci]


@partial(
    jax.jit, static_argnames=("offsets", "n_nodes", "cols", "interpret")
)
def _dia_matvec_tiled(
    bands_tiled: jax.Array,
    u: jax.Array,
    offsets: tuple[int, ...],
    n_nodes: int,
    cols: int,
    interpret: bool = False,
) -> jax.Array:
    """y = K u from pre-tiled bands [G, D, m, m, tr, C]; u [m, N]."""
    g, d, m, _, tr, _ = bands_tiled.shape
    rows_pad = g * tr
    plan = _plan(offsets, cols)
    top, dr_max = _spans(plan)
    ext_len = tr + top + dr_max
    # round the extended load up to a sublane multiple; covered by bottom pad
    ext_len = -(-ext_len // 8) * 8
    bot = ext_len - tr  # >= top + dr_max

    u2 = jnp.pad(u, ((0, 0), (0, rows_pad * cols - n_nodes))).reshape(
        m, rows_pad, cols
    )
    u_pad = jnp.pad(u2, ((0, 0), (top, bot), (0, 0)))

    out = pl.pallas_call(
        partial(
            _kernel, m=m, tile_rows=tr, cols=cols, plan=plan, top=top,
            ext_len=ext_len,
        ),
        out_shape=jax.ShapeDtypeStruct((m, rows_pad, cols), u.dtype),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, d, m, m, tr, cols),
                # i*0 keeps indices i32-typed under jax_enable_x64
                lambda i: (i, i * 0, i * 0, i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, rows_pad + top + bot, cols),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, tr, cols), lambda i: (i * 0, i, i * 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(bands_tiled, u_pad)
    return out.reshape(m, rows_pad * cols)[:, :n_nodes]


def make_pallas_dia_operator(
    bands: jax.Array, offsets: tuple[int, ...], interpret: bool = False
):
    """Pre-tile once, return op(u [m, N]) -> [m, N] for hot loops.

    Callers must have checked `dia_pallas_applicable`. interpret=True
    emulates the kernel in pure JAX (CPU parity tests). Band sets too
    large for one VMEM-resident tile split into chunks: one pallas_call
    each, summed -- every band still streams exactly once."""
    d, m = int(bands.shape[0]), int(bands.shape[1])
    n = int(bands.shape[-1])
    cols = _LANES
    offsets = tuple(int(o) for o in offsets)
    tr, per_chunk = _chunk_layout(d, m, _u_bytes(offsets, n, m))
    chunks = []
    for s in range(0, d, per_chunk):
        sub = offsets[s : s + per_chunk]
        chunks.append((pretile_dia_bands(bands[s : s + per_chunk], tr, cols), sub))

    def op(u: jax.Array) -> jax.Array:
        y = _dia_matvec_tiled(
            chunks[0][0], u, chunks[0][1], n, cols, interpret=interpret
        )
        for bt, sub in chunks[1:]:
            y = y + _dia_matvec_tiled(
                bt, u, sub, n, cols, interpret=interpret
            )
        return y

    return op
