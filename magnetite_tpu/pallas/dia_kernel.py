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


# ====================== double-float (f64-grade) SpMV =======================
#
# TPUs have no hardware f64; XLA's emulated f64 band matvec runs ~78 GB/s
# (8.4 ms at 41 bands / 500k nodes) and is the refined AMG solve's
# per-iteration tax (fem/solve._run_linear_solve runs ONE f64 CG whose
# preconditioner is the f32 V-cycle). This kernel computes y = K u to
# ~2^-46 relative-to-term-magnitude accuracy from f32 pieces:
#
#   K = Kh + Kl, u = uh + ul        (f32 hi/lo pairs, 48-bit significands)
#   Kh, uh Veltkamp-split into exact 12-bit halves (b1+b2, u1+u2), so the
#   three significant partial products b1*u1, b1*u2, b2*u1 are EXACT in
#   f32 and accumulate through branch-free two-sum compensation (S, C);
#   the 2^-24-scale terms b2*u2, Kh*ul, Kl*uh add plainly into C; Kl*ul
#   (2^-48) is dropped. y = f64(S) + f64(C).
#
# Measured accuracy (numpy prototype on a real assembled operator):
# err <= 1.3e-14 * sum_d |K_d||u_d| -- vs 5.6e-8 for plain f32. Through
# the stiffness matvec's cancellation (|Ku| ~ h^2 * sum|K||u| for smooth
# u) that is ~2e-9 attainable relative residual at 1M elements, enough
# for the reference's 1e-8 target, at f32-pair streaming speed instead of
# emulated-f64 speed. Veltkamp/two-sum require round-to-nearest f32 and
# no FP reassociation -- both hold for XLA/Mosaic defaults.


def df_split(u64: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f64 -> (hi, lo) f32 pair with hi + lo == u to ~2^-48 relative."""
    hi = u64.astype(jnp.float32)
    lo = (u64 - hi.astype(u64.dtype)).astype(jnp.float32)
    return hi, lo


_VELTKAMP = 4097.0  # 2^(24 - 24//2) + 1: split f32 into exact 12-bit halves


def _veltkamp(x):
    t = jnp.float32(_VELTKAMP) * x
    x1 = t - (t - x)
    return x1, x - x1


def _two_sum_acc(s, c, p):
    """(s', c + rounding error of s + p). Branch-free Knuth two-sum."""
    s2 = s + p
    z = s2 - s
    e = (s - (s2 - z)) + (p - z)
    return s2, c + e


def df_dia_pallas_applicable(
    offsets: tuple[int, ...], n_nodes: int, m: int = 2
) -> bool:
    """Same constraints as the f32 kernel, with the hi/lo-doubled u field
    resident and at least one double-buffered hi/lo band tile."""
    if not offsets or n_nodes < 8 * _LANES:
        return False
    plan = _plan(offsets, _LANES)
    top, dr_max = _spans(plan)
    if top + dr_max > _MAX_ROW_SPAN:
        return False
    tr = 8
    u_bytes = 2 * _u_bytes(offsets, n_nodes, m)
    band_bytes = 2 * m * m * tr * _LANES * 4 * 2
    out_bytes = 2 * m * tr * _LANES * 4 * 2
    return u_bytes + band_bytes + out_bytes <= _VMEM_BUDGET


def _df_chunk_layout(d: int, m: int, u_bytes: int) -> tuple[int, int]:
    for tr in (32, 16, 8):
        band_bytes = d * 2 * m * m * tr * _LANES * 4 * 2
        out_bytes = 2 * m * tr * _LANES * 4 * 2
        if u_bytes + band_bytes + out_bytes <= _VMEM_BUDGET:
            return tr, d
    tr = 8
    out_bytes = 2 * m * tr * _LANES * 4 * 2
    per_band = 2 * m * m * tr * _LANES * 4 * 2
    avail = _VMEM_BUDGET - u_bytes - out_bytes
    return tr, max(1, avail // per_band)


def _df_kernel(
    bt_ref, u_ref, s_ref, c_ref, *, m: int, tile_rows: int, cols: int,
    plan, top: int, ext_len: int,
):
    i = pl.program_id(0)
    f32 = jnp.float32
    accs = [jnp.zeros((tile_rows, cols), dtype=f32) for _ in range(m)]
    comps = [jnp.zeros((tile_rows, cols), dtype=f32) for _ in range(m)]

    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, cols), 1)

    # extended loads + one Veltkamp split per component, shared by every
    # row shift below
    exts = []
    for comp in range(m):
        uh = u_ref[0, comp, pl.ds(i * tile_rows, ext_len), :]
        ul = u_ref[1, comp, pl.ds(i * tile_rows, ext_len), :]
        u1, u2 = _veltkamp(uh)
        exts.append((u1, u2, uh, ul))

    slices: dict[int, tuple] = {}

    def row_slice(dr: int):
        if dr not in slices:
            s = top + dr
            slices[dr] = tuple(
                tuple(
                    jax.lax.slice_in_dim(a, s, s + tile_rows, axis=0)
                    for a in exts[comp]
                )
                for comp in range(m)
            )
        return slices[dr]

    for d_idx, (dr, dt) in enumerate(plan):
        a = row_slice(dr)
        if dt == 0:
            v = a
        else:
            b = row_slice(dr + 1)
            shift = jnp.int32((-dt) % cols)
            carry = lane >= cols - dt
            v = tuple(
                tuple(
                    jnp.where(
                        carry, pltpu.roll(b[comp][k], shift, axis=1),
                        pltpu.roll(a[comp][k], shift, axis=1),
                    )
                    for k in range(4)
                )
                for comp in range(m)
            )
        for ci in range(m):
            s_acc, c_acc = accs[ci], comps[ci]
            for cj in range(m):
                u1, u2, uh, ul = v[cj]
                bh = bt_ref[0, d_idx, 0, ci, cj]
                bl = bt_ref[0, d_idx, 1, ci, cj]
                b1, b2 = _veltkamp(bh)
                s_acc, c_acc = _two_sum_acc(s_acc, c_acc, b1 * u1)
                s_acc, c_acc = _two_sum_acc(s_acc, c_acc, b1 * u2)
                s_acc, c_acc = _two_sum_acc(s_acc, c_acc, b2 * u1)
                c_acc = c_acc + b2 * u2 + bh * ul + bl * uh
            accs[ci], comps[ci] = s_acc, c_acc
    for ci in range(m):
        s_ref[ci] = accs[ci]
        c_ref[ci] = comps[ci]


@partial(
    jax.jit, static_argnames=("offsets", "n_nodes", "cols", "interpret")
)
def _df_dia_matvec_tiled(
    bands_tiled: jax.Array,
    uh: jax.Array,
    ul: jax.Array,
    offsets: tuple[int, ...],
    n_nodes: int,
    cols: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(S, C) f32 partial pair from pre-tiled hi/lo bands
    [G, D, 2, m, m, tr, C]; uh/ul [m, N] f32. y = f64(S) + f64(C)."""
    g, d, _, m, _, tr, _ = bands_tiled.shape
    rows_pad = g * tr
    plan = _plan(offsets, cols)
    top, dr_max = _spans(plan)
    ext_len = tr + top + dr_max
    ext_len = -(-ext_len // 8) * 8
    bot = ext_len - tr

    u = jnp.stack([uh, ul])  # [2, m, N]
    u2 = jnp.pad(u, ((0, 0), (0, 0), (0, rows_pad * cols - n_nodes)))
    u2 = u2.reshape(2, m, rows_pad, cols)
    u_pad = jnp.pad(u2, ((0, 0), (0, 0), (top, bot), (0, 0)))

    out_shape = jax.ShapeDtypeStruct((m, rows_pad, cols), jnp.float32)
    s, c = pl.pallas_call(
        partial(
            _df_kernel, m=m, tile_rows=tr, cols=cols, plan=plan, top=top,
            ext_len=ext_len,
        ),
        out_shape=(out_shape, out_shape),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, d, 2, m, m, tr, cols),
                lambda i: (i, i * 0, i * 0, i * 0, i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, m, rows_pad + top + bot, cols),
                lambda i: (i * 0, i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (m, tr, cols), lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, tr, cols), lambda i: (i * 0, i, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(bands_tiled, u_pad)
    s = s.reshape(m, rows_pad * cols)[:, :n_nodes]
    c = c.reshape(m, rows_pad * cols)[:, :n_nodes]
    return s, c


def make_df_dia_operator(
    bands64: jax.Array, offsets: tuple[int, ...], interpret: bool = False
):
    """op(u [m, N] f64) -> K u to ~2^-46 term-relative accuracy, with all
    streaming in f32 pairs. `bands64` are the f64 bands; the hi/lo split
    and pre-tiling trace once per solve (outside the CG loop).

    Callers must have checked `df_dia_pallas_applicable`."""
    d, m = int(bands64.shape[0]), int(bands64.shape[1])
    n = int(bands64.shape[-1])
    cols = _LANES
    offsets = tuple(int(o) for o in offsets)
    tr, per_chunk = _df_chunk_layout(d, m, 2 * _u_bytes(offsets, n, m))
    bh, bl = df_split(bands64)
    bhl = jnp.stack([bh, bl], axis=1)  # [D, 2, m, m, N]
    chunks = []
    for s in range(0, d, per_chunk):
        sub = offsets[s : s + per_chunk]
        part = bhl[s : s + per_chunk].reshape(-1, m, m, n)
        tiled = pretile_dia_bands(part, tr, cols)
        g = tiled.shape[0]
        tiled = tiled.reshape(g, len(sub), 2, m, m, tr, cols)
        chunks.append((tiled, sub))

    def op(u64: jax.Array) -> jax.Array:
        uh, ul = df_split(u64)
        y = jnp.zeros_like(u64)
        for bt, sub in chunks:
            s, c = _df_dia_matvec_tiled(
                bt, uh, ul, sub, n, cols, interpret=interpret
            )
            y = y + s.astype(u64.dtype) + c.astype(u64.dtype)
        return y

    return op


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
