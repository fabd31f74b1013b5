"""Pallas TPU kernel for the LANE-BATCHED DIA block SpMV.

Design sweeps lay 4096 variants out as TPU lanes ([2, N, B] fields,
parallel/sweep.py) and precondition every lane with one shared AMG
V-cycle. The V-cycle's level-0 smoothing and the CG operator are band
matvecs on those lane fields; the XLA roll formulation measures
**4.7 GB/s** on v5e at 35 bands / 3.8k nodes / 4096 lanes (53 ms per
matvec, scripts/profile_sweep_parts.py): every `jnp.roll` materializes a
shifted [2, N, B] copy (~124 MB) and the band planes broadcast as strided
4D reads. At ~5 matvecs per PCG iteration that roll tax IS the sweep's
runtime (~280 ms/iteration measured, everything else <3 ms).

This kernel streams the lane field once. The node axis rides the
SUBLANES, lanes stay minormost, and every band offset becomes a static
sublane slice of a two-block extended window:

    out rows [i*tn, (i+1)*tn)  read  u rows [i*tn - top, (i+1)*tn + bot)

so passing blocks i and i+1 of a top-padded field (the transfer kernel's
two-operand window trick, pallas/transfer_kernel.py) covers every offset
with top + bot <= tn. Band values vary along nodes: the host pre-tiles
them to [G, tn, D*m*m] (node rows on sublanes, band planes on lanes), and
each (d, ci, cj) coefficient is a [tn, 1] slice lane-broadcast against
the shifted [tn, tl] tile -- pure VPU FMAs, no relayouts, no gathers.

Per (node, lane) grid step the kernel moves 2 u blocks + 1 band block and
writes 1 out block: ~2x the roofline-minimal traffic (each u block is
read as both `i` and `i+1`), VPU-bound at D*m*m FMAs per element.
Measured v5e at 35 bands / 3.8k nodes / 4096 lanes: 53 ms (roll) ->
~1 ms; the material variant accumulates the three basis band sets into
six accumulators and combines them with the per-lane (wa, wb, wc)
weights once per tile, exactly like the roll path's six-accumulator
formulation.

Out-of-range band entries are zero by the DIA assembly contract
(fem/dia.assemble_dia), matching the roll path's wrap-contributes-zero
semantics; the padded u rows are zero as well.

Reference parity note: the lanes accelerate the same reduced operator the
reference applies once per CG iteration via CSR SpMV
(/root/reference/src/solver.rs:23-37) -- here applied to 4096 design
variants at once. Guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024
_LANE_TILES = (512, 256, 128)
_NODE_TILES = (256, 512)


class LanePlan(NamedTuple):
    """Static geometry for the lane DIA kernel (compile-time only)."""

    tn: int  # node rows per block (sublanes)
    tl: int  # lane tile
    top: int  # zero rows prepended (= max(-min(offset), 0))
    g: int  # node blocks covering N
    d4: int  # D * m * m, padded to a lane multiple
    nbases: int


def lane_dia_plan(
    offsets: tuple[int, ...],
    n_nodes: int,
    n_lanes: int,
    dtype=jnp.float32,
    m: int = 2,
    nbases: int = 1,
) -> Optional[LanePlan]:
    """Geometry if the kernel applies, else None (callers keep the roll
    path: f64 bands, tiny lane counts, or band reach beyond the window)."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return None
    if not offsets or n_lanes < _LANE_TILES[-1]:
        return None
    if all(n_lanes % t for t in _LANE_TILES):
        return None
    top = max(-min(offsets), 0)
    bot = max(max(offsets), 0)
    # each basis band set pre-tiles separately: d4 is the PER-BASIS lane
    # width, the VMEM budget charges all nbases blocks
    d4p = -(-(len(offsets) * m * m) // 128) * 128
    for tn in _NODE_TILES:
        if top + bot > tn:
            continue
        g = -(-n_nodes // tn)
        for tile_l in _LANE_TILES:
            if n_lanes % tile_l:
                continue
            # double-buffered operand/out blocks plus the kernel's live
            # scratch: the concatenated window, nbases*m accumulators,
            # and a shifted-slice temporary per component (Mosaic's
            # scoped-vmem stack charges these against a 16 MB limit)
            blocks = nbases * tn * d4p + 3 * m * tn * tile_l
            scratch = (2 * m + nbases * m + m) * tn * tile_l
            if 4 * (2 * blocks + scratch) <= _VMEM_BUDGET:
                return LanePlan(tn, tile_l, top, g, d4p, nbases)
    return None


def pretile_lane_bands(bands: jax.Array, plan: LanePlan) -> jax.Array:
    """[D, m, m, N] -> [G, tn, d4] with node rows on sublanes and the
    (d, ci, cj) planes on lanes; zero-padded past N and past D*m*m.

    Runs inside the caller's jit: a ~2 MB transpose per solve, CSEd
    across the CG op / smoothing op / a_op closures that share bands."""
    d, m = bands.shape[0], bands.shape[1]
    n = bands.shape[-1]
    flat = bands.reshape(d * m * m, n).T  # [N, D*m*m]
    flat = jnp.pad(
        flat,
        ((0, plan.g * plan.tn - n), (0, plan.d4 - d * m * m)),
    )
    return flat.reshape(plan.g, plan.tn, plan.d4)


def _pad_lane_field(u: jax.Array, plan: LanePlan, n_nodes: int) -> jax.Array:
    """[m, N, B] -> [m, (G+1)*tn, B]: logical row n at padded row n + top,
    zeros elsewhere (block i+1 stays in range for the last node block)."""
    rows = (plan.g + 1) * plan.tn
    return jnp.pad(
        u, ((0, 0), (plan.top, rows - plan.top - n_nodes), (0, 0))
    )


def _kernel(
    bt_ref, ua_ref, ub_ref, o_ref, *, offsets, top: int, tn: int, m: int
):
    exts = [
        jnp.concatenate([ua_ref[c], ub_ref[c]], axis=0) for c in range(m)
    ]
    tl = o_ref.shape[-1]
    accs = [
        jnp.zeros((tn, tl), dtype=o_ref.dtype) for _ in range(m)
    ]
    for d_idx, off in enumerate(offsets):
        s = top + off
        vs = [
            jax.lax.slice_in_dim(exts[c], s, s + tn, axis=0)
            for c in range(m)
        ]
        for ci in range(m):
            acc = accs[ci]
            for cj in range(m):
                k = (d_idx * m + ci) * m + cj
                acc = acc + bt_ref[0, :, k : k + 1] * vs[cj]
            accs[ci] = acc
    for ci in range(m):
        o_ref[ci] = accs[ci]


def _kernel3(
    bta_ref, btb_ref, btc_ref, wa_ref, wb_ref, wc_ref, ua_ref, ub_ref,
    o_ref, *, offsets, top: int, tn: int, m: int,
):
    """Material variant: the per-lane combined coefficient
    wa*Ka + wb*Kb + wc*Kc is formed on the fly per (d, ci, cj) -- a
    [tn, 1] x [1, tl] broadcast FMA chain -- instead of carrying six
    persistent per-basis accumulators, which blew Mosaic's 16 MB scoped
    VMEM stack at tn=512 (measured: 29.9 MB live). Same operator K(w),
    different (still exact-f32-FMA) summation order than the roll path."""
    exts = [
        jnp.concatenate([ua_ref[c], ub_ref[c]], axis=0) for c in range(m)
    ]
    tl = o_ref.shape[-1]
    wa, wb, wc = wa_ref[:], wb_ref[:], wc_ref[:]  # [1, tl] lane rows
    accs = [jnp.zeros((tn, tl), dtype=o_ref.dtype) for _ in range(m)]
    for d_idx, off in enumerate(offsets):
        s = top + off
        vs = [
            jax.lax.slice_in_dim(exts[c], s, s + tn, axis=0)
            for c in range(m)
        ]
        for ci in range(m):
            acc = accs[ci]
            for cj in range(m):
                k = (d_idx * m + ci) * m + cj
                coeff = (
                    bta_ref[0, :, k : k + 1] * wa
                    + btb_ref[0, :, k : k + 1] * wb
                    + btc_ref[0, :, k : k + 1] * wc
                )
                acc = acc + coeff * vs[cj]
            accs[ci] = acc
    for ci in range(m):
        o_ref[ci] = accs[ci]


@partial(
    jax.jit,
    static_argnames=("offsets", "n_nodes", "plan", "interpret"),
)
def _lane_dia_matvec(
    bands_tiled, u, offsets, n_nodes, plan: LanePlan, interpret=False
):
    """y = K u; bands_tiled [G, tn, d4], u [m, N, B] f32."""
    m, _, b = u.shape
    tn, tl, top, g = plan.tn, plan.tl, plan.top, plan.g
    u_pad = _pad_lane_field(u, plan, n_nodes)
    out = pl.pallas_call(
        partial(_kernel, offsets=offsets, top=top, tn=tn, m=m),
        out_shape=jax.ShapeDtypeStruct((m, g * tn, b), jnp.float32),
        grid=(g, b // tl),
        # Mosaic's scoped-vmem stack estimate charges every unrolled
        # offset's slice temporaries as if simultaneously live and trips
        # its 16 MB default; the true live set is bounded by the plan's
        # budget (accumulators + window + a slice pair)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec(
                (1, tn, plan.d4), lambda i, j: (i, j * 0, j * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, tn, tl), lambda i, j: (i * 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, tn, tl), lambda i, j: (i * 0, i + 1, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, tn, tl), lambda i, j: (i * 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(bands_tiled, u_pad, u_pad)
    return out[:, :n_nodes, :]


@partial(
    jax.jit,
    static_argnames=("offsets", "n_nodes", "plan", "interpret"),
)
def _lane_dia_matvec3(
    bta, btb, btc, wa, wb, wc, u, offsets, n_nodes, plan: LanePlan,
    interpret=False,
):
    """y = (wa*Ka + wb*Kb + wc*Kc) u; bt* [G, tn, d4], w* [B] f32."""
    m, _, b = u.shape
    tn, tl, top, g = plan.tn, plan.tl, plan.top, plan.g
    u_pad = _pad_lane_field(u, plan, n_nodes)
    w_rows = [w.reshape(1, b) for w in (wa, wb, wc)]
    bspec = pl.BlockSpec(
        (1, tn, plan.d4), lambda i, j: (i, j * 0, j * 0),
        memory_space=pltpu.VMEM,
    )
    wspec = pl.BlockSpec(
        (1, tl), lambda i, j: (i * 0, j), memory_space=pltpu.VMEM
    )
    uspec_a = pl.BlockSpec(
        (m, tn, tl), lambda i, j: (i * 0, i, j), memory_space=pltpu.VMEM
    )
    uspec_b = pl.BlockSpec(
        (m, tn, tl), lambda i, j: (i * 0, i + 1, j),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        partial(_kernel3, offsets=offsets, top=top, tn=tn, m=m),
        out_shape=jax.ShapeDtypeStruct((m, g * tn, b), jnp.float32),
        grid=(g, b // tl),
        # see _lane_dia_matvec: the scoped-vmem estimate over-counts the
        # unrolled offset chain
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[bspec, bspec, bspec, wspec, wspec, wspec, uspec_a,
                  uspec_b],
        out_specs=pl.BlockSpec(
            (m, tn, tl), lambda i, j: (i * 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(bta, btb, btc, *w_rows, u_pad, u_pad)
    return out[:, :n_nodes, :]


def make_lane_dia_matvec(
    offsets: tuple[int, ...],
    n_nodes: int,
    n_lanes: int,
    dtype,
    interpret: Optional[bool] = None,
):
    """matvec(bands [D, m, m, N], u [m, N, B]) -> y, or None when the
    kernel does not apply (callers keep the roll formulation).

    `interpret=None` auto-selects interpreter mode off-TPU (CPU tests run
    the same code path). Call at TRACE time -- the decision is static."""
    plan = lane_dia_plan(offsets, n_nodes, n_lanes, dtype)
    if plan is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def matvec(bands, u):
        bt = pretile_lane_bands(bands.astype(jnp.float32), plan)
        return _lane_dia_matvec(
            bt, u, tuple(offsets), n_nodes, plan, interpret=interpret
        )

    return matvec


def make_lane_dia_matvec3(
    offsets: tuple[int, ...],
    n_nodes: int,
    n_lanes: int,
    dtype,
    interpret: Optional[bool] = None,
):
    """matvec(bands3 tuple of 3 [D, m, m, N], (wa, wb, wc) [B], u) -> y,
    or None. The per-lane material operator K(w) = wa*Ka + wb*Kb + wc*Kc
    (fem/amg.py's basis decomposition)."""
    plan = lane_dia_plan(offsets, n_nodes, n_lanes, dtype, nbases=3)
    if plan is None:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def matvec(bands3, w3, u):
        bts = [
            pretile_lane_bands(bk.astype(jnp.float32), plan)
            for bk in bands3
        ]
        ws = [w.astype(jnp.float32) for w in w3]
        return _lane_dia_matvec3(
            *bts, *ws, u, tuple(offsets), n_nodes, plan,
            interpret=interpret,
        )

    return matvec
