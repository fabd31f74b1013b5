"""2D stencil (9-point block) operator for structured grid meshes.

For meshes whose nodes form a logical (rows x cols) grid (Mesh.grid_shape),
every stiffness coupling is between grid neighbors: (dr, dt) in {-1,0,1}^2,
with the col axis optionally periodic (annulus wrap). The operator is stored
as stencil[9, 2, 2, rows, cols] -- cols minormost, perfect TPU lane layout --
and SpMV is nine shifted fused multiply-adds on [2, rows, cols] fields:

    y[i,r,c] = sum_{dr,dt} sum_j stencil[(dr,dt),i,j,r,c] * u[j, r+dr, c+dt]

No gather anywhere. This is also the foundation of the geometric-multigrid
preconditioner (fem/multigrid.py): coarsening preserves the 9-point block
stencil form exactly (Galerkin RAP with bilinear transfer).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# stencil offset enumeration, index = (dr+1)*3 + (dt+1)
OFFSETS = [(dr, dt) for dr in (-1, 0, 1) for dt in (-1, 0, 1)]
CENTER = 4  # index of (0, 0)


@dataclass
class StencilStructure:
    """Scatter pattern mapping element blocks into the stencil array."""

    slot_ids: np.ndarray  # [E*9] int64: ((dr+1)*3+(dt+1))*R*C + r*C + c
    rows: int
    cols: int
    wrap_cols: bool


def build_stencil_structure(
    tris: np.ndarray, rows: int, cols: int, wrap_cols: bool
) -> Optional[StencilStructure]:
    """Build the pattern, or None if any coupling is not grid-local."""
    tris = np.asarray(tris, dtype=np.int64)
    a = np.repeat(tris, 3, axis=1).reshape(-1)  # row node of each pair
    b = np.tile(tris, (1, 3)).reshape(-1)  # col node
    ra, ca = a // cols, a % cols
    rb, cb = b // cols, b % cols
    dr = rb - ra
    dt = cb - ca
    if wrap_cols:
        dt = np.where(dt > cols // 2, dt - cols, dt)
        dt = np.where(dt < -(cols // 2), dt + cols, dt)
    if (np.abs(dr) > 1).any() or (np.abs(dt) > 1).any():
        return None
    s_idx = (dr + 1) * 3 + (dt + 1)
    slot_ids = s_idx * (rows * cols) + a
    return StencilStructure(
        slot_ids=slot_ids.astype(np.int64),
        rows=rows,
        cols=cols,
        wrap_cols=wrap_cols,
    )


def assemble_stencil(
    ke: jax.Array, slot_ids, rows: int, cols: int
) -> jax.Array:
    """Device assembly -> stencil [9, 2, 2, rows, cols]."""
    from .assembly import element_blocks

    blocks = element_blocks(ke)  # [E*9(pairs), 2, 2]
    flat = jax.ops.segment_sum(
        blocks, jnp.asarray(slot_ids), num_segments=9 * rows * cols
    )  # [9*R*C, 2, 2]
    return flat.reshape(9, rows, cols, 2, 2).transpose(0, 3, 4, 1, 2)


def shift2d(u: jax.Array, dr: int, dt: int, wrap_cols: bool) -> jax.Array:
    """u [..., R, C] -> value at (r+dr, c+dt); zero-padded rows, wrapped or
    zero-padded cols."""
    out = u
    if dr:
        out = jnp.roll(out, -dr, axis=-2)
        if dr > 0:
            out = out.at[..., -dr:, :].set(0.0)
        else:
            out = out.at[..., :(-dr), :].set(0.0)
    if dt:
        out = jnp.roll(out, -dt, axis=-1)
        if not wrap_cols:
            if dt > 0:
                out = out.at[..., -dt:].set(0.0)
            else:
                out = out.at[..., :(-dt)].set(0.0)
    return out


def stencil_matvec_xla(
    stencil: jax.Array, u: jax.Array, wrap_cols: bool
) -> jax.Array:
    """y = K u on grid fields u [2, R, C] -> [2, R, C] (pure-XLA rolls).

    Row-shift zero padding is belt-and-braces: boundary stencil entries that
    would reach outside the grid are already zero by construction.
    """
    y = jnp.zeros_like(u)
    for s, (dr, dt) in enumerate(OFFSETS):
        us = shift2d(u, dr, dt, wrap_cols)
        y = y + jnp.einsum("ijrc,jrc->irc", stencil[s], us)
    return y


def stencil_matvec(
    stencil: jax.Array, u: jax.Array, wrap_cols: bool
) -> jax.Array:
    """y = K u, dispatching to the Pallas kernel on TPU when applicable.

    One-shot form (pre-tiles the bands per call); loops should hold a
    `make_stencil_operator` closure instead, which pre-tiles once.
    """
    rows, cols = stencil.shape[-2], stencil.shape[-1]
    if jax.default_backend() == "tpu":
        from ..pallas.stencil_kernel import (
            pallas_applicable,
            stencil_matvec_pallas,
        )

        if pallas_applicable(rows, cols, u.dtype):
            return stencil_matvec_pallas(stencil, u, wrap_cols)
    return stencil_matvec_xla(stencil, u, wrap_cols)


def stencil_diag_blocks(stencil: jax.Array) -> jax.Array:
    """Diagonal 2x2 blocks, [2, 2, R, C]."""
    return stencil[CENTER]


def make_stencil_operator(stencil: jax.Array, wrap_cols: bool, impl: str = "auto"):
    """op(u) = K u. On TPU (impl='auto') this pre-tiles the bands once into
    the Pallas kernel's contiguous-DMA layout (~90% of HBM roofline vs ~27%
    for the XLA roll formulation); under jit the transpose is loop-invariant
    and hoisted out of CG/smoother loops."""
    rows, cols = stencil.shape[-2], stencil.shape[-1]
    if impl == "auto" and jax.default_backend() == "tpu":
        from ..pallas.stencil_kernel import (
            make_pallas_stencil_operator,
            pallas_applicable,
        )

        if pallas_applicable(rows, cols, stencil.dtype):
            return make_pallas_stencil_operator(stencil, wrap_cols)

    def op(u: jax.Array) -> jax.Array:
        return stencil_matvec_xla(stencil, u, wrap_cols)

    return op


def stencil_to_dense(stencil: np.ndarray, wrap_cols: bool) -> np.ndarray:
    """Expand to a dense (2RC, 2RC) matrix (testing only)."""
    _, _, _, r, c = stencil.shape
    n = r * c
    k = np.zeros((n, 2, n, 2))
    for s, (dr, dt) in enumerate(OFFSETS):
        for rr in range(r):
            r2 = rr + dr
            if r2 < 0 or r2 >= r:
                continue
            for cc in range(c):
                c2 = cc + dt
                if wrap_cols:
                    c2 %= c
                elif c2 < 0 or c2 >= c:
                    continue
                k[rr * c + cc, :, r2 * c + c2, :] += stencil[s, :, :, rr, cc]
    return k.reshape(2 * n, 2 * n)
