"""Vmapped design sweeps: one assembled system, thousands of solves.

The reference solves one load case per process run. Here a `vmap` batch axis
turns the solve into a batched design sweep over:

  * load variants: scaled/replaced boundary values (u_value, f_value)
  * material variants: Young's modulus / thickness scale factors
    (K is linear in E*t for fixed nu, so these reuse ONE assembled operator:
    K' = s*K => solve s*K u = b(u_fixed) with rescaled RHS), and
  * full material variants (nu changes): re-assembled per variant under vmap.

Fixed-iteration PCG (lax.scan) is used so all batch lanes run in lockstep.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bc import BCArrays
from ..config import ModelMetadata
from ..fem.assembly import build_ell_structure
from ..fem.cg import pcg_fixed_iterations
from ..fem.element import element_stiffness_matrices
from ..fem.operator import (
    block_jacobi_preconditioner,
    make_constrained_operator,
    make_ell_operator,
    reduced_rhs,
)
from ..fem.solve import assemble_ell_arrays
from ..fem.stress import element_stress_tensors, von_mises_stress
from ..meshing.core import Mesh


class SweepResult(NamedTuple):
    u: jax.Array  # [B, N, 2]
    residual_norm: jax.Array  # [B]
    von_mises: jax.Array  # [B, E]


def _single_solve(
    ell, cols, diag, free, u_fixed, f_applied, k_scale, iterations
):
    """One lane of the sweep: solve (k_scale*K) u = f with BCs."""
    ell_s = ell * k_scale
    diag_s = diag * k_scale
    matvec = make_ell_operator(ell_s, cols)
    op = make_constrained_operator(matvec, free)
    precond = block_jacobi_preconditioner(diag_s, free)
    b = reduced_rhs(matvec, free, u_fixed, f_applied)
    result = pcg_fixed_iterations(
        op, b, preconditioner=precond, x0=u_fixed, iterations=iterations
    )
    return result.x, result.residual_norm


def sweep_solve(
    mesh: Mesh,
    base_bca: BCArrays,
    metadata: ModelMetadata,
    u_values: np.ndarray,  # [B, N, 2] prescribed displacement per variant
    f_values: np.ndarray,  # [B, N, 2] applied force per variant
    k_scales: np.ndarray,  # [B] stiffness scale (E*t factor) per variant
    iterations: int = 200,
    dtype=np.float32,
    structure=None,
) -> SweepResult:
    """Batched solve over B variants sharing one sparsity + base operator.

    The constraint PATTERN (which DOFs are fixed) is shared across variants;
    values and stiffness scale vary. Returns per-variant displacement and
    von Mises fields.
    """
    n = mesh.num_nodes
    if structure is None:
        structure = build_ell_structure(mesh.tris, n)

    coords = jnp.asarray(mesh.coords, dtype=dtype)
    tris = jnp.asarray(mesh.tris)
    free = jnp.asarray((~base_bca.u_known), dtype=dtype)

    @partial(jax.jit, static_argnums=(2, 3))
    def run(batch, operands, n_nodes, width):
        coords, tris, slot_ids, cols, free = operands
        ke = element_stiffness_matrices(
            coords,
            tris,
            metadata.youngs_modulus,
            metadata.poisson_ratio,
            metadata.part_thickness,
        )
        ell = assemble_ell_arrays(ke, slot_ids, n_nodes, width)
        own = (
            jnp.arange(n_nodes, dtype=cols.dtype)[:, None] == cols
        ).astype(ell.dtype)
        diag = jnp.einsum("nk,nkij->nij", own, ell)

        def lane(u_fixed, f_applied, k_scale):
            u, res = _single_solve(
                ell, cols, diag, free, u_fixed, f_applied, k_scale, iterations
            )
            sigma = element_stress_tensors(
                coords,
                tris,
                u,
                metadata.youngs_modulus,
                metadata.poisson_ratio,
            )
            vm = von_mises_stress(sigma) * k_scale
            return u, res, vm

        return jax.vmap(lane)(*batch)

    u, res, vm = run(
        (
            jnp.asarray(u_values, dtype=dtype),
            jnp.asarray(f_values, dtype=dtype),
            jnp.asarray(k_scales, dtype=dtype),
        ),
        (
            coords,
            tris,
            jnp.asarray(structure.slot_ids),
            jnp.asarray(structure.cols),
            free,
        ),
        n,
        structure.width,
    )
    return SweepResult(u=u, residual_norm=res, von_mises=vm)
