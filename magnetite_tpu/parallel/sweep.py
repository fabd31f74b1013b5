"""Vmapped / lane-batched design sweeps: one assembled system, thousands of
solves.

The reference solves one load case per process run. Here a batch axis turns
the solve into a design sweep over load variants (prescribed displacements /
applied forces) and stiffness scale factors (Young's modulus at fixed
Poisson ratio: K' = s*K reuses ONE assembled operator).

Two implementations:
  * lanes path (TPU-fast, default when the mesh is DIA-compatible): fields
    are laid out [2, N, B] with the BATCH as the minor (lane) dimension --
    4096 variants = 4096 lanes, zero padding waste. The band SpMV broadcasts
    one operator over all lanes; CG scalars become [B] vectors. A naive
    vmap of the [N,K,2,2] ELL solver pads its tiny minor dims 64x and OOMs
    at B=4096; this layout is why the sweep fits.
  * vmap path (fallback for unstructured meshes): jax.vmap over the
    gather-ELL solver.

Fixed-iteration PCG keeps all lanes in lockstep.
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
from ..fem.dia import assemble_dia, build_dia_structure
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
    residual_norm: jax.Array  # [B] absolute ||b - K u|| per lane
    von_mises: jax.Array  # [B, E]
    rhs_norm: jax.Array = None  # [B] ||b|| per lane (relative-residual scale)


# ----------------------------- lanes path ---------------------------------


def _lane_dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-lane inner product: [2, N, B] x [2, N, B] -> [B]."""
    return jnp.sum(a * b, axis=(0, 1))


def _lanes_core(
    bands,
    offsets: tuple,
    d_mat,
    b_mat,
    free,  # [2, N]
    u_fixed,  # [2, N, B]
    f_applied,  # [2, N, B]
    k_scales,  # [B]
    tris,
    iterations: int,
):
    """Batched solve with batch as the lane dimension."""
    free_b = free[:, :, None]  # broadcast over lanes

    def base_matvec(u):  # u [2, N, B]
        y0 = jnp.zeros_like(u[0])
        y1 = jnp.zeros_like(u[1])
        for d_idx, off in enumerate(offsets):
            shifted = jnp.roll(u, -off, axis=1) if off != 0 else u
            b = bands[d_idx][:, :, :, None]  # [2,2,N,1] broadcast over lanes
            # explicit 2x2 block FMAs: full-f32 VPU (einsum lowers the tiny
            # contraction to bf16 MXU passes and stalls CG convergence)
            y0 = y0 + b[0, 0] * shifted[0] + b[0, 1] * shifted[1]
            y1 = y1 + b[1, 0] * shifted[0] + b[1, 1] * shifted[1]
        return jnp.stack([y0, y1]) * k_scales  # K_b = s_b * K

    def op(v):
        return free_b * base_matvec(free_b * v) + (1.0 - free_b) * v

    # block-Jacobi inverse of the scaled reduced diagonal
    zero_idx = offsets.index(0)
    diag = bands[zero_idx]  # [2, 2, N]
    f0, f1 = free[0], free[1]
    outer = free[:, None, :] * free[None, :, :]
    d = diag * outer
    d = d.at[0, 0].add(1.0 - f0)
    d = d.at[1, 1].add(1.0 - f1)
    a_, b_ = d[0, 0], d[0, 1]
    c_, e_ = d[1, 0], d[1, 1]
    det = a_ * e_ - b_ * c_
    det = jnp.where(det == 0, 1.0, det)
    inv = jnp.stack([jnp.stack([e_, -b_]), jnp.stack([-c_, a_])]) / det

    # un-scale: M_b^{-1} = (1/s_b) M^{-1}, except fixed DOFs (identity rows)
    inv_scale = free_b / k_scales + (1.0 - free_b)

    inv_b = inv[:, :, :, None]  # [2,2,N,1]

    def precond(r):
        p0 = inv_b[0, 0] * r[0] + inv_b[0, 1] * r[1]
        p1 = inv_b[1, 0] * r[0] + inv_b[1, 1] * r[1]
        return jnp.stack([p0, p1]) * inv_scale

    rhs = free_b * (f_applied - base_matvec(u_fixed)) + (1.0 - free_b) * u_fixed

    result = pcg_fixed_iterations(
        op,
        rhs,
        preconditioner=precond,
        x0=u_fixed,
        iterations=iterations,
        dot=_lane_dot,
    )
    u = result.x  # [2, N, B]

    # stress per lane: sigma = s_b * D B u_b
    ue = u[:, tris, :]  # [2, E, 3, B]
    ue = ue.transpose(1, 2, 0, 3).reshape(tris.shape[0], 6, -1)  # [E, 6, B]
    strain = jnp.einsum("erj,ejb->erb", b_mat, ue, precision="highest")  # [E, 3, B]
    sigma = jnp.einsum("rs,esb->erb", d_mat, strain, precision="highest")  # [E, 3, B]
    vm = (
        jnp.sqrt(
            sigma[:, 0] ** 2
            - sigma[:, 0] * sigma[:, 1]
            + sigma[:, 1] ** 2
            + 3.0 * sigma[:, 2] ** 2
        )
        * k_scales[None, :]
    )  # [E, B]
    return (
        u.transpose(2, 1, 0),  # [B, N, 2]
        result.residual_norm,  # [B]
        vm.T,  # [B, E]
        jnp.sqrt(_lane_dot(rhs, rhs)),  # [B]
    )


@partial(jax.jit, static_argnames=("offsets", "iterations"))
def _lanes_jit(bands, offsets, d_mat, b_mat, free, u_fixed, f_applied,
               k_scales, tris, iterations):
    return _lanes_core(
        bands, offsets, d_mat, b_mat, free, u_fixed, f_applied, k_scales,
        tris, iterations,
    )


def _sweep_lanes(
    mesh, base_bca, metadata, u_values, f_values, k_scales, iterations, dtype,
    dia,
):
    from ..fem.element import (
        element_areas,
        gather_element_coords,
        strain_displacement_matrices,
        stress_strain_matrix,
    )

    n = mesh.num_nodes
    coords = jnp.asarray(mesh.coords, dtype=dtype)
    tris = jnp.asarray(mesh.tris)
    ke = element_stiffness_matrices(
        coords,
        tris,
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    bands = assemble_dia(ke, dia.slot_ids, n, dia.n_diags)
    offsets = tuple(int(o) for o in dia.offsets)

    ecoords = gather_element_coords(coords, tris)
    areas = element_areas(ecoords)
    b_mat = strain_displacement_matrices(ecoords, areas)  # [E,3,6]
    d_mat = stress_strain_matrix(
        metadata.youngs_modulus, metadata.poisson_ratio, dtype=dtype
    )

    free = jnp.asarray((~base_bca.u_known).T.astype(dtype))  # [2, N]
    u_fixed = jnp.asarray(
        np.ascontiguousarray(np.transpose(u_values, (2, 1, 0))).astype(dtype)
    )  # [2, N, B]
    f_applied = jnp.asarray(
        np.ascontiguousarray(np.transpose(f_values, (2, 1, 0))).astype(dtype)
    )
    u, res, vm, rhs_norm = _lanes_jit(
        bands,
        offsets,
        d_mat,
        b_mat,
        free,
        u_fixed,
        f_applied,
        jnp.asarray(k_scales, dtype=dtype),
        tris,
        int(iterations),
    )
    return SweepResult(u=u, residual_norm=res, von_mises=vm, rhs_norm=rhs_norm)


# ------------------------------ vmap path ---------------------------------


def _single_solve(
    ell, cols, diag, free, u_fixed, f_applied, k_scale, iterations
):
    """One lane of the vmap sweep: solve (k_scale*K) u = f with BCs."""
    ell_s = ell * k_scale
    diag_s = diag * k_scale
    matvec = make_ell_operator(ell_s, cols)
    op = make_constrained_operator(matvec, free)
    precond = block_jacobi_preconditioner(diag_s, free)
    b = reduced_rhs(matvec, free, u_fixed, f_applied)
    result = pcg_fixed_iterations(
        op, b, preconditioner=precond, x0=u_fixed, iterations=iterations
    )
    return result.x, result.residual_norm, jnp.sqrt(jnp.sum(b * b))


def _sweep_vmap(
    mesh, base_bca, metadata, u_values, f_values, k_scales, iterations, dtype,
    structure,
):
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
        diag = jnp.einsum("nk,nkij->nij", own, ell, precision="highest")

        def lane(u_fixed, f_applied, k_scale):
            u, res, bn = _single_solve(
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
            return u, res, vm, bn

        return jax.vmap(lane)(*batch)

    u, res, vm, rhs_norm = run(
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
    return SweepResult(u=u, residual_norm=res, von_mises=vm, rhs_norm=rhs_norm)


# ------------------------------ public API --------------------------------


def sweep_solve(
    mesh: Mesh,
    base_bca: BCArrays,
    metadata: ModelMetadata,
    u_values: np.ndarray,  # [B, N, 2] prescribed displacement per variant
    f_values: np.ndarray,  # [B, N, 2] applied force per variant
    k_scales: np.ndarray,  # [B] Young's-modulus scale per variant
    iterations: int = 200,
    dtype=np.float32,
    structure=None,
    impl: str = "auto",
) -> SweepResult:
    """Batched solve over B variants sharing one sparsity + base operator.

    The constraint PATTERN (which DOFs are fixed) is shared across variants;
    values and stiffness scale vary. Returns per-variant displacement and
    von Mises fields. k_scales model Young's modulus at fixed Poisson ratio
    and thickness (u scales as 1/s for force-driven cases; stress recovery
    accounts for the material scale in both cases).
    """
    if impl in ("auto", "lanes"):
        dia = build_dia_structure(mesh.tris, mesh.num_nodes)
        if dia is not None:
            return _sweep_lanes(
                mesh, base_bca, metadata, u_values, f_values, k_scales,
                iterations, dtype, dia,
            )
        if impl == "lanes":
            raise ValueError("mesh is not DIA-compatible; lanes sweep unavailable")
    return _sweep_vmap(
        mesh, base_bca, metadata, u_values, f_values, k_scales,
        iterations, dtype, structure,
    )
