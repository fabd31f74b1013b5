"""End-to-end device solve: stiffness -> assembly -> PCG -> recovery.

Host/device split (the TPU-first layering of reference src/solver.rs:543-586):
  host:   sparsity structure build (numpy, cached per mesh connectivity)
  device: ONE jitted function doing batched element stiffness (einsum),
          segment_sum ELL assembly, block-Jacobi PCG, force + stress recovery.

The jitted core is cached per (solver options, shapes) so repeated solves --
parameter sweeps, CLI reruns -- pay compilation once.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..bc import BCArrays
from ..config import ModelMetadata, SolverOptions
from ..errors import SolverError
from ..meshing.core import Mesh
from .assembly import (
    assemble_dense,
    assemble_ell,
    build_ell_structure,
    extract_block_diagonal,
    EllStructure,
)
from .cg import pcg
from .element import element_stiffness_matrices
from .operator import (
    block_jacobi_preconditioner,
    identity_preconditioner,
    jacobi_preconditioner,
    make_constrained_operator,
    make_ell_operator,
    reduced_rhs,
)
from .stress import element_stress_tensors, scalar_stress, von_mises_stress


@dataclass
class SolveResult:
    u: np.ndarray  # [N,2] nodal displacements
    f: np.ndarray  # [N,2] nodal forces (recovered where unknown)
    sigma: np.ndarray  # [E,3] stress tensors [sx, sy, txy]
    stress: np.ndarray  # [E] reference-formula scalar stress
    von_mises: np.ndarray  # [E] true von Mises stress
    iterations: int
    residual_norm: float
    converged: bool
    timings: dict


def default_dtype(options: SolverOptions) -> np.dtype:
    if options.dtype is not None:
        return np.dtype(options.dtype)
    return np.dtype(np.float64) if jax.config.jax_enable_x64 else np.dtype(np.float32)


def _make_preconditioner(kind: str, diag_blocks, free_mask):
    if kind == "block_jacobi":
        return block_jacobi_preconditioner(diag_blocks, free_mask)
    if kind == "jacobi":
        return jacobi_preconditioner(diag_blocks, free_mask)
    if kind == "none":
        return identity_preconditioner()
    raise SolverError(f"unknown preconditioner '{kind}'")


@lru_cache(maxsize=32)
def _jitted_core(
    preconditioner: str,
    rtol: float,
    atol: float,
    maxiter: int,
    stress_sign_threshold: float,
    dense: bool,
):
    """Build + cache the jitted solve core for one option set."""

    def core(coords, tris, cols, slot_ids, u_known, u_value, f_value, e, nu, t):
        free = (~u_known).astype(coords.dtype)  # [N,2]
        ke = element_stiffness_matrices(coords, tris, e, nu, t)

        if dense:
            n = coords.shape[0]
            kmat = assemble_dense(ke, tris, n)
            free_f = free.reshape(-1)
            a = (
                kmat * (free_f[:, None] * free_f[None, :])
                + jnp.diag(1.0 - free_f)
            )
            b = free_f * (
                f_value.reshape(-1) - kmat @ (u_value.reshape(-1))
            ) + (1.0 - free_f) * u_value.reshape(-1)
            u_flat = jnp.linalg.solve(a, b)
            u = u_flat.reshape(-1, 2)
            ku = (kmat @ u_flat).reshape(-1, 2)
            iters = jnp.int32(0)
            resnorm = jnp.linalg.norm(free * (f_value - ku))
            converged = jnp.bool_(True)
        else:
            n = coords.shape[0]
            width = cols.shape[1]
            ell = assemble_ell_arrays(ke, slot_ids, n, width)
            matvec = make_ell_operator(ell, cols)
            op = make_constrained_operator(matvec, free)
            diag_blocks = extract_block_diagonal(ell, cols)
            precond = _make_preconditioner(preconditioner, diag_blocks, free)
            b = reduced_rhs(matvec, free, u_value, f_value)
            x0 = u_value  # satisfies the fixed DOFs exactly
            result = pcg(
                op,
                b,
                preconditioner=precond,
                x0=x0,
                rtol=rtol,
                atol=atol,
                maxiter=maxiter,
            )
            u = result.x
            ku = matvec(u)
            iters = result.iterations
            resnorm = result.residual_norm
            converged = result.converged

        # Force recovery: unknown forces are K u rows (reference
        # src/solver.rs:457-469); known applied forces pass through.
        f = jnp.where(u_known, ku, f_value)
        sigma = element_stress_tensors(coords, tris, u, e, nu)
        stress = scalar_stress(sigma, sign_threshold=stress_sign_threshold)
        vm = von_mises_stress(sigma)
        return u, f, sigma, stress, vm, iters, resnorm, converged

    return jax.jit(core)


def assemble_ell_arrays(ke, slot_ids, n_nodes: int, width: int):
    """Array-level ELL assembly (jit-friendly form of `assemble_ell`)."""
    from .assembly import element_blocks

    blocks = element_blocks(ke)
    flat = jax.ops.segment_sum(blocks, slot_ids, num_segments=n_nodes * width)
    return flat.reshape(n_nodes, width, 2, 2)


def solve_system(
    mesh: Mesh,
    bca: BCArrays,
    metadata: ModelMetadata,
    options: SolverOptions = SolverOptions(),
    structure: Optional[EllStructure] = None,
) -> SolveResult:
    """Full FEA solve of one mesh + boundary-condition set."""
    timings: dict = {}
    dtype = default_dtype(options)
    n = mesh.num_nodes

    if not bca.u_known.any():
        raise SolverError(
            "model has no prescribed displacements; stiffness system is singular"
        )

    t0 = time.perf_counter()
    dense = n <= options.dense_cutoff
    if dense:
        cols = np.zeros((n, 1), dtype=np.int32)
        slot_ids = np.zeros(mesh.num_elements * 9, dtype=np.int32)
    else:
        if structure is None:
            structure = build_ell_structure(mesh.tris, n)
        cols = structure.cols
        slot_ids = structure.slot_ids
    timings["structure_s"] = time.perf_counter() - t0

    # f32 cannot reach f64-grade residuals; clamp the tolerance to what the
    # working precision supports (~50x machine epsilon).
    rtol = float(options.cg_rtol)
    if dtype == np.float32:
        rtol = max(rtol, 50 * float(np.finfo(np.float32).eps))

    core = _jitted_core(
        options.preconditioner,
        rtol,
        float(options.cg_atol),
        int(options.max_cg_iters),
        float(options.stress_sign_threshold),
        dense,
    )

    t0 = time.perf_counter()
    coords = jnp.asarray(mesh.coords, dtype=dtype)
    tris = jnp.asarray(mesh.tris, dtype=jnp.int32)
    out = core(
        coords,
        tris,
        jnp.asarray(cols),
        jnp.asarray(slot_ids),
        jnp.asarray(bca.u_known),
        jnp.asarray(bca.u_value, dtype=dtype),
        jnp.asarray(bca.f_value, dtype=dtype),
        dtype.type(metadata.youngs_modulus),
        dtype.type(metadata.poisson_ratio),
        dtype.type(metadata.part_thickness),
    )
    u, f, sigma, stress, vm, iters, resnorm, converged = jax.block_until_ready(out)
    timings["solve_s"] = time.perf_counter() - t0

    converged = bool(converged)
    if not converged:
        raise SolverError(
            f"conjugate gradient failed to converge in {int(iters)} iterations "
            f"(residual norm {float(resnorm):.3e})"
        )

    return SolveResult(
        u=np.asarray(u),
        f=np.asarray(f),
        sigma=np.asarray(sigma),
        stress=np.asarray(stress),
        von_mises=np.asarray(vm),
        iterations=int(iters),
        residual_norm=float(resnorm),
        converged=converged,
        timings=timings,
    )
