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
    mode: str,  # "dense" | "ell" | "dia"
    dia_offsets: tuple = (),
):
    """Build + cache the jitted solve core for one option set."""
    dense = mode == "dense"

    def core(coords, tris, cols, slot_ids, u_known, u_value, f_value, e, nu, t):
        free = (~u_known).astype(coords.dtype)  # [N,2]
        ke = element_stiffness_matrices(coords, tris, e, nu, t)

        if mode == "stencil":
            from .multigrid import build_hierarchy, vcycle_preconditioner
            from .stencil import (
                assemble_stencil,
                make_stencil_operator,
                shift2d,
                OFFSETS,
                CENTER,
            )

            rows, cols_n, wrap = dia_offsets  # repurposed static params
            grid = lambda a: a.T.reshape(2, rows, cols_n)
            free_g = grid(free)
            raw = assemble_stencil(ke, slot_ids, rows, cols_n)
            # fold BC reduction into the stencil: identity on fixed DOFs
            reduced = []
            for s, (dr, dt) in enumerate(OFFSETS):
                fin = shift2d(free_g, dr, dt, wrap)
                blk = raw[s] * free_g[:, None] * fin[None, :]
                if s == CENTER:
                    blk = blk.at[0, 0].add(1.0 - free_g[0])
                    blk = blk.at[1, 1].add(1.0 - free_g[1])
                reduced.append(blk)
            reduced = jnp.stack(reduced)
            op = make_stencil_operator(reduced, wrap)

            u_fixed_g = grid(u_value)
            f_g = grid(f_value)
            # reduced RHS: fixed DOFs contribute through the RAW operator
            raw_op = make_stencil_operator(raw, wrap)
            b = free_g * (f_g - raw_op((1.0 - free_g) * u_fixed_g)) + (
                1.0 - free_g
            ) * u_fixed_g

            if preconditioner == "multigrid":
                levels = build_hierarchy(reduced, free_g, wrap)
                precond = vcycle_preconditioner(levels, wrap)
            elif preconditioner == "none":
                precond = identity_preconditioner()
            else:
                from .dia import block_jacobi_inverse_t

                # center blocks of the reduced stencil are the diagonal
                d = reduced[CENTER]
                a_, b_ = d[0, 0], d[0, 1]
                c_, e_ = d[1, 0], d[1, 1]
                det = a_ * e_ - b_ * c_
                det = jnp.where(det == 0, 1.0, det)
                inv = (
                    jnp.stack(
                        [jnp.stack([e_, -b_]), jnp.stack([-c_, a_])]
                    )
                    / det
                )

                def precond(r):
                    return jnp.einsum("ijrc,jrc->irc", inv, r)

            result = pcg(
                op,
                b,
                preconditioner=precond,
                x0=u_fixed_g,
                rtol=rtol,
                atol=atol,
                maxiter=maxiter,
            )
            u = result.x.reshape(2, -1).T  # [N,2]
            ku = raw_op(result.x).reshape(2, -1).T
            iters = result.iterations
            resnorm = result.residual_norm
            converged = result.converged
        elif mode == "hybrid":
            from .dia import (
                assemble_hybrid,
                block_jacobi_inverse_t,
                hybrid_matvec,
            )

            n = coords.shape[0]
            n_rem = cols.shape[1]
            rem_rows, rem_cols = cols[0], cols[1]
            bands, rem_vals = assemble_hybrid(
                ke, slot_ids, n, len(dia_offsets), n_rem
            )

            def matvec_t(v):
                return hybrid_matvec(
                    bands, dia_offsets, rem_vals, rem_rows, rem_cols, v
                )

            free_t = free.T
            u_fixed_t = u_value.T
            f_t = f_value.T

            def op(v):
                return free_t * matvec_t(free_t * v) + (1.0 - free_t) * v

            zero_idx = dia_offsets.index(0)
            diag_t = bands[zero_idx]
            if preconditioner == "none":
                precond = identity_preconditioner()
            else:
                precond = block_jacobi_inverse_t(diag_t, free_t)
            b = free_t * (f_t - matvec_t(u_fixed_t)) + (1.0 - free_t) * u_fixed_t
            result = pcg(
                op,
                b,
                preconditioner=precond,
                x0=u_fixed_t,
                rtol=rtol,
                atol=atol,
                maxiter=maxiter,
            )
            u = result.x.T
            ku = matvec_t(result.x).T
            iters = result.iterations
            resnorm = result.residual_norm
            converged = result.converged
        elif mode == "dia":
            from .dia import (
                assemble_dia,
                block_jacobi_inverse_t,
                dia_diag_blocks,
                make_dia_operator,
            )

            n = coords.shape[0]
            bands = assemble_dia(ke, slot_ids, n, len(dia_offsets))
            matvec_t = make_dia_operator(bands, dia_offsets)
            free_t = free.T  # [2, N] transposed layout, N minormost
            u_fixed_t = u_value.T
            f_t = f_value.T

            def op(v):
                return free_t * matvec_t(free_t * v) + (1.0 - free_t) * v

            diag_t = dia_diag_blocks(bands, dia_offsets)
            if preconditioner == "none":
                precond = identity_preconditioner()
            else:
                precond = block_jacobi_inverse_t(diag_t, free_t)
            b = free_t * (f_t - matvec_t(u_fixed_t)) + (1.0 - free_t) * u_fixed_t
            result = pcg(
                op,
                b,
                preconditioner=precond,
                x0=u_fixed_t,
                rtol=rtol,
                atol=atol,
                maxiter=maxiter,
            )
            u = result.x.T
            ku = matvec_t(result.x).T
            iters = result.iterations
            resnorm = result.residual_norm
            converged = result.converged
        elif dense:
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
    """Full FEA solve of one mesh + boundary-condition set.

    One-shot convenience wrapper around `compile_problem` -- repeated solves
    of the same mesh should hold onto a CompiledProblem instead (device
    arrays stay resident; only the jit call repeats).
    """
    problem = compile_problem(mesh, bca, metadata, options, structure)
    return problem.solve()


@dataclass
class CompiledProblem:
    """A mesh+BC system compiled and resident on device.

    `solve()` runs the full pipeline (assembly + PCG + recovery) and fetches
    results to host. `solve_device()` returns the raw device outputs
    (u, f, sigma, stress, von_mises, iters, resnorm, converged) without any
    host transfer -- the serving/benchmark path.
    """

    core: object
    args: tuple
    mode: str
    preconditioner: str
    timings: dict

    def solve_device(self):
        return self.core(*self.args)

    def solve(self) -> SolveResult:
        timings = dict(self.timings)
        t0 = time.perf_counter()
        out = self.core(*self.args)
        u, f, sigma, stress, vm, iters, resnorm, converged = (
            jax.block_until_ready(out)
        )
        timings["solve_s"] = time.perf_counter() - t0

        if not bool(converged):
            raise SolverError(
                f"conjugate gradient failed to converge in {int(iters)} "
                f"iterations (residual norm {float(resnorm):.3e})"
            )
        return SolveResult(
            u=np.asarray(u),
            f=np.asarray(f),
            sigma=np.asarray(sigma),
            stress=np.asarray(stress),
            von_mises=np.asarray(vm),
            iterations=int(iters),
            residual_norm=float(resnorm),
            converged=True,
            timings=timings,
        )


def compile_problem(
    mesh: Mesh,
    bca: BCArrays,
    metadata: ModelMetadata,
    options: SolverOptions = SolverOptions(),
    structure: Optional[EllStructure] = None,
) -> CompiledProblem:
    """Select the operator format, build/cache the jitted core, upload args."""
    timings: dict = {}
    dtype = default_dtype(options)
    n = mesh.num_nodes

    if not bca.u_known.any():
        raise SolverError(
            "model has no prescribed displacements; stiffness system is singular"
        )

    t0 = time.perf_counter()
    mode = "dense" if n <= options.dense_cutoff else None
    dia_offsets: tuple = ()
    cols = np.zeros((1, 1), dtype=np.int32)
    slot_ids = np.zeros(1, dtype=np.int32)
    if (
        mode is None
        and options.operator in ("auto", "stencil")
        and mesh.grid_shape is not None
    ):
        from .stencil import build_stencil_structure

        rows_g, cols_g = mesh.grid_shape
        st = build_stencil_structure(mesh.tris, rows_g, cols_g, mesh.wrap_cols)
        if st is not None:
            mode = "stencil"
            slot_ids = st.slot_ids
            dia_offsets = (rows_g, cols_g, mesh.wrap_cols)
        elif options.operator == "stencil":
            raise SolverError(
                "mesh connectivity is not grid-local; stencil operator "
                "unavailable"
            )
    if mode is None and options.operator in ("auto", "dia"):
        from .dia import build_dia_structure

        dia = build_dia_structure(mesh.tris, n, max_diags=options.max_diags)
        if dia is not None:
            mode = "dia"
            slot_ids = dia.slot_ids
            dia_offsets = tuple(int(o) for o in dia.offsets)
        elif options.operator == "dia":
            raise SolverError(
                f"mesh needs more than {options.max_diags} diagonal bands; "
                "use operator='ell' or renumber the mesh"
            )
    if mode is None and options.operator in ("auto", "hybrid"):
        from .dia import build_hybrid_structure

        hyb = build_hybrid_structure(mesh.tris, n, max_diags=options.max_diags)
        mode = "hybrid"
        slot_ids = hyb.slot_ids
        dia_offsets = tuple(int(o) for o in hyb.offsets)
        cols = np.stack([hyb.rem_rows, hyb.rem_cols]).astype(np.int32)
        if cols.shape[1] == 0:  # fully banded after all
            cols = np.zeros((2, 1), dtype=np.int32)
    if mode is None:
        mode = "ell"
        if structure is None:
            structure = build_ell_structure(mesh.tris, n)
        cols = structure.cols
        slot_ids = structure.slot_ids
    timings["structure_s"] = time.perf_counter() - t0
    timings["operator"] = mode

    # f32 cannot reach f64-grade residuals; clamp the tolerance to what the
    # working precision supports (~50x machine epsilon).
    rtol = float(options.cg_rtol)
    if dtype == np.float32:
        rtol = max(rtol, 50 * float(np.finfo(np.float32).eps))

    preconditioner = options.preconditioner
    if preconditioner == "auto":
        if mode == "stencil":
            rows_g, cols_g, wrap_g = dia_offsets
            from .multigrid import can_coarsen

            preconditioner = (
                "multigrid"
                if can_coarsen(rows_g, cols_g, wrap_g)
                else "block_jacobi"
            )
        else:
            preconditioner = "block_jacobi"
    elif preconditioner == "multigrid" and mode != "stencil":
        raise SolverError(
            "multigrid preconditioner requires a structured-grid mesh "
            "(stencil operator)"
        )
    timings["preconditioner"] = preconditioner

    core = _jitted_core(
        preconditioner,
        rtol,
        float(options.cg_atol),
        int(options.max_cg_iters),
        float(options.stress_sign_threshold),
        mode,
        dia_offsets,
    )

    t0 = time.perf_counter()
    args = (
        jnp.asarray(mesh.coords, dtype=dtype),
        jnp.asarray(mesh.tris, dtype=jnp.int32),
        jnp.asarray(cols),
        jnp.asarray(slot_ids),
        jnp.asarray(bca.u_known),
        jnp.asarray(bca.u_value, dtype=dtype),
        jnp.asarray(bca.f_value, dtype=dtype),
        dtype.type(metadata.youngs_modulus),
        dtype.type(metadata.poisson_ratio),
        dtype.type(metadata.part_thickness),
    )
    jax.block_until_ready(args[:7])
    timings["upload_s"] = time.perf_counter() - t0

    return CompiledProblem(
        core=core,
        args=args,
        mode=mode,
        preconditioner=preconditioner,
        timings=timings,
    )


