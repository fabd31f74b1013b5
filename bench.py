"""Benchmark harness. Prints ONE JSON line.

Headline: linkedin-logo example (the reference's only published number:
0.286 s solve on a MacBook Air, reference readme.md:28) -- full device
pipeline (element stiffness einsum + DIA band assembly + block-Jacobi PCG +
stress recovery) in ONE jit call on one TPU chip. Extras report the
1M-element plate-with-hole scale run (BASELINE.json north star) and achieved
band bandwidth vs the chip's measured streaming ceiling.

Timing notes: the axon tunnel adds ~26 ms per-dispatch round trip and
downloads results at ~50 MB/s, so timed runs keep results on device and sync
on a scalar; the headline number is one full solve call including dispatch.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _build_solver(mesh, bca, metadata, rtol, maxiter, dtype):
    """Jitted full-pipeline solve (DIA if available, else ELL) + args.

    Returns (run, args, info) where run(*args) -> (checksum, iters, resnorm,
    max_vm) stays on device except scalars.
    """
    import jax
    import jax.numpy as jnp

    from magnetite_tpu.fem.cg import pcg
    from magnetite_tpu.fem.dia import (
        assemble_dia,
        block_jacobi_inverse_t,
        build_dia_structure,
        dia_diag_blocks,
        make_dia_operator,
    )
    from magnetite_tpu.fem.element import element_stiffness_matrices
    from magnetite_tpu.fem.stress import element_stress_tensors, von_mises_stress

    n = mesh.num_nodes
    s = build_dia_structure(mesh.tris, n)

    if s is not None:
        offsets = tuple(int(o) for o in s.offsets)
        d = s.n_diags

        @jax.jit
        def run(coords, tris, slot_ids, free_t, u_fixed_t, f_t):
            ke = element_stiffness_matrices(
                coords,
                tris,
                metadata.youngs_modulus,
                metadata.poisson_ratio,
                metadata.part_thickness,
            )
            bands = assemble_dia(ke, slot_ids, n, d)
            mv = make_dia_operator(bands, offsets)

            def op(v):
                return free_t * mv(free_t * v) + (1.0 - free_t) * v

            pre = block_jacobi_inverse_t(
                dia_diag_blocks(bands, offsets), free_t
            )
            b = free_t * (f_t - mv(u_fixed_t)) + (1.0 - free_t) * u_fixed_t
            r = pcg(
                op, b, preconditioner=pre, x0=u_fixed_t,
                rtol=rtol, maxiter=maxiter,
            )
            u = r.x.T  # [N,2]
            sigma = element_stress_tensors(
                coords, tris, u, metadata.youngs_modulus, metadata.poisson_ratio
            )
            vm = von_mises_stress(sigma)
            return jnp.sum(u), r.iterations, r.residual_norm, jnp.max(vm)

        args = (
            jnp.asarray(mesh.coords, dtype=dtype),
            jnp.asarray(mesh.tris),
            jnp.asarray(s.slot_ids),
            jnp.asarray((~bca.u_known).T.astype(dtype)),
            jnp.asarray(bca.u_value.T.astype(dtype)),
            jnp.asarray(bca.f_value.T.astype(dtype)),
        )
        return run, args, {"n_diags": d, "operator": "dia"}

    # unstructured numbering: gather-ELL fallback
    from magnetite_tpu.fem.assembly import (
        build_ell_structure,
        extract_block_diagonal,
    )
    from magnetite_tpu.fem.operator import (
        block_jacobi_preconditioner,
        make_constrained_operator,
        make_ell_operator,
        reduced_rhs,
    )
    from magnetite_tpu.fem.solve import assemble_ell_arrays

    se = build_ell_structure(mesh.tris, n)

    @jax.jit
    def run_ell(coords, tris, slot_ids, cols, free, u_fixed, f_applied):
        ke = element_stiffness_matrices(
            coords,
            tris,
            metadata.youngs_modulus,
            metadata.poisson_ratio,
            metadata.part_thickness,
        )
        ell = assemble_ell_arrays(ke, slot_ids, n, se.width)
        matvec = make_ell_operator(ell, cols)
        op = make_constrained_operator(matvec, free)
        pre = block_jacobi_preconditioner(
            extract_block_diagonal(ell, cols), free
        )
        b = reduced_rhs(matvec, free, u_fixed, f_applied)
        r = pcg(op, b, preconditioner=pre, x0=u_fixed, rtol=rtol, maxiter=maxiter)
        sigma = element_stress_tensors(
            coords, tris, r.x, metadata.youngs_modulus, metadata.poisson_ratio
        )
        vm = von_mises_stress(sigma)
        return jnp.sum(r.x), r.iterations, r.residual_norm, jnp.max(vm)

    args = (
        jnp.asarray(mesh.coords, dtype=dtype),
        jnp.asarray(mesh.tris),
        jnp.asarray(se.slot_ids),
        jnp.asarray(se.cols),
        jnp.asarray((~bca.u_known).astype(dtype)),
        jnp.asarray(bca.u_value.astype(dtype)),
        jnp.asarray(bca.f_value.astype(dtype)),
    )
    return run_ell, args, {"n_diags": 0, "operator": "ell"}


def _time_solve(run, args, repeats):
    out = run(*args)
    checksum = float(out[0])  # sync
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(*args)
        float(out[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out, checksum


def bench_linkedin(extras):
    from magnetite_tpu.config import load_simulation_input
    from magnetite_tpu.meshing import runner

    ex = "/root/reference/examples/linkedin-logo"
    sim = load_simulation_input(f"{ex}/input.json")
    mesh, bca = runner.run(
        [f"{ex}/linkedin.svg"], sim, backend="delaunay", log=lambda m: None
    )
    run, args, info = _build_solver(
        mesh, bca, sim.metadata, rtol=1e-6, maxiter=50000, dtype=np.float32
    )
    t, out, _ = _time_solve(run, args, repeats=5)
    extras["linkedin_nodes"] = mesh.num_nodes
    extras["linkedin_elements"] = mesh.num_elements
    extras["linkedin_cg_iters"] = int(out[1])
    extras["linkedin_n_diags"] = info["n_diags"]
    return t


def bench_plate_1m(extras):
    from magnetite_tpu.bc import BCArrays
    from magnetite_tpu.config import ModelMetadata
    from magnetite_tpu.meshing.generators import plate_with_hole_mesh

    t0 = time.perf_counter()
    mesh = plate_with_hole_mesh(512, 1024)  # 1,048,576 elements
    extras["plate_mesh_gen_s"] = round(time.perf_counter() - t0, 2)

    n = mesh.num_nodes
    coords = mesh.coords
    u_known = np.zeros((n, 2), dtype=bool)
    u_value = np.zeros((n, 2))
    left = np.isclose(coords[:, 0], coords[:, 0].min())
    right = np.isclose(coords[:, 0], coords[:, 0].max())
    u_known[left] = True
    u_known[right, 0] = True
    u_value[right, 0] = 0.01
    bca = BCArrays(u_known=u_known, u_value=u_value, f_value=np.zeros((n, 2)))
    metadata = ModelMetadata(69e9, 0.33, 0.5, 0.0, 0.01)

    run, args, info = _build_solver(
        mesh, bca, metadata, rtol=1e-6, maxiter=50000, dtype=np.float32
    )
    t, out, _ = _time_solve(run, args, repeats=3)
    iters = int(out[1])
    extras["plate_elements"] = mesh.num_elements
    extras["plate_nodes"] = n
    extras["plate_solve_s"] = round(t, 3)
    extras["plate_cg_iters"] = iters
    extras["plate_n_diags"] = info["n_diags"]
    extras["plate_pcg_dof_iters_per_s"] = round(2 * n * iters / t / 1e9, 2)
    band_bytes = info["n_diags"] * 4 * n * 4
    extras["plate_band_gb_s"] = round(band_bytes * iters / t / 1e9, 1)
    extras["plate_max_von_mises"] = float(out[3])


def main():
    import jax

    # TPU compiles of the multigrid pipeline are expensive; cache them.
    jax.config.update("jax_compilation_cache_dir", "/tmp/magnetite_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    extras = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    linkedin_t = bench_linkedin(extras)
    try:
        bench_plate_1m(extras)
    except Exception as err:  # scale run must not mask the headline
        extras["plate_error"] = f"{type(err).__name__}: {err}"

    baseline = 0.286  # reference readme.md:28
    print(
        json.dumps(
            {
                "metric": "linkedin_logo_device_pipeline_s",
                "value": round(linkedin_t, 5),
                "unit": "s",
                "vs_baseline": round(baseline / linkedin_t, 2),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
