"""Benchmark harness. Prints ONE JSON line.

Headline: linkedin-logo example (the reference's only published number:
0.286 s solve on a MacBook Air, reference readme.md:28) -- full device
pipeline (element stiffness einsum + band assembly + preconditioned CG +
stress recovery) in ONE jit call on one TPU chip. Extras report the
1M-element plate-with-hole scale run with the geometric-multigrid solver
(BASELINE.json north star) and a 4096-variant vmapped design sweep.

Timing notes: the axon tunnel adds ~26 ms per-dispatch round trip and moves
data at ~50 MB/s, so all timed runs keep inputs AND outputs on device
(CompiledProblem.solve_device) and sync on a scalar.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync_scalar(out):
    return float(np.asarray(out[5]))  # iters (tiny transfer forces sync)


def _time_device_solve(problem, repeats):
    out = problem.solve_device()
    _sync_scalar(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = problem.solve_device()
        _sync_scalar(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def _plate_problem(nr, nt):
    from magnetite_tpu.bc import BCArrays
    from magnetite_tpu.meshing.generators import plate_with_hole_mesh

    mesh = plate_with_hole_mesh(nr, nt)
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
    return mesh, bca


def bench_linkedin(extras):
    from magnetite_tpu.config import SolverOptions, load_simulation_input
    from magnetite_tpu.fem.solve import compile_problem
    from magnetite_tpu.meshing import runner

    ex = "/root/reference/examples/linkedin-logo"
    sim = load_simulation_input(f"{ex}/input.json")
    mesh, bca = runner.run(
        [f"{ex}/linkedin.svg"], sim, backend="delaunay", log=lambda m: None
    )
    problem = compile_problem(
        mesh, bca, sim.metadata,
        SolverOptions(dtype="float32", cg_rtol=1e-6),
    )
    t, out = _time_device_solve(problem, repeats=5)
    extras["linkedin_nodes"] = mesh.num_nodes
    extras["linkedin_elements"] = mesh.num_elements
    extras["linkedin_cg_iters"] = int(np.asarray(out[5]))
    extras["linkedin_operator"] = problem.mode
    return t


def bench_plate_1m(extras):
    from magnetite_tpu.config import ModelMetadata, SolverOptions
    from magnetite_tpu.fem.solve import compile_problem

    t0 = time.perf_counter()
    mesh, bca = _plate_problem(512, 1024)  # 1,048,576 elements
    extras["plate_mesh_gen_s"] = round(time.perf_counter() - t0, 2)
    metadata = ModelMetadata(69e9, 0.33, 0.5, 0.0, 0.01)

    t0 = time.perf_counter()
    problem = compile_problem(
        mesh, bca, metadata, SolverOptions(dtype="float32", cg_rtol=1e-6)
    )
    extras["plate_prep_s"] = round(time.perf_counter() - t0, 2)

    t, out = _time_device_solve(problem, repeats=3)
    iters = int(np.asarray(out[5]))
    n = mesh.num_nodes
    extras["plate_elements"] = mesh.num_elements
    extras["plate_nodes"] = n
    extras["plate_solve_s"] = round(t, 3)
    extras["plate_iters"] = iters
    extras["plate_operator"] = problem.mode
    extras["plate_preconditioner"] = problem.preconditioner
    extras["plate_residual"] = float(np.asarray(out[6]))
    extras["plate_dof_per_s"] = round(2 * n / t / 1e6, 2)  # MDOF/s end to end


def bench_sweep(extras):
    """4096 load variants of the tensile plate in one vmapped batched solve
    (BASELINE.json configs[4])."""
    from magnetite_tpu.config import ModelMetadata
    from magnetite_tpu.meshing.generators import rect_mesh, tensile_bcs_for_rect
    from magnetite_tpu.parallel.sweep import sweep_solve

    mesh = rect_mesh(64, 32, width=2.0)
    base = tensile_bcs_for_rect(mesh.coords, pull=0.01)
    metadata = ModelMetadata(69e9, 0.33, 0.5, 0.0, 0.05)
    b = 4096
    rng = np.random.default_rng(0)
    pulls = rng.uniform(0.005, 0.02, b)
    right = np.isclose(mesh.coords[:, 0], 2.0)
    u_values = np.tile(base.u_value[None], (b, 1, 1))
    u_values[:, right, 0] = pulls[:, None]
    f_values = np.zeros((b, mesh.num_nodes, 2), dtype=np.float32)
    k_scales = rng.uniform(0.5, 2.0, b)

    t0 = time.perf_counter()
    result = sweep_solve(
        mesh, base, metadata, u_values, f_values, k_scales,
        iterations=150, dtype=np.float32,
    )
    float(np.asarray(result.residual_norm[0]))
    t_total = time.perf_counter() - t0  # includes compile
    t0 = time.perf_counter()
    result = sweep_solve(
        mesh, base, metadata, u_values, f_values, k_scales,
        iterations=150, dtype=np.float32,
    )
    float(np.asarray(result.residual_norm[0]))
    t = time.perf_counter() - t0
    extras["sweep_variants"] = b
    extras["sweep_mesh_elements"] = mesh.num_elements
    extras["sweep_warm_s"] = round(t, 3)
    extras["sweep_solves_per_s"] = round(b / t)
    extras["sweep_first_s"] = round(t_total, 2)


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
    for name, fn in [("plate", bench_plate_1m), ("sweep", bench_sweep)]:
        try:
            fn(extras)
        except Exception as err:  # extras must not mask the headline
            extras[f"{name}_error"] = f"{type(err).__name__}: {err}"

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
