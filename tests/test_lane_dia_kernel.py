"""Lane-batched DIA Pallas kernel (pallas/lane_dia_kernel.py).

The kernel replaces the roll-formulated band matvec on [2, N, B] sweep
lane fields (measured 4.7 GB/s on v5e -- the sweep's entire runtime,
scripts/profile_sweep_parts.py). Interpreter mode runs the identical
kernel logic as pure JAX on CPU, so these tests gate the math -- exact
vs the roll formulation for the k-scale kernel (both are plain f32 FMA
chains over the same operands in the same order), tolerance-level for
the material kernel (coefficients combine before the FMA chain, a
different but still exact-f32 summation order).

Reference parity note: this is the lane-batched analog of the
reference's CSR SpMV hot loop (/root/reference/src/solver.rs:23-37).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magnetite_tpu.pallas.lane_dia_kernel import (
    lane_dia_plan,
    make_lane_dia_matvec,
    make_lane_dia_matvec3,
)

OFFSETS = tuple(sorted({0, 1, -1, 5, -5, 37, -37, 120, -120, 199, -199}))


def _dia_bands(rng, offsets, n, m=2, dtype=np.float32):
    """Random bands honoring the DIA zero contract (entries whose shifted
    index falls outside [0, N) are zero -- fem/dia.assemble_dia)."""
    bands = rng.standard_normal((len(offsets), m, m, n)).astype(dtype)
    for d, off in enumerate(offsets):
        idx = np.arange(n) + off
        bands[d][:, :, (idx < 0) | (idx >= n)] = 0.0
    return bands


def _roll_mv(bands, offsets, u):
    y0 = jnp.zeros_like(u[0])
    y1 = jnp.zeros_like(u[1])
    for d_idx, off in enumerate(offsets):
        s = jnp.roll(u, -off, axis=1) if off != 0 else u
        b = bands[d_idx][:, :, :, None]
        y0 = y0 + b[0, 0] * s[0] + b[0, 1] * s[1]
        y1 = y1 + b[1, 0] * s[0] + b[1, 1] * s[1]
    return jnp.stack([y0, y1])


def test_plan_geometry():
    plan = lane_dia_plan(OFFSETS, 700, 256, jnp.float32)
    assert plan is not None
    assert plan.top == 199
    assert plan.tn >= plan.top + max(OFFSETS)
    assert plan.g * plan.tn >= 700
    assert 256 % plan.tl == 0
    assert plan.d4 % 128 == 0 and plan.d4 >= len(OFFSETS) * 4


def test_plan_rejects_inapplicable():
    # f64 bands stay on the roll path
    assert lane_dia_plan(OFFSETS, 700, 256, jnp.float64) is None
    # tiny lane counts (test batches, sharded shards) stay on rolls
    assert lane_dia_plan(OFFSETS, 700, 64, jnp.float32) is None
    # non-128-multiple lane counts
    assert lane_dia_plan(OFFSETS, 700, 200, jnp.float32) is None
    # band reach beyond the two-block window
    wide = OFFSETS + (600, -600)
    assert lane_dia_plan(wide, 5000, 256, jnp.float32) is None


def test_kscale_kernel_matches_roll_exactly():
    rng = np.random.default_rng(0)
    n, b = 700, 128
    bands = _dia_bands(rng, OFFSETS, n)
    u = rng.standard_normal((2, n, b)).astype(np.float32)
    mv = make_lane_dia_matvec(OFFSETS, n, b, jnp.float32, interpret=True)
    assert mv is not None
    got = np.asarray(mv(jnp.asarray(bands), jnp.asarray(u)))
    ref = np.asarray(_roll_mv(jnp.asarray(bands), OFFSETS, jnp.asarray(u)))
    # same f32 FMA accumulation order over the same operands (bitwise on
    # TPU hardware; CPU XLA may contract mul+add differently per graph)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 1e-6 * scale


def test_kscale_kernel_nonmultiple_tile_sizes():
    """N not a multiple of the node tile; B exercising each lane tile."""
    rng = np.random.default_rng(1)
    offsets = (-3, -1, 0, 1, 3)
    for n, b in ((513, 128), (300, 384), (1025, 256)):
        bands = _dia_bands(rng, offsets, n)
        u = rng.standard_normal((2, n, b)).astype(np.float32)
        mv = make_lane_dia_matvec(
            offsets, n, b, jnp.float32, interpret=True
        )
        assert mv is not None
        got = np.asarray(mv(jnp.asarray(bands), jnp.asarray(u)))
        ref = np.asarray(
            _roll_mv(jnp.asarray(bands), offsets, jnp.asarray(u))
        )
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() <= 1e-6 * scale, (n, b)


def test_material_kernel_matches_weighted_roll():
    rng = np.random.default_rng(2)
    n, b = 700, 128
    bands3 = tuple(_dia_bands(rng, OFFSETS, n) for _ in range(3))
    w3 = tuple(
        rng.uniform(0.5, 2.0, b).astype(np.float32) for _ in range(3)
    )
    u = rng.standard_normal((2, n, b)).astype(np.float32)

    from magnetite_tpu.parallel.sweep import _lane_weighted_band_matvec

    ref = np.asarray(
        _lane_weighted_band_matvec(
            tuple(jnp.asarray(bk) for bk in bands3),
            OFFSETS,
            *(jnp.asarray(w) for w in w3),
            jnp.asarray(u),
        )
    )
    mv3 = make_lane_dia_matvec3(
        OFFSETS, n, b, jnp.float32, interpret=True
    )
    assert mv3 is not None
    got = np.asarray(
        mv3(
            tuple(jnp.asarray(bk) for bk in bands3),
            tuple(jnp.asarray(w) for w in w3),
            jnp.asarray(u),
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 1e-5 * scale


@pytest.mark.parametrize("material", [False, True])
def test_sweep_lane_kernel_end_to_end(metadata, material):
    """compile_unstructured_*sweep(lane_kernel='interpret') reproduces the
    roll path's solve on a real Delaunay mesh at 128 lanes -- the full
    AMG-PCG pipeline with the kernel as its level-0/CG matvec."""
    from tests.conftest import make_rule
    from magnetite_tpu.bc import apply_boundary_conditions
    from magnetite_tpu.config import BoundaryRegion, ModelMetadata
    from magnetite_tpu.meshing.delaunay_backend import triangulate
    from magnetite_tpu.parallel.sweep import (
        compile_unstructured_material_sweep,
        compile_unstructured_sweep,
    )

    outer = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [0.0, 1.0]])
    hole = np.array([[1.3, 0.35], [1.7, 0.35], [1.7, 0.65], [1.3, 0.65]])
    mesh = triangulate([outer, hole], 0.0, 0.08)
    rules = (
        make_rule("left", BoundaryRegion(x_max=1e-6), ux=0.0, uy=0.0),
        make_rule("right", BoundaryRegion(x_min=3.0 - 1e-6), ux=0.01, fy=0.0),
    )
    bca = apply_boundary_conditions(mesh.coords, rules)
    md = ModelMetadata(69e9, 0.33, 0.5, 0.0, 0.08)

    b = 128
    rng = np.random.default_rng(3)
    u_values = np.tile(bca.u_value[None], (b, 1, 1)).astype(np.float32)
    f_values = np.zeros((b, mesh.num_nodes, 2), dtype=np.float32)
    iters = 8

    if material:
        args = (
            u_values,
            f_values,
            rng.uniform(40e9, 250e9, b).astype(np.float32),
            rng.uniform(0.22, 0.38, b).astype(np.float32),
            rng.uniform(0.2, 1.0, b).astype(np.float32),
        )
        roll = compile_unstructured_material_sweep(
            mesh, bca, iterations=iters, refined=False, lane_kernel="off"
        )
        kern = compile_unstructured_material_sweep(
            mesh,
            bca,
            iterations=iters,
            refined=False,
            lane_kernel="interpret",
        )
    else:
        args = (u_values, f_values, rng.uniform(0.5, 2.0, b))
        roll = compile_unstructured_sweep(
            mesh, bca, md, iterations=iters, refined=False,
            lane_kernel="off",
        )
        kern = compile_unstructured_sweep(
            mesh, bca, md, iterations=iters, refined=False,
            lane_kernel="interpret",
        )

    r_roll = roll.solve(*args)
    r_kern = kern.solve(*args)
    scale = np.abs(np.asarray(r_roll.u)).max()
    assert (
        np.abs(np.asarray(r_kern.u) - np.asarray(r_roll.u)).max()
        < 1e-5 * scale
    )
    rel = np.asarray(r_kern.residual_norm) / np.asarray(r_kern.rhs_norm)
    rel_roll = np.asarray(r_roll.residual_norm) / np.asarray(
        r_roll.rhs_norm
    )
    assert rel.max() < max(2.0 * rel_roll.max(), 1e-4)


@pytest.mark.parametrize("material", [False, True])
def test_solve_factors_matches_dense_solve(metadata, material):
    """solve_factors (per-lane load factors, fields built on device) is
    exactly the dense solve() of u_base*factor / f_base*factor batches --
    the parametric API exists to skip the [B, N, 2] host upload, not to
    change semantics."""
    from tests.conftest import make_rule
    from magnetite_tpu.bc import apply_boundary_conditions
    from magnetite_tpu.config import BoundaryRegion, ModelMetadata
    from magnetite_tpu.meshing.delaunay_backend import triangulate
    from magnetite_tpu.parallel.sweep import (
        compile_unstructured_material_sweep,
        compile_unstructured_sweep,
    )

    outer = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [0.0, 1.0]])
    hole = np.array([[1.3, 0.35], [1.7, 0.35], [1.7, 0.65], [1.3, 0.65]])
    mesh = triangulate([outer, hole], 0.0, 0.08)
    rules = (
        make_rule("left", BoundaryRegion(x_max=1e-6), ux=0.0, uy=0.0),
        make_rule("right", BoundaryRegion(x_min=3.0 - 1e-6), ux=0.01, fy=0.0),
    )
    bca = apply_boundary_conditions(mesh.coords, rules)
    md = ModelMetadata(69e9, 0.33, 0.5, 0.0, 0.08)

    b = 8
    rng = np.random.default_rng(4)
    u_factors = rng.uniform(0.5, 2.0, b).astype(np.float32)
    f_factors = np.ones(b, dtype=np.float32)
    # f32 base x f32 factor, matching the device-side product's rounding
    u_values = bca.u_value.astype(np.float32)[None] * u_factors[:, None, None]
    f_values = bca.f_value.astype(np.float32)[None] * f_factors[:, None, None]

    if material:
        ex = (
            rng.uniform(40e9, 250e9, b).astype(np.float32),
            rng.uniform(0.22, 0.38, b).astype(np.float32),
            rng.uniform(0.2, 1.0, b).astype(np.float32),
        )
        compiled = compile_unstructured_material_sweep(
            mesh, bca, iterations=8, refined=False
        )
    else:
        ex = (rng.uniform(0.5, 2.0, b),)
        compiled = compile_unstructured_sweep(
            mesh, bca, md, iterations=8, refined=False
        )

    dense = compiled.solve(u_values, f_values, *ex)
    fact = compiled.solve_factors(u_factors, f_factors, *ex)
    # identical math; the two jits may fuse/contract FMAs differently
    su = np.abs(np.asarray(dense.u)).max()
    sv = np.abs(np.asarray(dense.von_mises)).max()
    assert np.abs(np.asarray(fact.u) - np.asarray(dense.u)).max() < 1e-5 * su
    assert (
        np.abs(np.asarray(fact.von_mises) - np.asarray(dense.von_mises)).max()
        < 1e-5 * sv
    )
