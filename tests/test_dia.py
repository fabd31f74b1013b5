"""DIA band-operator tests: structure, SpMV vs dense, solve parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from magnetite_tpu import oracle
from magnetite_tpu.config import SolverOptions
from magnetite_tpu.errors import SolverError
from magnetite_tpu.fem.dia import (
    assemble_dia,
    build_dia_structure,
    dia_matvec,
)
from magnetite_tpu.fem.element import element_stiffness_matrices
from magnetite_tpu.fem.solve import solve_system
from magnetite_tpu.meshing.generators import (
    plate_with_hole_mesh,
    rect_mesh,
    tensile_bcs_for_rect,
)


def _dia_dense(mesh, metadata):
    """Assemble DIA bands and expand to dense for comparison."""
    n = mesh.num_nodes
    s = build_dia_structure(mesh.tris, n)
    assert s is not None
    ke = element_stiffness_matrices(
        jnp.asarray(mesh.coords),
        jnp.asarray(mesh.tris),
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    bands = assemble_dia(ke, s.slot_ids, n, s.n_diags)
    return s, np.asarray(bands)


def test_rect_mesh_has_stencil_offsets(metadata):
    mesh = rect_mesh(10, 6)
    s = build_dia_structure(mesh.tris, mesh.num_nodes)
    # structured rect grid: 7-point stencil {0,±1,±(nx+1),±(nx+2)}
    assert s.n_diags == 7
    assert set(s.offsets.tolist()) == {-12, -11, -1, 0, 1, 11, 12}


def test_plate_with_hole_offsets_bounded():
    mesh = plate_with_hole_mesh(16, 32)
    s = build_dia_structure(mesh.tris, mesh.num_nodes)
    assert s is not None
    assert s.n_diags <= 16  # stencil + ring-wrap offsets


def test_dia_matvec_matches_oracle_dense(metadata):
    mesh = rect_mesh(7, 5, width=2.0, height=1.3)
    s, bands = _dia_dense(mesh, metadata)
    k = oracle.global_stiffness(
        mesh.coords,
        mesh.tris,
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    rng = np.random.default_rng(0)
    u = rng.standard_normal((mesh.num_nodes, 2))
    y_dia = np.asarray(
        dia_matvec(
            jnp.asarray(bands),
            tuple(int(o) for o in s.offsets),
            jnp.asarray(u.T),
        )
    ).T
    y_ref = (k @ u.reshape(-1)).reshape(-1, 2)
    np.testing.assert_allclose(y_dia, y_ref, rtol=1e-10, atol=1e-4)


def test_dia_matvec_annulus_ring_wrap(metadata):
    """Ring-wrap connectivity must be exact (its own offsets, not aliasing)."""
    mesh = plate_with_hole_mesh(6, 12)
    s = build_dia_structure(mesh.tris, mesh.num_nodes)
    ke = element_stiffness_matrices(
        jnp.asarray(mesh.coords),
        jnp.asarray(mesh.tris),
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    bands = assemble_dia(ke, s.slot_ids, mesh.num_nodes, s.n_diags)
    k = oracle.global_stiffness(
        mesh.coords,
        mesh.tris,
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    rng = np.random.default_rng(1)
    u = rng.standard_normal((mesh.num_nodes, 2))
    y_dia = np.asarray(
        dia_matvec(bands, tuple(int(o) for o in s.offsets), jnp.asarray(u.T))
    ).T
    y_ref = (k @ u.reshape(-1)).reshape(-1, 2)
    np.testing.assert_allclose(y_dia, y_ref, rtol=1e-10, atol=1e-3)


def test_solve_dia_matches_oracle(metadata):
    mesh = rect_mesh(9, 5, width=3.0)
    bca = tensile_bcs_for_rect(mesh.coords, pull=0.01)
    result = solve_system(
        mesh, bca, metadata, SolverOptions(operator="dia")
    )
    assert result.timings["operator"] == "dia"
    u_ref, _, sigma_ref = oracle.solve(mesh.coords, mesh.tris, bca, metadata)
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(result.u, u_ref, rtol=1e-7, atol=1e-9 * scale)


def test_solve_auto_picks_stencil_then_dia(metadata):
    mesh = rect_mesh(6, 6)
    bca = tensile_bcs_for_rect(mesh.coords)
    result = solve_system(mesh, bca, metadata, SolverOptions())
    # grid metadata present -> stencil operator wins
    assert result.timings["operator"] == "stencil"
    # strip the grid metadata -> DIA (flat band) operator
    stripped = type(mesh)(coords=mesh.coords, tris=mesh.tris)
    result2 = solve_system(stripped, bca, metadata, SolverOptions())
    assert result2.timings["operator"] == "dia"
    np.testing.assert_allclose(result.u, result2.u, rtol=1e-6, atol=1e-12)


def test_solve_dia_unavailable_raises(metadata):
    """A scrambled numbering blows past max_diags; forcing DIA errors,
    auto falls back to ELL with identical results."""
    mesh = rect_mesh(8, 8)
    rng = np.random.default_rng(3)
    perm = rng.permutation(mesh.num_nodes)
    inv = np.argsort(perm)
    scrambled = type(mesh)(
        coords=mesh.coords[perm], tris=inv[mesh.tris].astype(np.int32)
    )
    bca = tensile_bcs_for_rect(scrambled.coords)
    with pytest.raises(SolverError, match="bands"):
        solve_system(
            scrambled, bca, metadata, SolverOptions(operator="dia", max_diags=16, renumber="off")
        )
    # auto falls through to the hybrid band+remainder operator...
    auto = solve_system(
        scrambled, bca, metadata, SolverOptions(max_diags=16, renumber="off")
    )
    assert auto.timings["operator"] == "hybrid"
    # ...and plain gather-ELL stays available explicitly
    result = solve_system(
        scrambled, bca, metadata, SolverOptions(operator="ell", max_diags=16, renumber="off")
    )
    assert result.timings["operator"] == "ell"
    np.testing.assert_allclose(
        auto.u, result.u, rtol=1e-7, atol=1e-11 * np.abs(result.u).max()
    )
    ref = solve_system(mesh, tensile_bcs_for_rect(mesh.coords), metadata)
    np.testing.assert_allclose(
        result.u, ref.u[perm], rtol=1e-7, atol=1e-9 * np.abs(ref.u).max()
    )
