"""Hybrid DIA+remainder operator tests."""

import jax.numpy as jnp
import numpy as np

from magnetite_tpu import oracle
from magnetite_tpu.config import SolverOptions
from magnetite_tpu.fem.dia import (
    assemble_hybrid,
    build_hybrid_structure,
    hybrid_matvec,
)
from magnetite_tpu.fem.element import element_stiffness_matrices
from magnetite_tpu.fem.solve import solve_system
from magnetite_tpu.meshing.generators import rect_mesh, tensile_bcs_for_rect


def _scramble(mesh, seed=0):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(mesh.num_nodes)
    inv = np.argsort(perm)
    return (
        type(mesh)(coords=mesh.coords[perm], tris=inv[mesh.tris].astype(np.int32)),
        perm,
    )


def test_hybrid_matvec_matches_oracle(metadata):
    mesh, _ = _scramble(rect_mesh(8, 8))
    n = mesh.num_nodes
    hyb = build_hybrid_structure(mesh.tris, n, max_diags=12)
    assert hyb.n_rem > 0  # scrambled mesh must exercise the remainder
    ke = element_stiffness_matrices(
        jnp.asarray(mesh.coords),
        jnp.asarray(mesh.tris),
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    bands, rem = assemble_hybrid(ke, hyb.slot_ids, n, hyb.n_diags, hyb.n_rem)
    k = oracle.global_stiffness(
        mesh.coords, mesh.tris,
        metadata.youngs_modulus, metadata.poisson_ratio,
        metadata.part_thickness,
    )
    rng = np.random.default_rng(1)
    u = rng.standard_normal((n, 2))
    y = np.asarray(
        hybrid_matvec(
            bands,
            tuple(int(o) for o in hyb.offsets),
            rem,
            jnp.asarray(hyb.rem_rows),
            jnp.asarray(hyb.rem_cols),
            jnp.asarray(u.T),
        )
    ).T
    y_ref = (k @ u.reshape(-1)).reshape(-1, 2)
    np.testing.assert_allclose(y, y_ref, rtol=1e-10, atol=1e-3)


def test_hybrid_zero_remainder_matches_dia(metadata):
    """On a structured mesh with generous max_diags the remainder is empty."""
    mesh = rect_mesh(6, 6)
    hyb = build_hybrid_structure(mesh.tris, mesh.num_nodes, max_diags=16)
    assert hyb.n_rem == 0
    assert hyb.n_diags == 7


def test_solve_hybrid_matches_oracle(metadata):
    mesh, perm = _scramble(rect_mesh(9, 6, width=2.0), seed=3)
    coords = mesh.coords
    n = mesh.num_nodes
    from magnetite_tpu.bc import BCArrays

    u_known = np.zeros((n, 2), dtype=bool)
    u_value = np.zeros((n, 2))
    left = np.isclose(coords[:, 0], 0.0)
    right = np.isclose(coords[:, 0], 2.0)
    u_known[left] = True
    u_known[right, 0] = True
    u_value[right, 0] = 0.01
    bca = BCArrays(u_known, u_value, np.zeros((n, 2)))

    result = solve_system(
        mesh, bca, metadata, SolverOptions(operator="hybrid", max_diags=12)
    )
    assert result.timings["operator"] == "hybrid"
    u_ref, _, _ = oracle.solve(mesh.coords, mesh.tris, bca, metadata)
    scale = np.abs(u_ref).max()
    np.testing.assert_allclose(result.u, u_ref, rtol=1e-7, atol=1e-9 * scale)


def test_auto_prefers_hybrid_over_ell(metadata):
    mesh, _ = _scramble(rect_mesh(10, 10), seed=5)
    bca = tensile_bcs_for_rect(mesh.coords)  # works on scrambled coords too
    result = solve_system(
        mesh, bca, metadata, SolverOptions(max_diags=12, renumber="off")
    )
    assert result.timings["operator"] == "hybrid"


def test_delaunay_mesher_emits_band_friendly_order(metadata):
    """Built-in mesher output should be DIA/hybrid friendly: the dominant
    offsets cover most couplings."""
    from magnetite_tpu.fem.dia import build_hybrid_structure
    from magnetite_tpu.geometry.svg import parse_svg
    from magnetite_tpu.meshing.delaunay_backend import triangulate

    loops = parse_svg(
        "/root/reference/examples/linkedin-logo/linkedin.svg",
        10.0,
        log=lambda m: None,
    )
    mesh = triangulate(loops, 10.0, 20.0)
    hyb = build_hybrid_structure(mesh.tris, mesh.num_nodes, max_diags=48)
    total_blocks = 9 * mesh.num_elements
    # remainder blocks should be a small fraction of all couplings
    assert hyb.n_rem < 0.15 * total_blocks
