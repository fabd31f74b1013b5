"""Tests for block-ELL structure building and device assembly."""

import jax.numpy as jnp
import numpy as np

from magnetite_tpu import oracle
from magnetite_tpu.fem.assembly import (
    assemble_dense,
    assemble_ell,
    build_ell_structure,
    ell_to_dense,
    extract_block_diagonal,
)
from magnetite_tpu.fem.element import element_stiffness_matrices
from magnetite_tpu.fem.operator import ell_matvec
from magnetite_tpu.meshing.generators import rect_mesh


def _ke(mesh, metadata):
    return element_stiffness_matrices(
        jnp.asarray(mesh.coords),
        jnp.asarray(mesh.tris),
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )


def test_structure_shapes(two_triangle_mesh):
    s = build_ell_structure(two_triangle_mesh.tris, two_triangle_mesh.num_nodes)
    assert s.cols.shape[0] == 4
    assert s.slot_ids.shape == (2 * 9,)
    # square split in two: diagonal nodes couple to all 4, others to 3
    assert s.width == 4


def test_ell_matches_dense_and_oracle(two_triangle_mesh, metadata):
    mesh = two_triangle_mesh
    ke = _ke(mesh, metadata)
    s = build_ell_structure(mesh.tris, mesh.num_nodes)
    ell = assemble_ell(ke, s)
    k_ell = np.asarray(ell_to_dense(ell, jnp.asarray(s.cols)))
    k_dense = np.asarray(assemble_dense(ke, jnp.asarray(mesh.tris), mesh.num_nodes))
    k_oracle = oracle.global_stiffness(
        mesh.coords,
        mesh.tris,
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    np.testing.assert_allclose(k_ell, k_dense, rtol=1e-12)
    np.testing.assert_allclose(k_ell, k_oracle, rtol=1e-12)


def test_ell_matches_oracle_rect_mesh(metadata):
    mesh = rect_mesh(4, 3, width=2.0, height=1.5)
    ke = _ke(mesh, metadata)
    s = build_ell_structure(mesh.tris, mesh.num_nodes)
    ell = assemble_ell(ke, s)
    k_ell = np.asarray(ell_to_dense(ell, jnp.asarray(s.cols)))
    k_oracle = oracle.global_stiffness(
        mesh.coords,
        mesh.tris,
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    np.testing.assert_allclose(k_ell, k_oracle, rtol=1e-10, atol=1e-2)


def test_spmv_matches_dense(metadata):
    mesh = rect_mesh(5, 4)
    ke = _ke(mesh, metadata)
    s = build_ell_structure(mesh.tris, mesh.num_nodes)
    ell = assemble_ell(ke, s)
    k = np.asarray(ell_to_dense(ell, jnp.asarray(s.cols)))
    rng = np.random.default_rng(0)
    u = rng.standard_normal((mesh.num_nodes, 2))
    y_ell = np.asarray(ell_matvec(ell, jnp.asarray(s.cols), jnp.asarray(u)))
    y_dense = (k @ u.reshape(-1)).reshape(-1, 2)
    np.testing.assert_allclose(y_ell, y_dense, rtol=1e-10, atol=1e-6)


def test_block_diagonal_extraction(metadata):
    mesh = rect_mesh(3, 3)
    ke = _ke(mesh, metadata)
    s = build_ell_structure(mesh.tris, mesh.num_nodes)
    ell = assemble_ell(ke, s)
    diag = np.asarray(extract_block_diagonal(ell, jnp.asarray(s.cols)))
    k = np.asarray(ell_to_dense(ell, jnp.asarray(s.cols)))
    for n in range(mesh.num_nodes):
        np.testing.assert_allclose(
            diag[n], k[2 * n : 2 * n + 2, 2 * n : 2 * n + 2], rtol=1e-12
        )


def test_assembled_matrix_symmetric(metadata):
    mesh = rect_mesh(6, 5)
    ke = _ke(mesh, metadata)
    s = build_ell_structure(mesh.tris, mesh.num_nodes)
    ell = assemble_ell(ke, s)
    k = np.asarray(ell_to_dense(ell, jnp.asarray(s.cols)))
    np.testing.assert_allclose(k, k.T, rtol=1e-10, atol=1e-3)
