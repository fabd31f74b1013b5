"""Unit tests for the batched CST element kernels.

Hand-computed values follow the derivation the reference documents in
under-the-hood.md:541-606 (area, B, D, ke = B^T D B A t).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from magnetite_tpu.fem.element import (
    element_areas,
    element_stiffness_matrices,
    gather_element_coords,
    strain_displacement_matrices,
    stress_strain_matrix,
)
from magnetite_tpu import oracle


def test_area_unit_right_triangle(unit_triangle_mesh):
    ec = gather_element_coords(
        jnp.asarray(unit_triangle_mesh.coords), jnp.asarray(unit_triangle_mesh.tris)
    )
    areas = element_areas(ec)
    np.testing.assert_allclose(np.asarray(areas), [0.5], rtol=1e-15)


def test_area_sign_flips_for_cw():
    coords = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    tris_ccw = jnp.array([[0, 1, 2]])
    tris_cw = jnp.array([[0, 2, 1]])
    a_ccw = element_areas(gather_element_coords(coords, tris_ccw))
    a_cw = element_areas(gather_element_coords(coords, tris_cw))
    assert float(a_ccw[0]) == pytest.approx(0.5)
    assert float(a_cw[0]) == pytest.approx(-0.5)


def test_b_matrix_hand_computed(unit_triangle_mesh):
    """For vertices (0,0),(1,0),(0,1):
    beta  = (y1-y2, y2-y0, y0-y1) = (-1, 1, 0)
    gamma = (x2-x1, x0-x2, x1-x0) = (-1, 0, 1)
    B = 1/(2A) * [[b0,0,b1,0,b2,0],[0,g0,0,g1,0,g2],[g0,b0,g1,b1,g2,b2]]
    """
    ec = gather_element_coords(
        jnp.asarray(unit_triangle_mesh.coords), jnp.asarray(unit_triangle_mesh.tris)
    )
    areas = element_areas(ec)
    b = strain_displacement_matrices(ec, areas)
    expected = np.array(
        [
            [-1.0, 0.0, 1.0, 0.0, 0.0, 0.0],
            [0.0, -1.0, 0.0, 0.0, 0.0, 1.0],
            [-1.0, -1.0, 0.0, 1.0, 1.0, 0.0],
        ]
    )  # already /(2A) with A=0.5 -> /1
    np.testing.assert_allclose(np.asarray(b[0]), expected, atol=1e-15)


def test_d_matrix_matches_formula():
    e, nu = 69e9, 0.33
    d = np.asarray(stress_strain_matrix(e, nu))
    factor = e / (1 - nu**2)
    expected = factor * np.array(
        [[1, nu, 0], [nu, 1, 0], [0, 0, (1 - nu) / 2]]
    )
    np.testing.assert_allclose(d, expected, rtol=1e-12)


def test_element_stiffness_matches_oracle(two_triangle_mesh, metadata):
    ke = element_stiffness_matrices(
        jnp.asarray(two_triangle_mesh.coords),
        jnp.asarray(two_triangle_mesh.tris),
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    d = oracle.d_matrix(metadata.youngs_modulus, metadata.poisson_ratio)
    for i, tri in enumerate(two_triangle_mesh.tris):
        p = two_triangle_mesh.coords[tri]
        area = oracle.element_area(p)
        b = oracle.b_matrix(p, area)
        expected = b.T @ d @ b * area * metadata.part_thickness
        np.testing.assert_allclose(np.asarray(ke[i]), expected, rtol=1e-12)


def test_element_stiffness_symmetric_psd(two_triangle_mesh, metadata):
    ke = np.asarray(
        element_stiffness_matrices(
            jnp.asarray(two_triangle_mesh.coords),
            jnp.asarray(two_triangle_mesh.tris),
            metadata.youngs_modulus,
            metadata.poisson_ratio,
            metadata.part_thickness,
        )
    )
    for k in ke:
        np.testing.assert_allclose(k, k.T, rtol=1e-10)
        eigs = np.linalg.eigvalsh(k)
        # CST has exactly 3 zero-energy (rigid body) modes in 2D
        assert (eigs > -1e-3 * eigs.max()).all()
        assert (np.abs(eigs) < 1e-6 * eigs.max()).sum() == 3


def test_rigid_body_motion_zero_force(two_triangle_mesh, metadata):
    """K @ u = 0 for translations and infinitesimal rotation."""
    ke = np.asarray(
        element_stiffness_matrices(
            jnp.asarray(two_triangle_mesh.coords),
            jnp.asarray(two_triangle_mesh.tris),
            metadata.youngs_modulus,
            metadata.poisson_ratio,
            metadata.part_thickness,
        )
    )
    coords = two_triangle_mesh.coords
    for i, tri in enumerate(two_triangle_mesh.tris):
        p = coords[tri]
        scale = np.abs(ke[i]).max()
        # translation x, translation y
        for t in (np.array([1.0, 0.0]), np.array([0.0, 1.0])):
            u = np.tile(t, 3)
            np.testing.assert_allclose(ke[i] @ u / scale, 0.0, atol=1e-12)
        # infinitesimal rotation: u = theta * (-y, x)
        u = np.stack([-p[:, 1], p[:, 0]], axis=-1).reshape(-1)
        np.testing.assert_allclose(ke[i] @ u / scale, 0.0, atol=1e-12)


def test_patch_test_constant_strain(metadata):
    """A linear displacement field must produce exactly constant stress on
    every element (the CST patch test)."""
    from magnetite_tpu.meshing.generators import rect_mesh
    from magnetite_tpu.fem.stress import element_stress_tensors

    mesh = rect_mesh(3, 3)
    # u = [a*x + b*y, c*x + d*y] -> eps = [a, d, b+c]
    a, b, c, d = 1e-3, 2e-3, -5e-4, 3e-4
    u = np.stack(
        [
            a * mesh.coords[:, 0] + b * mesh.coords[:, 1],
            c * mesh.coords[:, 0] + d * mesh.coords[:, 1],
        ],
        axis=-1,
    )
    sigma = np.asarray(
        element_stress_tensors(
            jnp.asarray(mesh.coords),
            jnp.asarray(mesh.tris),
            jnp.asarray(u),
            metadata.youngs_modulus,
            metadata.poisson_ratio,
        )
    )
    dmat = oracle.d_matrix(metadata.youngs_modulus, metadata.poisson_ratio)
    expected = dmat @ np.array([a, d, b + c])
    np.testing.assert_allclose(sigma, np.tile(expected, (sigma.shape[0], 1)), rtol=1e-9)
