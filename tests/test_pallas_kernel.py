"""Pallas stencil-kernel tests (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from magnetite_tpu.fem.element import element_stiffness_matrices
from magnetite_tpu.fem.stencil import (
    assemble_stencil,
    build_stencil_structure,
    stencil_matvec_xla,
)
from magnetite_tpu.pallas.stencil_kernel import (
    pallas_applicable,
    stencil_matvec_pallas,
)
from magnetite_tpu.meshing.generators import plate_with_hole_mesh, rect_mesh


def _stencil(mesh, metadata, dtype=np.float32):
    rows, cols = mesh.grid_shape
    st = build_stencil_structure(mesh.tris, rows, cols, mesh.wrap_cols)
    ke = element_stiffness_matrices(
        jnp.asarray(mesh.coords, dtype),
        jnp.asarray(mesh.tris),
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    return assemble_stencil(ke, st.slot_ids, rows, cols)


@pytest.mark.parametrize(
    "mesh_fn,wrap",
    [
        (lambda: plate_with_hole_mesh(24, 128), True),
        (lambda: rect_mesh(31, 127), False),  # rows not multiple of tile
    ],
)
def test_pallas_matches_xla_interpret(metadata, mesh_fn, wrap):
    mesh = mesh_fn()
    stencil = _stencil(mesh, metadata).astype(jnp.float32)
    rows, cols = mesh.grid_shape
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((2, rows, cols)), jnp.float32)
    y_ref = np.asarray(stencil_matvec_xla(stencil, u, wrap))
    y_pal = np.asarray(
        stencil_matvec_pallas(stencil, u, wrap, interpret=True)
    )
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-5, atol=1e-5 * scale)


def test_pallas_applicable_rules():
    from magnetite_tpu.pallas.stencil_kernel import _resident_applicable

    assert pallas_applicable(513, 1024)
    assert not pallas_applicable(513, 1000)  # cols not lane-aligned
    assert not pallas_applicable(8, 128)  # too few rows
    assert not pallas_applicable(513, 1024, jnp.float64)
    # u exceeding VMEM residency now routes to the blocked kernel
    assert pallas_applicable(4096, 4096)
    assert not _resident_applicable(4096, 4096)
    assert _resident_applicable(513, 1024)


@pytest.mark.parametrize(
    "mesh_fn,wrap",
    [
        (lambda: plate_with_hole_mesh(24, 128), True),
        (lambda: rect_mesh(31, 127), False),
    ],
)
def test_blocked_kernel_matches_xla_interpret(metadata, mesh_fn, wrap):
    """Row-blocked variant (no u residency limit) == XLA reference."""
    from magnetite_tpu.pallas.stencil_kernel import (
        _matvec_blocked,
        _pick_row_tile_blocked,
        pretile_stencil,
    )

    mesh = mesh_fn()
    stencil = _stencil(mesh, metadata).astype(jnp.float32)
    rows, cols = mesh.grid_shape
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((2, rows, cols)), jnp.float32)
    y_ref = np.asarray(stencil_matvec_xla(stencil, u, wrap))
    tr = _pick_row_tile_blocked(cols)
    y_blk = np.asarray(
        _matvec_blocked(
            pretile_stencil(stencil, tr), u, rows, wrap, interpret=True
        )
    )
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_blk, y_ref, rtol=2e-5, atol=1e-5 * scale)
