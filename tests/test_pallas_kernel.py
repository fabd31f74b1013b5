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


# ============================ DIA band kernel ================================


def _random_dia(n, offsets, seed=0, dtype=np.float32):
    """Random bands zeroed wherever row + offset falls outside [0, n) --
    the operator contract dia_matvec's wrapping rolls rely on."""
    rng = np.random.default_rng(seed)
    d = len(offsets)
    bands = rng.standard_normal((d, 2, 2, n)).astype(dtype)
    rows = np.arange(n)
    for k, off in enumerate(offsets):
        bad = (rows + off < 0) | (rows + off >= n)
        bands[k, :, :, bad] = 0.0
    return jnp.asarray(bands)


@pytest.mark.parametrize(
    "n,offsets",
    [
        # small offsets only (single-row reach)
        (9000, (-3, -1, 0, 1, 3)),
        # band reach across several 512-lane rows + exact row multiples
        (9000, (-1300, -1024, -512, -37, 0, 37, 512, 1024, 1300)),
        # n an exact lane multiple (no flat tail padding)
        (8192, (-513, -512, -511, 0, 511, 512, 513)),
        # annulus-style huge wrap offsets (ring connectivity)
        (8192, (-8000, -1, 0, 1, 8000)),
    ],
)
def test_pallas_dia_matches_xla_interpret(n, offsets):
    from magnetite_tpu.fem.dia import dia_matvec
    from magnetite_tpu.pallas.dia_kernel import (
        dia_pallas_applicable,
        make_pallas_dia_operator,
    )

    assert dia_pallas_applicable(offsets, n)
    bands = _random_dia(n, offsets)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    y_ref = np.asarray(dia_matvec(bands, offsets, u))
    op = make_pallas_dia_operator(bands, offsets, interpret=True)
    y_pal = np.asarray(op(u))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-5, atol=1e-5 * scale)


def test_pallas_dia_matches_real_mesh_operator(metadata):
    """End-to-end parity on a real renumbered Delaunay mesh's DIA bands."""
    from magnetite_tpu.fem.dia import build_dia_structure, dia_matvec
    from magnetite_tpu.fem.element import element_stiffness_matrices
    from magnetite_tpu.fem.dia import assemble_dia
    from magnetite_tpu.meshing.delaunay_backend import triangulate
    from magnetite_tpu.pallas.dia_kernel import (
        dia_pallas_applicable,
        make_pallas_dia_operator,
    )

    outer = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [0.0, 1.0]])
    mesh = triangulate([outer], 0.0, 0.02)
    n = mesh.num_nodes
    s = build_dia_structure(mesh.tris, n)
    ke = element_stiffness_matrices(
        jnp.asarray(mesh.coords, jnp.float32),
        jnp.asarray(mesh.tris),
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    bands = assemble_dia(ke, s.slot_ids, n, s.n_diags).astype(jnp.float32)
    offsets = tuple(int(o) for o in s.offsets)
    assert dia_pallas_applicable(offsets, n)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    y_ref = np.asarray(dia_matvec(bands, offsets, u))
    op = make_pallas_dia_operator(bands, offsets, interpret=True)
    y_pal = np.asarray(op(u))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-5, atol=1e-5 * scale)


def _random_dia_m(n, offsets, m, seed=0):
    rng = np.random.default_rng(seed)
    bands = rng.standard_normal((len(offsets), m, m, n)).astype(np.float32)
    rows = np.arange(n)
    for k, off in enumerate(offsets):
        bad = (rows + off < 0) | (rows + off >= n)
        bands[k, :, :, bad] = 0.0
    return jnp.asarray(bands)


def test_pallas_dia_m3_matches_xla_interpret():
    """3x3 blocks: the coarse AMG level layout (3 near-nullspace modes)."""
    from magnetite_tpu.fem.dia import dia_matvec_blocks
    from magnetite_tpu.pallas.dia_kernel import (
        dia_pallas_applicable,
        make_pallas_dia_operator,
    )

    n, offsets = 9000, (-1210, -601, -1, 0, 1, 601, 1210)
    assert dia_pallas_applicable(offsets, n, m=3)
    bands = _random_dia_m(n, offsets, 3)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    y_ref = np.asarray(dia_matvec_blocks(bands, offsets, u))
    op = make_pallas_dia_operator(bands, offsets, interpret=True)
    y_pal = np.asarray(op(u))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-5, atol=1e-5 * scale)


def test_pallas_dia_chunked_matches(monkeypatch):
    """A VMEM budget too small for all bands in one tile forces the
    chunked accumulation path; parity must hold across chunk seams."""
    import magnetite_tpu.pallas.dia_kernel as dk
    from magnetite_tpu.fem.dia import dia_matvec_blocks

    n = 9000
    offsets = tuple(range(-6, 7))  # 13 bands
    bands = _random_dia_m(n, offsets, 2, seed=3)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    y_ref = np.asarray(dia_matvec_blocks(bands, offsets, u))

    # budget: u field + out + ~4 bands double-buffered at tr=8
    ub = dk._u_bytes(offsets, n, 2)
    small = ub + 2 * 8 * 512 * 4 * 2 + 4 * (2 * 2 * 8 * 512 * 4 * 2)
    monkeypatch.setattr(dk, "_VMEM_BUDGET", small)
    tr, per_chunk = dk._chunk_layout(len(offsets), 2, ub)
    assert per_chunk < len(offsets)  # chunking actually engaged
    op = dk.make_pallas_dia_operator(bands, offsets, interpret=True)
    y_pal = np.asarray(op(u))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-5, atol=1e-5 * scale)


def test_df_dia_kernel_f64_grade_accuracy(metadata):
    """The double-float kernel must track the true f64 matvec to
    ~2^-46 of the term-magnitude scale on a REAL operator with a SMOOTH
    field (the worst case: |Ku| << sum|K||u| cancellation), where plain
    f32 sits at ~2^-24."""
    from magnetite_tpu.fem.dia import (
        assemble_dia,
        build_dia_structure,
        dia_matvec,
    )
    from magnetite_tpu.fem.element import element_stiffness_matrices
    from magnetite_tpu.meshing.delaunay_backend import triangulate
    from magnetite_tpu.pallas.dia_kernel import (
        df_dia_pallas_applicable,
        make_df_dia_operator,
    )

    outer = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [0.0, 1.0]])
    mesh = triangulate([outer], 0.0, 0.02)
    n = mesh.num_nodes
    s = build_dia_structure(mesh.tris, n)
    ke = element_stiffness_matrices(
        jnp.asarray(mesh.coords, jnp.float64),
        jnp.asarray(mesh.tris),
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    bands = assemble_dia(ke, s.slot_ids, n, s.n_diags).astype(jnp.float64)
    offsets = tuple(int(o) for o in s.offsets)
    assert df_dia_pallas_applicable(offsets, n)

    x, y = mesh.coords[:, 0], mesh.coords[:, 1]
    u = jnp.asarray(
        np.stack([0.01 * np.sin(x) * np.cosh(y), 0.005 * np.cos(x) * y**2])
    )
    y64 = np.asarray(dia_matvec(bands, offsets, u))
    op = make_df_dia_operator(bands, offsets, interpret=True)
    ydf = np.asarray(op(u))

    nb = np.asarray(bands)
    scale = np.zeros((2, n))
    for d_idx, off in enumerate(offsets):
        sh = np.abs(np.roll(np.asarray(u), -off, axis=1))
        for i in range(2):
            for j in range(2):
                scale[i] += np.abs(nb[d_idx, i, j]) * sh[j]
    err = np.abs(ydf - y64).max() / scale.max()
    assert err < 1e-13, err  # measured ~1.3e-14; plain f32 is ~5.6e-8

    # random field too (no cancellation; checks the plumbing broadly)
    rng = np.random.default_rng(7)
    ur = jnp.asarray(rng.standard_normal((2, n)))
    yr = np.asarray(dia_matvec(bands, offsets, ur))
    ydfr = np.asarray(op(ur))
    np.testing.assert_allclose(ydfr, yr, rtol=1e-10, atol=1e-12 * np.abs(yr).max())


def test_dia_pallas_applicable_rules():
    from magnetite_tpu.pallas.dia_kernel import dia_pallas_applicable

    assert dia_pallas_applicable((-1, 0, 1), 500_000)
    assert not dia_pallas_applicable((-1, 0, 1), 500_000, jnp.float64)
    assert not dia_pallas_applicable((0,), 1000)  # too small to tile
    # unbounded band reach (band-hostile ordering) is rejected
    assert not dia_pallas_applicable((0, 400_000), 500_000)
