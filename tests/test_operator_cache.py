"""Assembled-operator checkpoint (persist.save_operator/load_operator).

The reference re-assembles the dense global stiffness matrix on every run
(/root/reference/src/solver.rs:290-331) and deletes every intermediate
artifact. The rebuild persists the compile-time assembly product keyed by
the input-mesh hash + material so a resumed compile skips structure build,
renumbering, and the host C++ assembly entirely.
"""

import numpy as np
import pytest

from magnetite_tpu.bc import apply_boundary_conditions
from magnetite_tpu.config import (
    BoundaryRegion,
    ModelMetadata,
    SolverOptions,
)
from magnetite_tpu.errors import InputError
from magnetite_tpu.fem.solve import compile_problem
from magnetite_tpu.meshing.delaunay_backend import triangulate
from magnetite_tpu.persist import load_operator, save_operator
from tests.conftest import make_rule

E, NU, T = 69e9, 0.33, 0.5
MD = ModelMetadata(E, NU, T, 0.0, 0.06)
# keep_operator_host: save_operator needs the host copy (default is off
# so long-lived problems don't pin ~650 MB at 1M elements)
OPTS = SolverOptions(dtype="float64", cg_rtol=1e-10, keep_operator_host=True)


@pytest.fixture(scope="module")
def plate():
    outer = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [0.0, 1.0]])
    return triangulate([outer], 0.0, 0.06)


def _rules():
    return (
        make_rule("left", BoundaryRegion(x_max=1e-6), ux=0.0, uy=0.0),
        make_rule("right", BoundaryRegion(x_min=3.0 - 1e-6), ux=0.01, fy=0.0),
    )


def test_roundtrip_skips_assembly_and_matches(plate, tmp_path):
    bca = apply_boundary_conditions(plate.coords, _rules())
    fresh = compile_problem(plate, bca, MD, OPTS)
    assert fresh.mode in ("dia", "hybrid", "ell")
    assert fresh.operator_host is not None

    path = str(tmp_path / "case.op.npz")
    save_operator(path, fresh)
    cache = load_operator(path)
    assert cache.mode == fresh.mode
    assert cache.mesh_hash == fresh.operator_host.mesh_hash

    resumed = compile_problem(plate, bca, MD, OPTS, operator_cache=cache)
    assert resumed.timings.get("operator_cache") == "hit"
    assert resumed.mode == fresh.mode

    r_fresh, r_res = fresh.solve(), resumed.solve()
    np.testing.assert_allclose(r_res.u, r_fresh.u, rtol=0, atol=1e-12)
    np.testing.assert_allclose(r_res.stress, r_fresh.stress, rtol=1e-12)


def test_material_mismatch_is_ignored_with_rebuild(plate, tmp_path):
    bca = apply_boundary_conditions(plate.coords, _rules())
    fresh = compile_problem(plate, bca, MD, OPTS)
    path = str(tmp_path / "case.op.npz")
    save_operator(path, fresh)
    cache = load_operator(path)

    other_md = ModelMetadata(2 * E, NU, T, 0.0, 0.06)
    resumed = compile_problem(plate, bca, other_md, OPTS, operator_cache=cache)
    assert resumed.timings.get("operator_cache") == "miss"
    # a rebuilt operator must still solve the new-material problem correctly
    ref = compile_problem(plate, bca, other_md, OPTS)
    np.testing.assert_allclose(resumed.solve().u, ref.solve().u, atol=1e-12)


def test_renumbered_mesh_roundtrip_preserves_order(plate, tmp_path):
    """A shuffled mesh renumbers at compile; the cache stores the perm and
    a resumed compile reapplies it, reporting results in input order."""
    from magnetite_tpu.meshing.core import Mesh

    rng = np.random.default_rng(7)
    perm = rng.permutation(plate.num_nodes)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    shuffled = Mesh(
        coords=plate.coords[perm],
        tris=inv[plate.tris.astype(np.int64)].astype(np.int32),
    )
    bca = apply_boundary_conditions(shuffled.coords, _rules())

    fresh = compile_problem(shuffled, bca, MD, OPTS)
    if fresh.operator_host is None:
        pytest.skip("native assembly unavailable")
    path = str(tmp_path / "case.op.npz")
    save_operator(path, fresh)
    cache = load_operator(path)
    if fresh.perm is not None:
        assert cache.perm is not None

    resumed = compile_problem(shuffled, bca, MD, OPTS, operator_cache=cache)
    assert resumed.timings.get("operator_cache") == "hit"
    np.testing.assert_allclose(resumed.solve().u, fresh.solve().u, atol=1e-12)


def test_save_without_host_operator_is_typed_error(tmp_path):
    from magnetite_tpu.meshing.generators import rect_mesh

    mesh = rect_mesh(20, 10)  # stencil mode: assembles in-solve
    bca = apply_boundary_conditions(mesh.coords, _rules())
    problem = compile_problem(mesh, bca, MD, OPTS)
    if problem.mode == "stencil":
        with pytest.raises(InputError):
            save_operator(str(tmp_path / "x.npz"), problem)


def test_renumber_off_rejects_permuted_cache(plate, tmp_path, capsys):
    """A cache assembled under a renumbering must NOT be applied when the
    caller pins renumber='off' -- the permutation would silently override
    the pinned input order."""
    from dataclasses import replace

    bca = apply_boundary_conditions(plate.coords, _rules())
    fresh = compile_problem(plate, bca, MD, OPTS)
    path = str(tmp_path / "case.op.npz")
    save_operator(path, fresh)
    cache = load_operator(path)

    # graft a permutation onto the cache (identity keeps it solvable)
    from magnetite_tpu.fem.solve import OperatorCache

    permuted = OperatorCache(
        mesh_hash=cache.mesh_hash,
        material=cache.material,
        mode=cache.mode,
        offsets=cache.offsets,
        flat=cache.flat,
        cols=cache.cols,
        perm=np.arange(plate.num_nodes),
    )
    resumed = compile_problem(
        plate, bca, MD,
        replace(OPTS, renumber="off"),
        operator_cache=permuted,
    )
    assert resumed.timings.get("operator_cache") == "miss"
    captured = capsys.readouterr()
    assert "renumber='off'" in captured.out + captured.err
    r = resumed.solve()
    r_fresh = fresh.solve()
    np.testing.assert_allclose(r.u, r_fresh.u, rtol=0, atol=1e-12)


def test_keep_operator_host_off_drops_host_copy(plate):
    from dataclasses import replace

    bca = apply_boundary_conditions(plate.coords, _rules())
    slim = compile_problem(
        plate, bca, MD, replace(OPTS, keep_operator_host=False)
    )
    assert slim.operator_host is None
    with pytest.raises(InputError, match="keep_operator_host"):
        save_operator("/tmp/should_not_exist.op.npz", slim)
    full = compile_problem(plate, bca, MD, OPTS)
    np.testing.assert_allclose(slim.solve().u, full.solve().u, atol=1e-12)


def test_keep_operator_host_defaults_off(plate):
    """The default must NOT pin the host operator copy: a library user
    holding a CompiledProblem for repeated solves would otherwise carry
    ~650 MB of dead host memory (at 1M elements) per problem."""
    bca = apply_boundary_conditions(plate.coords, _rules())
    problem = compile_problem(
        plate, bca, MD, SolverOptions(dtype="float64", cg_rtol=1e-10)
    )
    assert problem.operator_host is None


def test_symmetric_half_upload_matches_full(plate):
    """_upload_flat_device ships only the d >= 0 band slots and rebuilds
    the negative bands on device from block symmetry; the result must
    match the full-flat relayout to ~ulp (the C++ assembly's mirrored
    blocks commute products, so they agree to rounding, not bitwise)."""
    from magnetite_tpu.fem import solve as S
    from magnetite_tpu.fem.dia import (
        build_dia_structure,
        build_hybrid_structure,
    )
    from magnetite_tpu.meshing.reorder import renumber

    mesh = renumber(plate)[0]
    n = mesh.num_nodes
    f64 = np.dtype(np.float64)

    st = build_dia_structure(mesh.tris, n)
    assert st is not None
    flat = S._assemble_host_flat("dia", st, mesh, None, st.slot_ids, MD)
    (bands,) = S._upload_flat_device("dia", st, n, None, flat, f64)
    d = len(st.offsets)
    full = flat[: d * n].reshape(d, n, 2, 2).transpose(0, 2, 3, 1)
    scale = np.abs(full).max()
    np.testing.assert_allclose(np.asarray(bands), full, atol=1e-12 * scale)

    # hybrid with a NON-EMPTY remainder: starve the band budget
    hyb = build_hybrid_structure(mesh.tris, n, max_diags=7)
    assert hyb.n_rem > 0
    cols = np.stack([hyb.rem_rows, hyb.rem_cols])
    flat_h = S._assemble_host_flat("hybrid", hyb, mesh, cols, hyb.slot_ids, MD)
    bands_h, rem_h = S._upload_flat_device("hybrid", hyb, n, cols, flat_h, f64)
    dh = len(hyb.offsets)
    full_h = flat_h[: dh * n].reshape(dh, n, 2, 2).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(bands_h), full_h, atol=1e-12 * scale
    )
    np.testing.assert_allclose(
        np.asarray(rem_h), flat_h[dh * n :].reshape(-1, 2, 2), rtol=0, atol=0
    )


def test_hybrid_band_selection_is_sign_symmetric(plate):
    """Every chosen offset must come with its mirror at ANY max_diags --
    the halved upload depends on it (and the mirror's coupling count is
    identical, so symmetry never costs coverage)."""
    from magnetite_tpu.fem.dia import build_hybrid_structure

    for md in (3, 7, 12, 48):
        hyb = build_hybrid_structure(plate.tris, plate.num_nodes, max_diags=md)
        offs = set(int(o) for o in hyb.offsets)
        assert 0 in offs
        assert len(offs) <= md
        assert all(-o in offs for o in offs)


def test_asymmetric_offsets_fall_back_to_full_upload(plate):
    """A sign-asymmetric offset set (legacy persisted structures) must
    take the full-flat upload path and still produce correct bands."""
    from dataclasses import replace as dreplace

    from magnetite_tpu.fem import solve as S
    from magnetite_tpu.fem.dia import DiaStructure, build_dia_structure
    from magnetite_tpu.meshing.reorder import renumber

    mesh = renumber(plate)[0]
    n = mesh.num_nodes
    st = build_dia_structure(mesh.tris, n)
    flat = S._assemble_host_flat("dia", st, mesh, None, st.slot_ids, MD)
    d = len(st.offsets)
    # drop the most-positive band: its negative mirror loses its pair
    st_asym = DiaStructure(
        offsets=st.offsets[: d - 1],
        slot_ids=st.slot_ids,
        n_nodes=n,
        n_diags=d - 1,
    )
    (bands,) = S._upload_flat_device(
        "dia", st_asym, n, None, flat[: (d - 1) * n], np.dtype(np.float64)
    )
    full = flat[: (d - 1) * n].reshape(d - 1, n, 2, 2).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(bands), full, rtol=0, atol=0)


def test_saved_operator_holds_half_payload(plate, tmp_path):
    """save_operator must persist only the d >= 0 slots when offsets are
    sign-symmetric (half the disk bytes / resumed upload at scale), and a
    resume from that file must reproduce the fresh solve exactly."""
    bca = apply_boundary_conditions(plate.coords, _rules())
    fresh = compile_problem(plate, bca, MD, OPTS)
    op = fresh.operator_host
    assert op is not None and op.mode in ("dia", "hybrid")
    offsets = op.offsets
    n_pos = sum(1 for o in offsets if o >= 0)
    assert op.sym_half
    # flat rows = pos-band slots (+ any hybrid remainder): strictly fewer
    # rows than a full d-band layout would hold
    assert n_pos < len(offsets)
    path = str(tmp_path / "half.op.npz")
    save_operator(path, fresh)
    cache = load_operator(path)
    assert cache.sym_half
    assert cache.flat.shape == op.flat.shape
    resumed = compile_problem(plate, bca, MD, OPTS, operator_cache=cache)
    assert resumed.timings.get("operator_cache") == "hit"
    np.testing.assert_allclose(
        resumed.solve().u, fresh.solve().u, rtol=0, atol=0
    )
