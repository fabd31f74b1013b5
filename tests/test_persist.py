"""Case checkpoint/resume (npz) tests."""

import subprocess
import sys

import numpy as np
import pytest

from magnetite_tpu.bc import BCArrays
from magnetite_tpu.errors import InputError
from magnetite_tpu.fem.assembly import build_ell_structure
from magnetite_tpu.meshing.generators import plate_with_hole_mesh
from magnetite_tpu.persist import load_case, save_case


def _case():
    mesh = plate_with_hole_mesh(8, 16)
    n = mesh.num_nodes
    rng = np.random.default_rng(0)
    u_known = rng.random((n, 2)) < 0.2
    u_value = np.where(u_known, rng.standard_normal((n, 2)), 0.0)
    f_value = np.where(~u_known, rng.standard_normal((n, 2)), 0.0)
    return mesh, BCArrays(u_known=u_known, u_value=u_value, f_value=f_value)


def test_roundtrip_mesh_bcs_structure(tmp_path, metadata):
    mesh, bca = _case()
    st = build_ell_structure(mesh.tris, mesh.num_nodes)
    path = str(tmp_path / "case.npz")
    save_case(path, mesh, bca, metadata=metadata, structure=st)
    m2, b2, md2, st2 = load_case(path)

    np.testing.assert_array_equal(m2.coords, mesh.coords)
    np.testing.assert_array_equal(m2.tris, mesh.tris)
    assert m2.grid_shape == mesh.grid_shape
    assert m2.wrap_cols == mesh.wrap_cols
    assert m2.grid_local == mesh.grid_local
    # canonical_grid must survive the round trip (it gates scatter-free
    # structured assembly and compile_sweep eligibility)
    assert mesh.canonical_grid and m2.canonical_grid
    np.testing.assert_array_equal(b2.u_known, bca.u_known)
    np.testing.assert_array_equal(b2.u_value, bca.u_value)
    np.testing.assert_array_equal(b2.f_value, bca.f_value)
    assert md2.youngs_modulus == metadata.youngs_modulus
    np.testing.assert_array_equal(st2.cols, st.cols)
    np.testing.assert_array_equal(st2.slot_ids, st.slot_ids)
    assert st2.width == st.width


def test_bad_file_is_typed_error(tmp_path):
    path = tmp_path / "junk.npz"
    path.write_bytes(b"not an npz")
    with pytest.raises(InputError, match="cannot read case file"):
        load_case(str(path))


def _rewrite_version(path: str, version: int) -> None:
    import magnetite_tpu.persist as persist

    data = dict(persist._read_npz(path))
    data["format_version"] = np.int64(version)
    data = {k: np.asarray(v) for k, v in data.items()}
    persist._write_npz(path, data, compressed=False)


def test_v1_case_file_still_loads(tmp_path):
    """The case schema is unchanged since format v1; a version bump for
    AMG-fingerprint semantics must not reject old case checkpoints."""
    mesh, bca = _case()
    path = str(tmp_path / "case.npz")
    save_case(path, mesh, bca)
    _rewrite_version(path, 1)
    m2, b2, _, _ = load_case(path)
    np.testing.assert_array_equal(m2.coords, mesh.coords)
    np.testing.assert_array_equal(b2.u_known, bca.u_known)


def test_v1_amg_cache_rejected_future_case_rejected(tmp_path):
    """v1 AMG fingerprints can never match the v2 digest -> clear error;
    a FUTURE format version is rejected for every kind."""
    from magnetite_tpu.persist import load_amg

    path = str(tmp_path / "case.amg.npz")
    import magnetite_tpu.persist as persist

    persist._write_npz(
        path, {"format_version": np.int64(1)}, compressed=False
    )
    with pytest.raises(InputError, match="format version 1"):
        load_amg(path)

    mesh, bca = _case()
    cpath = str(tmp_path / "case.npz")
    save_case(cpath, mesh, bca)
    _rewrite_version(cpath, 99)
    with pytest.raises(InputError, match="format version 99"):
        load_case(cpath)


def _cli_env():
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_cli_save_then_resume(tmp_path):
    """End-to-end: mesh+save, then resume without geometry files."""
    example = "/root/reference/examples/tensile-example"
    case = str(tmp_path / "case.npz")
    env_args = dict(
        cwd="/root/repo", env=_cli_env(), capture_output=True, text=True,
        timeout=500,
    )
    r1 = subprocess.run(
        [
            sys.executable, "-m", "magnetite_tpu.cli",
            f"{example}/input.json", f"{example}/vertices.csv",
            "--skip", "--save-case", case, "--out-dir", str(tmp_path),
        ],
        **env_args,
    )
    assert r1.returncode == 0, r1.stderr
    nodes_first = (tmp_path / "nodes.csv").read_text()

    r2 = subprocess.run(
        [
            sys.executable, "-m", "magnetite_tpu.cli",
            f"{example}/input.json", "--skip", "--load-case", case,
            "--out-dir", str(tmp_path),
        ],
        **env_args,
    )
    assert r2.returncode == 0, r2.stderr
    assert "resumed case" in r2.stdout + r2.stderr
    assert (tmp_path / "nodes.csv").read_text() == nodes_first


def test_cli_no_geometry_no_case_is_error():
    example = "/root/reference/examples/tensile-example"
    r = subprocess.run(
        [sys.executable, "-m", "magnetite_tpu.cli", f"{example}/input.json", "--skip"],
        cwd="/root/repo", env=_cli_env(), capture_output=True, text=True,
        timeout=500,
    )
    assert r.returncode == 1
    assert "Received error: Input error" in r.stderr
