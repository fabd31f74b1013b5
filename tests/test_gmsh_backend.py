"""Gmsh subprocess backend, exercised against a fake `gmsh` binary on PATH.

The real gmsh isn't installed in CI; a shell script stands in for it so the
subprocess plumbing (arg order, exit-status wrapping, tempdir cleanup,
MSH round-trip -- reference flow src/mesher.rs:481-519) gets real coverage.
"""

import glob
import os
import stat
import tempfile

import numpy as np
import pytest

from magnetite_tpu.errors import MesherError
from magnetite_tpu.meshing import gmsh_backend
from tests.test_meshing import MSH_FIXTURE

SQUARE = [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]


@pytest.fixture
def fake_gmsh(tmp_path, monkeypatch):
    """Install a fake `gmsh` on PATH; returns a dict to tweak its behavior."""
    msh_file = tmp_path / "canned.msh"
    msh_file.write_text(MSH_FIXTURE)
    log = tmp_path / "argv.log"
    script = tmp_path / "gmsh"
    script.write_text(
        "#!/bin/sh\n"
        f'echo "$@" > {log}\n'
        'if [ -n "$FAKE_GMSH_FAIL" ]; then echo "boom" >&2; exit 3; fi\n'
        # find the -o argument and copy the canned mesh there
        'out=""; prev=""\n'
        'for a in "$@"; do if [ "$prev" = "-o" ]; then out="$a"; fi; prev="$a"; done\n'
        f'cp {msh_file} "$out"\n'
    )
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    monkeypatch.delenv("FAKE_GMSH_FAIL", raising=False)
    return {"log": log}


def test_available_with_fake_on_path(fake_gmsh):
    assert gmsh_backend.gmsh_available()


def test_triangulate_round_trips_msh(fake_gmsh):
    mesh = gmsh_backend.triangulate(SQUARE, 0.0, 0.5)
    assert mesh.num_nodes == 5
    assert mesh.num_elements == 4
    np.testing.assert_allclose(mesh.coords[4], [0.5, 0.5])
    # invocation matches the reference: gmsh <geo> -2 -o <msh>
    argv = fake_gmsh["log"].read_text().split()
    assert argv[0].endswith("geom.geo")
    assert argv[1] == "-2"
    assert argv[2] == "-o"
    assert argv[3].endswith("geom.msh")


def test_gmsh_failure_wrapped_as_mesher_error(fake_gmsh, monkeypatch):
    monkeypatch.setenv("FAKE_GMSH_FAIL", "1")
    with pytest.raises(MesherError, match="status 3"):
        gmsh_backend.triangulate(SQUARE, 0.0, 0.5)


def test_tempdir_cleaned_up(fake_gmsh):
    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "magnetite_gmsh_*")))
    gmsh_backend.triangulate(SQUARE, 0.0, 0.5)
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "magnetite_gmsh_*")))
    assert after == before


def test_tempdir_cleaned_up_on_failure(fake_gmsh, monkeypatch):
    monkeypatch.setenv("FAKE_GMSH_FAIL", "1")
    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "magnetite_gmsh_*")))
    with pytest.raises(MesherError):
        gmsh_backend.triangulate(SQUARE, 0.0, 0.5)
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "magnetite_gmsh_*")))
    assert after == before


def test_keep_files_in_preserves_artifacts(fake_gmsh, tmp_path):
    keep = tmp_path / "keep"
    keep.mkdir()
    gmsh_backend.triangulate(SQUARE, 0.0, 0.5, keep_files_in=str(keep))
    assert (keep / "geom.geo").exists()
    assert (keep / "geom.msh").exists()


def test_runner_uses_gmsh_backend(fake_gmsh):
    """End-to-end through the mesher orchestrator with backend='gmsh'."""
    from magnetite_tpu.config import parse_simulation_input
    from magnetite_tpu.meshing import runner

    sim = parse_simulation_input(
        {
            "metadata": {
                "part_thickness": 0.5,
                "material_elasticity": 69e9,
                "poisson_ratio": 0.33,
                "characteristic_length_min": 0,
                "characteristic_length_max": 0.5,
            },
            "boundary_conditions": {
                "fix": {
                    "region": {"x_target_max": 0.01},
                    "targets": {"ux": 0, "uy": 0, "fx": None, "fy": None},
                }
            },
        }
    )
    with tempfile.TemporaryDirectory() as d:
        csv = os.path.join(d, "square.csv")
        with open(csv, "w") as f:
            f.write("x,y\n0,0\n1,0\n1,1\n0,1\n")
        mesh, bca = runner.run([csv], sim, backend="gmsh", log=lambda m: None)
    assert mesh.num_nodes == 5
    assert mesh.num_elements == 4
