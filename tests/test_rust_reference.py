"""Cross-validation against the actual Rust reference binary.

Skipped by default: this environment has no cargo/gmsh toolchain (verified),
so the Rust binary cannot run here and parity rests on the independent
dense oracle (tests/test_golden.py + magnetite_tpu/oracle.py). In an
environment with the toolchains, `scripts/validate_reference.sh` freezes
the reference's nodes.csv/elements.csv under tests/golden/rust/<example>/;
these tests then activate and assert the rebuild reproduces the Rust
binary's nodal displacements and element stresses to 1e-6 relative
(BASELINE.md accuracy target; reference outputs: src/post_processor.rs
42-75 schemas).

Note the reference meshes through gmsh, so comparisons must re-run on the
SAME mesh: the frozen nodes.csv fixes the node coordinates, and the
rebuild solves that exact mesh (coords + elements from the frozen CSVs)
rather than re-meshing.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "rust")
EXAMPLES = {
    "tensile": "/root/reference/examples/tensile-example/input.json",
    "cover": "/root/reference/examples/cover-eample/input.json",
    "linkedin": "/root/reference/examples/linkedin-logo/input.json",
}


def _load_csvs(name):
    nodes = np.loadtxt(
        os.path.join(GOLDEN, name, "nodes.csv"), delimiter=",", skiprows=1
    )
    elements = np.loadtxt(
        os.path.join(GOLDEN, name, "elements.csv"), delimiter=",", skiprows=1
    )
    return nodes, elements


@pytest.mark.parametrize("name", sorted(EXAMPLES))
def test_matches_rust_binary(name):
    if not os.path.isdir(os.path.join(GOLDEN, name)):
        pytest.skip(
            "no frozen Rust outputs (run scripts/validate_reference.sh in an "
            "environment with cargo + gmsh)"
        )
    from magnetite_tpu.bc import apply_boundary_conditions
    from magnetite_tpu.config import SolverOptions, load_simulation_input
    from magnetite_tpu.fem.solve import solve_system
    from magnetite_tpu.meshing.core import Mesh

    nodes, elements = _load_csvs(name)
    coords = nodes[:, :2]
    u_ref = nodes[:, 2:4]
    tris = elements[:, :3].astype(np.int32)
    stress_ref = elements[:, 3]

    sim = load_simulation_input(EXAMPLES[name])
    mesh = Mesh(coords=coords, tris=tris)
    bca = apply_boundary_conditions(coords, sim.boundary_rules)
    # compat mode: reproduce the reference's scalar-stress sign quirk
    res = solve_system(
        mesh, bca, sim.metadata,
        SolverOptions(cg_rtol=1e-12, stress_sign_threshold=1.0),
    )
    u_scale = max(np.abs(u_ref).max(), 1e-30)
    np.testing.assert_allclose(res.u, u_ref, atol=1e-6 * u_scale)
    s_scale = max(np.abs(stress_ref).max(), 1e-30)
    np.testing.assert_allclose(res.stress, stress_ref, atol=1e-6 * s_scale)
