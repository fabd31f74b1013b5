"""Golden regression snapshots for the three bundled reference examples.

Frozen displacement/force/stress fields (tests/golden/*.npz, produced by the
built-in delaunay backend + f64 solve at rtol 1e-12) gate every future perf
change: max relative displacement drift must stay under 1e-6 (the accuracy
bar of BASELINE.md). The mesh connectivity is pinned too, so an accidental
mesher change shows up as a shape mismatch rather than a silent re-mesh.
"""

import os

import numpy as np
import pytest

from magnetite_tpu.config import SolverOptions, load_simulation_input
from magnetite_tpu.fem.solve import solve_system
from magnetite_tpu.meshing import runner

EX = "/root/reference/examples"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
CASES = {
    "tensile": (
        f"{EX}/tensile-example/input.json",
        [f"{EX}/tensile-example/vertices.csv"],
    ),
    "cover": (f"{EX}/cover-eample/input.json", [f"{EX}/cover-eample/geom.svg"]),
    "linkedin": (
        f"{EX}/linkedin-logo/input.json",
        [f"{EX}/linkedin-logo/linkedin.svg"],
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_example(name):
    inp, geoms = CASES[name]
    sim = load_simulation_input(inp)
    mesh, bca = runner.run(geoms, sim, backend="delaunay", log=lambda m: None)
    golden = np.load(os.path.join(GOLDEN, f"{name}.npz"))

    # meshing determinism: identical connectivity and coordinates
    np.testing.assert_array_equal(mesh.tris, golden["tris"])
    np.testing.assert_allclose(mesh.coords, golden["coords"], atol=1e-12)

    res = solve_system(mesh, bca, sim.metadata, SolverOptions(cg_rtol=1e-12))

    u_scale = np.abs(golden["u"]).max()
    assert np.abs(res.u - golden["u"]).max() <= 1e-6 * u_scale

    f_scale = np.abs(golden["f"]).max()
    assert np.abs(res.f - golden["f"]).max() <= 1e-5 * f_scale

    s_scale = np.abs(golden["stress"]).max()
    assert np.abs(res.stress - golden["stress"]).max() <= 1e-5 * s_scale
    assert np.abs(res.von_mises - golden["von_mises"]).max() <= 1e-5 * s_scale
