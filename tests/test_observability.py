"""CG residual-history capture + streaming progress observer tests."""

import jax.numpy as jnp
import numpy as np

from magnetite_tpu.config import SolverOptions
from magnetite_tpu.fem.cg import pcg
from magnetite_tpu.fem.solve import solve_system
from magnetite_tpu.meshing.generators import rect_mesh, tensile_bcs_for_rect


def _spd_system(n=30, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, n))
    a = jnp.asarray(m @ m.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    return a, b


def test_pcg_history_monotone_overall():
    a, b = _spd_system()
    res = pcg(lambda v: a @ v, b, rtol=1e-10, history=64)
    k = int(res.iterations)
    hist = np.asarray(res.history)[:k]
    assert hist.shape[0] == k
    assert (hist > 0).all()
    # final recorded residual matches the reported one
    np.testing.assert_allclose(hist[-1], float(res.residual_norm), rtol=1e-6)
    # CG reduces the residual by orders of magnitude start to end
    assert hist[-1] < 1e-6 * hist[0]


def test_pcg_history_shorter_than_iterations():
    a, b = _spd_system()
    res = pcg(lambda v: a @ v, b, rtol=1e-10, history=4)
    assert np.asarray(res.history).shape == (4,)
    # a short trace holds the FIRST 4 iterations' residuals (not the last)
    full = pcg(lambda v: a @ v, b, rtol=1e-10, history=64)
    np.testing.assert_allclose(
        np.asarray(res.history), np.asarray(full.history)[:4], rtol=1e-12
    )


def test_f32_rtol_clamp_warns(capsys):
    """Unreachable f32 tolerances log a warning naming the mixed-precision
    escape hatch (silent accuracy downgrades are invisible otherwise)."""
    from magnetite_tpu.config import ModelMetadata
    from magnetite_tpu.meshing.core import Mesh

    grid = rect_mesh(6, 9)
    mesh = Mesh(coords=grid.coords, tris=grid.tris)  # no grid_shape: DIA path
    bca = tensile_bcs_for_rect(grid.coords, pull=0.01)
    md = ModelMetadata(
        youngs_modulus=69e9,
        poisson_ratio=0.33,
        part_thickness=0.5,
        characteristic_length_min=0.0,
        characteristic_length_max=1.0,
    )
    solve_system(
        mesh, bca, md, SolverOptions(dtype="float32", cg_rtol=1e-12)
    )
    captured = capsys.readouterr()
    out = captured.out + captured.err
    assert "warning:" in out and "clamping" in out
    assert "mixed" in out


def test_pcg_progress_callback_streams(capfd):
    a, b = _spd_system()
    seen = []

    def cb(k, rnorm, bnorm):
        seen.append((int(k), float(rnorm)))

    res = pcg(
        lambda v: a @ v, b, rtol=1e-10, progress_every=5, progress_callback=cb
    )
    import jax

    jax.effects_barrier()
    assert len(seen) >= 2
    ks = [k for k, _ in seen]
    assert all(k % 5 == 0 for k in ks)
    assert ks == sorted(ks)


def test_solve_system_residual_history(metadata):
    mesh = rect_mesh(8, 4, width=2.0)
    bca = tensile_bcs_for_rect(mesh.coords, pull=0.01)
    res = solve_system(
        mesh, bca, metadata, SolverOptions(residual_history=256)
    )
    hist = res.residual_history
    assert hist.shape[0] == res.iterations
    np.testing.assert_allclose(hist[-1], res.residual_norm, rtol=1e-5)


def test_solve_system_progress_lines(metadata, capfd):
    mesh = rect_mesh(8, 4, width=2.0)
    bca = tensile_bcs_for_rect(mesh.coords, pull=0.01)
    solve_system(
        mesh, bca, metadata, SolverOptions(cg_progress_every=10)
    )
    import jax

    jax.effects_barrier()
    out = capfd.readouterr()
    assert "info: cg iteration" in out.out + out.err
