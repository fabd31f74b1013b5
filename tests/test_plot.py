"""Plotter smoke tests (headless, Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from magnetite_tpu.config import SolverOptions
from magnetite_tpu.fem.solve import solve_system
from magnetite_tpu.meshing.generators import rect_mesh, tensile_bcs_for_rect
from magnetite_tpu.post.plot import plot_results


def test_plot_saves_figure(tmp_path, metadata):
    mesh = rect_mesh(8, 4, width=2.0)
    bca = tensile_bcs_for_rect(mesh.coords, pull=0.01)
    result = solve_system(mesh, bca, metadata, SolverOptions())
    out = tmp_path / "fig.png"
    plot_results(mesh, result, cmap="coolwarm", show=False, save_path=str(out))
    assert out.exists() and out.stat().st_size > 10_000  # a real PNG


def test_plot_wide_model_uses_stacked_layout(tmp_path, metadata):
    """Aspect wider than 16:9 -> 2x1 subplot stack (reference plot.py:86-92)."""
    mesh = rect_mesh(40, 4, width=8.0, height=0.5)
    bca = tensile_bcs_for_rect(mesh.coords, pull=0.01)
    result = solve_system(mesh, bca, metadata, SolverOptions())
    out = tmp_path / "wide.png"
    fig = plot_results(
        mesh, result, cmap="viridis", show=False, save_path=str(out)
    )
    assert out.exists()
    if fig is not None:  # stacked: axes share x extents
        axes = fig.get_axes()
        assert len(axes) >= 2
