"""Meshing tests: MSH parser (canned fixture), geo writer, Delaunay backend."""

import numpy as np
import pytest

from magnetite_tpu.errors import InputError, MesherError
from magnetite_tpu.geometry.geo_writer import build_geo
from magnetite_tpu.geometry.polygon import (
    min_distance_to_segments,
    points_in_polygon,
    polygon_signed_area,
)
from magnetite_tpu.meshing.core import normalize_orientation, signed_areas
from magnetite_tpu.meshing.delaunay_backend import triangulate
from magnetite_tpu.meshing.msh import parse_msh
from magnetite_tpu.meshing import runner


# A minimal hand-written MSH 4.1 file: unit square, 4 boundary nodes + 1
# center node, 4 triangles, plus 1D edge entities that must be skipped.
MSH_FIXTURE = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Entities
1 1 1 0
1 0 0 0 0
1 0 0 0 1 1 0 0 1 2 1 -1
1 0 0 0 1 1 0 0 1 4 1 -1
$EndEntities
$Nodes
2 5 1 5
1 1 0 4
1
2
3
4
0 0 0
1 0 0
1 1 0
0 1 0
2 1 0 1
5
0.5 0.5 0
$EndNodes
$Elements
2 6 1 6
1 1 1 2
1 1 2
2 2 3
2 1 2 4
3 1 2 5
4 2 3 5
5 3 4 5
6 4 1 5
$EndElements
"""


def test_msh_parser_fixture():
    mesh = parse_msh(MSH_FIXTURE)
    assert mesh.num_nodes == 5
    assert mesh.num_elements == 4  # the two 1D edge elements are skipped
    np.testing.assert_allclose(mesh.coords[4], [0.5, 0.5])
    # all four triangles touch the center node (index 4)
    assert (mesh.tris == 4).sum() == 4


def test_msh_parser_noncontiguous_tags():
    text = MSH_FIXTURE.replace("2 1 0 1\n5\n", "2 1 0 1\n9\n").replace(
        "3 1 2 5", "3 1 2 9"
    ).replace("4 2 3 5", "4 2 3 9").replace("5 3 4 5", "5 3 4 9").replace(
        "6 4 1 5", "6 4 1 9"
    ).replace("2 5 1 5", "2 5 1 9")
    mesh = parse_msh(text)
    assert mesh.num_nodes == 5
    assert mesh.num_elements == 4


def test_msh_parser_no_nodes_errors():
    with pytest.raises(MesherError):
        parse_msh("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n")


def test_normalize_orientation_fixes_cw():
    mesh = parse_msh(MSH_FIXTURE)
    # force one triangle clockwise
    mesh.tris[0] = mesh.tris[0][::-1]
    assert signed_areas(mesh.coords, mesh.tris)[0] < 0
    fixed = normalize_orientation(mesh)
    assert (signed_areas(fixed.coords, fixed.tris) > 0).all()


def test_normalize_orientation_compat_threshold():
    """With the reference's threshold of 1.0, CCW triangles smaller than
    unit area get (incorrectly) flipped to CW -- replicated on demand."""
    mesh = parse_msh(MSH_FIXTURE)  # all areas are 0.25
    compat = normalize_orientation(mesh, threshold=1.0)
    assert (signed_areas(compat.coords, compat.tris) < 0).all()


def test_geo_writer_structure():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    inner = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0]])
    text = build_geo([outer, inner], 0.1, 0.5)
    assert "Point(0) = { 0.0, 0.0, 0, 1.0 };" in text
    assert "Point(4) = { 1.0, 1.0, 0, 1.0 };"  in text  # inner offset
    assert "Line Loop(1) = { 0, 1, 2, 3 };" in text
    assert "Line Loop(2) = { 4, 5, 6 };" in text
    assert "Plane Surface(1) = { 1, 2 };" in text
    assert "Mesh.CharacteristicLengthMin = 0.1;" in text
    assert "Mesh.CharacteristicLengthMax = 0.5;" in text
    assert text.rstrip().endswith("Mesh 2;")


def test_geo_writer_compat_loop_order():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0]])
    inner = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0]])
    text = build_geo([outer, inner], 0, 1, compat_loop_order=True)
    assert "Plane Surface(1) = { 2, 1 };" in text


def test_polygon_predicates():
    square = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    assert polygon_signed_area(square) == pytest.approx(4.0)
    pts = np.array([[1.0, 1.0], [3.0, 1.0], [-0.5, 0.5], [1.5, 1.9]])
    np.testing.assert_array_equal(
        points_in_polygon(pts, square), [True, False, False, True]
    )
    d = min_distance_to_segments(np.array([[1.0, 0.5], [3.0, 1.0]]), square)
    np.testing.assert_allclose(d, [0.5, 1.0])


def test_delaunay_backend_square():
    square = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    mesh = triangulate([square], 0.0, 0.5)
    areas = signed_areas(mesh.coords, mesh.tris)
    assert (areas > 0).all()
    # total area must match the square
    assert areas.sum() == pytest.approx(16.0, rel=1e-6)
    # spacing roughly h -> on the order of 2*(4/0.5)^2 triangles
    assert mesh.num_elements > 64


def test_delaunay_backend_with_hole():
    square = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    hole = np.array([[1.5, 1.5], [2.5, 1.5], [2.5, 2.5], [1.5, 2.5]])
    mesh = triangulate([square, hole], 0.0, 0.4)
    areas = signed_areas(mesh.coords, mesh.tris)
    assert (areas > 0).all()
    # domain area = 16 - 1; boundary discretization error allowed
    assert areas.sum() == pytest.approx(15.0, rel=0.02)
    # no triangle centroid inside the hole
    centroids = mesh.coords[mesh.tris].mean(axis=1)
    inside_hole = points_in_polygon(centroids, hole)
    assert not inside_hole.any()


def test_delaunay_mesh_refines_with_smaller_h():
    square = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    coarse = triangulate([square], 0.0, 0.5)
    fine = triangulate([square], 0.0, 0.2)
    assert fine.num_elements > 2 * coarse.num_elements


def test_runner_dispatch_unknown_extension(tmp_path, metadata):
    with pytest.raises(InputError, match="Unrecognized geometry filetype"):
        runner.load_geometry([str(tmp_path / "geom.stl")])


def test_runner_csv_order_outer_first(tmp_path):
    outer = tmp_path / "outer.csv"
    outer.write_text("x,y\n0,0\n8,0\n8,8\n0,8\n")
    inner = tmp_path / "inner.csv"
    inner.write_text("x,y\n3,3\n5,3\n5,5\n3,5\n")
    loops = runner.load_geometry([str(outer), str(inner)])
    assert len(loops) == 2
    assert loops[0][2, 0] == 8.0
