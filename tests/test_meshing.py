"""Meshing tests: MSH parser (canned fixture), geo writer, Delaunay backend."""

import numpy as np
import pytest

from magnetite_tpu.errors import InputError, MesherError
from magnetite_tpu.geometry.geo_writer import build_geo
from magnetite_tpu.geometry.polygon import (
    min_distance_to_segments,
    points_in_domain,
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


def _full_qhull_reference(loops, h):
    """The pre-hybrid algorithm: one qhull over ALL points. Ground truth
    for the hybrid split in delaunay_backend.triangulate."""
    from scipy.spatial import Delaunay

    from magnetite_tpu.meshing import delaunay_backend as db

    outer, holes = loops[0], list(loops[1:])
    boundary_pts = np.unique(
        np.concatenate([db._resample_loop(l, h) for l in loops], axis=0),
        axis=0,
    )
    lattice, ny, nx = db._hex_lattice(outer.min(axis=0), outer.max(axis=0), h)
    inside = points_in_domain(lattice, outer, holes)
    clearance = db._clearance_limited(lattice, loops, 1e9)
    kept = inside & (clearance >= 0.7 * h)
    points = np.concatenate([boundary_pts, lattice[kept]], axis=0)
    tris = Delaunay(points).simplices.astype(np.int64)
    centroids = points[tris].mean(axis=1)
    tris = tris[points_in_domain(centroids, outer, holes)]
    areas = np.abs(signed_areas(points, tris))
    tris = tris[areas > 1e-12 * max(areas.max(), 1.0)]
    return points, tris


@pytest.mark.parametrize(
    "loops,h",
    [
        ([np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 2.0], [0.0, 2.0]])], 0.08),
        (
            [
                np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 2.0], [0.0, 2.0]]),
                np.array([[1.6, 0.8], [2.4, 0.8], [2.4, 1.2], [1.6, 1.2]]),
            ],
            0.06,
        ),
        (  # non-convex L-shape: the subset's interior hole is L-shaped
            # too, so spurious spanning triangles cross a concave region
            [
                np.array(
                    [
                        [0.0, 0.0],
                        [3.0, 0.0],
                        [3.0, 1.2],
                        [1.2, 1.2],
                        [1.2, 2.8],
                        [0.0, 2.8],
                    ]
                )
            ],
            0.07,
        ),
        (  # non-axis-aligned pentagon with a triangular hole
            [
                np.array(
                    [[0.0, 0.0], [3.0, -0.4], [4.1, 1.5], [2.0, 2.9], [-0.5, 1.7]]
                ),
                np.array([[1.4, 0.9], [2.3, 1.1], [1.8, 1.9]]),
            ],
            0.05,
        ),
    ],
)
def test_hybrid_delaunay_matches_full_qhull(loops, h):
    """The band-qhull + canonical-interior split must reproduce the
    full-set Delaunay triangulation exactly (same triangle SET)."""
    mesh = triangulate(loops, 0.0, h)
    pts_ref, tris_ref = _full_qhull_reference(loops, h)

    # the hybrid path must actually exercise both sides of the split
    from magnetite_tpu.meshing import delaunay_backend as db

    clearance = db._clearance_limited(pts_ref, loops, 1e9)
    assert (clearance >= db._DEEP_CLEARANCE * h).any(), "no deep region"

    # compare as canonical vertex-coordinate triangle sets (node order
    # differs: the hybrid renumbers by lattice rows)
    def canon(points, tris):
        tri_pts = points[tris]  # [T, 3, 2]
        order = np.lexsort(
            (tri_pts[:, :, 1], tri_pts[:, :, 0]), axis=1
        )
        tri_pts = np.take_along_axis(tri_pts, order[:, :, None], axis=1)
        flat = tri_pts.reshape(-1, 6).round(decimals=9)
        return set(map(tuple, flat))

    got = canon(mesh.coords, mesh.tris)
    want = canon(pts_ref, tris_ref)
    # exact-set equality up to COCIRCULAR flips: four concyclic points
    # (boundary row + aligned lattice row form perfect rectangles) make
    # the Delaunay diagonal ambiguous, and qhull picks by insertion
    # order. Each differing triangle must still satisfy the Delaunay
    # empty-circumcircle property against ALL mesh points (tolerance
    # admits the on-circle 4th point), proving the difference is a
    # degenerate flip and not a wrong triangle.
    assert len(got - want) == len(want - got)
    all_pts = pts_ref

    def assert_delaunay(tri_flat):
        t = np.array(tri_flat).reshape(3, 2)
        ax, ay = t[0]
        bx, by = t[1]
        cx, cy = t[2]
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        ux = (
            (ax**2 + ay**2) * (by - cy)
            + (bx**2 + by**2) * (cy - ay)
            + (cx**2 + cy**2) * (ay - by)
        ) / d
        uy = (
            (ax**2 + ay**2) * (cx - bx)
            + (bx**2 + by**2) * (ax - cx)
            + (cx**2 + cy**2) * (bx - ax)
        ) / d
        r = np.hypot(ax - ux, ay - uy)
        dist = np.hypot(all_pts[:, 0] - ux, all_pts[:, 1] - uy)
        assert dist.min() >= r - 1e-7 * max(r, 1.0), "non-Delaunay triangle"

    for tri_flat in (got - want) | (want - got):
        assert_delaunay(tri_flat)


def test_hybrid_delaunay_tiny_domain_all_band():
    """Domains too small for a deep interior fall back to pure qhull."""
    square = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    mesh = triangulate([square], 0.0, 0.3)  # 3h = 0.9 ~ domain size
    assert mesh.num_elements > 0
    assert np.abs(signed_areas(mesh.coords, mesh.tris)).sum() == pytest.approx(
        1.0, rel=0.05
    )


@pytest.mark.parametrize("nr,nt", [(3, 8), (16, 32), (65, 128)])
def test_plate_with_hole_ccw_by_construction(nr, nt):
    """plate_with_hole_mesh skips the runtime normalize_orientation pass
    (a 0.6 s cost at 4M elements); this pins the CCW-by-construction
    invariant it relies on."""
    from magnetite_tpu.meshing.generators import plate_with_hole_mesh

    mesh = plate_with_hole_mesh(nr, nt)
    areas = signed_areas(mesh.coords, mesh.tris)
    assert (areas > 0).all()


def test_clearance_limited_matches_exact_kernel():
    """_clearance_limited must equal min-over-loops of the exact
    closed-loop kernel wherever it reports a finite value, and report
    +inf only beyond the cutoff."""
    from magnetite_tpu.meshing.delaunay_backend import _clearance_limited

    rng = np.random.default_rng(7)
    # irregular star polygon + a triangle hole, 37 segments total
    ang = np.sort(rng.uniform(0, 2 * np.pi, 34))
    rad = rng.uniform(1.0, 2.0, 34)
    star = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=-1)
    tri = np.array([[0.1, 0.0], [0.4, 0.1], [0.2, 0.3]])
    loops = [star, tri]
    pts = rng.uniform(-2.2, 2.2, size=(4000, 2))
    cutoff = 0.35

    got = _clearance_limited(pts, loops, cutoff)
    exact = np.minimum(
        min_distance_to_segments(pts, star),
        min_distance_to_segments(pts, tri),
    )
    # contract: exact wherever the result is <= cutoff...
    below = got <= cutoff
    np.testing.assert_allclose(got[below], exact[below], rtol=1e-12)
    assert (exact[below] <= cutoff).all()
    # ...and everything truly within the cutoff reports its exact value
    within = exact <= cutoff
    np.testing.assert_allclose(got[within], exact[within], rtol=1e-12)
    # above the cutoff: only ever a loose UPPER bound (never too small)
    above = ~below
    assert (got[above] >= exact[above] - 1e-12).all()


def test_delaunay_collinear_loop_raises_mesher_error():
    """Degenerate (collinear) boundary loops must surface the module's
    typed MesherError, not leak scipy's QhullError."""
    line = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    with pytest.raises(MesherError, match="degenerate"):
        triangulate([line], 0.1, 1.0)


def test_delaunay_empty_domain_raises_mesher_error():
    """A hole congruent to the outer loop filters every triangle; the
    typed no-elements error must fire before any empty-array reduction."""
    sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    with pytest.raises(MesherError, match="no elements"):
        triangulate([sq, sq.copy()], 0.1, 0.2)
