"""Built-in Delaunay meshing backend (scipy, no external binaries).

The reference delegates all meshing to an external ``gmsh`` subprocess
(src/mesher.rs:481-519). That stays available as an optional backend
(`gmsh_backend`), but this built-in backend makes the framework
self-contained: polygon loops with holes -> quality triangle mesh, entirely
in-process.

Algorithm:
  1. Resample every loop's edges so boundary spacing <= h (the target
     characteristic length), keeping original vertices.
  2. Fill the interior with a hexagonal lattice of spacing h (hex packing
     gives near-equilateral Delaunay triangles), keeping only points inside
     the domain with >= 0.7h clearance from every boundary.
  3. Delaunay-triangulate boundary + interior points (scipy.spatial).
  4. Drop triangles whose centroid falls outside the domain (removes hole
     fills and concave-region bridging) and drop unused nodes.
"""

from __future__ import annotations

import numpy as np

from ..errors import MesherError
from ..geometry.polygon import (
    min_distance_to_segments,
    points_in_domain,
)
from .core import Mesh, normalize_orientation, signed_areas


def _resample_loop(loop: np.ndarray, h: float) -> np.ndarray:
    """Subdivide loop edges longer than h; keep original vertices."""
    if loop.shape[0] < 3:
        raise MesherError(
            f"geometry loop needs >= 3 vertices, got {loop.shape[0]}"
        )
    out = []
    v = loop.shape[0]
    for i in range(v):
        a = loop[i]
        b = loop[(i + 1) % v]
        length = float(np.hypot(*(b - a)))
        out.append(a)
        if length > h:
            n_sub = int(np.ceil(length / h))
            for k in range(1, n_sub):
                out.append(a + (b - a) * (k / n_sub))
    return np.asarray(out)


def _hex_lattice(bbox_min, bbox_max, h: float) -> np.ndarray:
    """Hexagonal point lattice of spacing h covering the bbox."""
    dx = h
    dy = h * np.sqrt(3.0) / 2.0
    nx = max(int(np.ceil((bbox_max[0] - bbox_min[0]) / dx)) + 2, 2)
    ny = max(int(np.ceil((bbox_max[1] - bbox_min[1]) / dy)) + 2, 2)
    xs = bbox_min[0] + dx * np.arange(nx)
    ys = bbox_min[1] + dy * np.arange(ny)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    gx = gx + (np.arange(ny) % 2)[:, None] * (dx / 2.0)  # stagger odd rows
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def triangulate(
    loops: list[np.ndarray],
    characteristic_length_min: float,
    characteristic_length_max: float,
) -> Mesh:
    """Mesh the domain bounded by loops[0] minus holes loops[1:]."""
    from scipy.spatial import Delaunay

    outer, holes = loops[0], list(loops[1:])
    if characteristic_length_max <= 0:
        raise MesherError("characteristic_length_max must be positive")
    h = float(characteristic_length_max)

    boundary_pts = np.concatenate(
        [_resample_loop(loop, h) for loop in loops], axis=0
    )

    bbox_min = outer.min(axis=0)
    bbox_max = outer.max(axis=0)
    lattice = _hex_lattice(bbox_min, bbox_max, h)
    inside = points_in_domain(lattice, outer, holes)
    lattice = lattice[inside]
    if lattice.size:
        from ..utils.logging import ProgressBar

        # boundary-clearance pass is the long host loop on multi-hole
        # geometries (lattice points x every loop's segments)
        bar = ProgressBar(len(loops), label="clearance")
        clearance = np.full(lattice.shape[0], np.inf)
        for i, loop in enumerate(loops):
            clearance = np.minimum(
                clearance, min_distance_to_segments(lattice, loop)
            )
            bar.update(i + 1)
        bar.finish()
        lattice = lattice[clearance >= 0.7 * h]

    points = np.concatenate([boundary_pts, lattice], axis=0)
    # dedupe exactly-coincident points (repeated loop vertices)
    points = np.unique(points, axis=0)
    if points.shape[0] < 3:
        raise MesherError("not enough points to mesh; refine the geometry")

    tri = Delaunay(points)
    tris = tri.simplices.astype(np.int32)

    centroids = points[tris].mean(axis=1)
    keep = points_in_domain(centroids, outer, holes)
    tris = tris[keep]
    # drop degenerate slivers (zero area after filtering)
    areas = np.abs(signed_areas(points, tris))
    tris = tris[areas > 1e-12 * max(areas.max(), 1.0)]

    # remove nodes not referenced by any kept triangle
    used = np.zeros(points.shape[0], dtype=bool)
    used[tris.reshape(-1)] = True
    remap = -np.ones(points.shape[0], dtype=np.int64)
    remap[used] = np.arange(int(used.sum()))
    kept_coords = points[used]
    kept_tris = remap[tris]

    # lattice-row node ordering: bin by lattice row, sort by x within rows.
    # Concentrates (col-row) offsets into a few dozen values so the solver's
    # banded (DIA/hybrid) SpMV applies instead of gather-ELL.
    dy = h * np.sqrt(3.0) / 2.0
    row_bin = np.round((kept_coords[:, 1] - kept_coords[:, 1].min()) / dy)
    order = np.lexsort((kept_coords[:, 0], row_bin))
    inv = np.empty(order.size, dtype=np.int64)
    inv[order] = np.arange(order.size)
    mesh = Mesh(
        coords=kept_coords[order],
        tris=inv[kept_tris].astype(np.int32),
    )
    mesh = normalize_orientation(mesh)
    mesh.validate()
    if mesh.num_elements == 0:
        raise MesherError("meshing produced no elements inside the domain")
    return mesh
