"""Case checkpoint/resume: persist mesh + BCs (+ sparsity structure) as npz.

The reference deletes every intermediate artifact immediately
(/root/reference/src/mesher.rs:516,701), so re-running boundary conditions
on a large mesh repeats the whole meshing pipeline. Here a solved-ready
case (mesh arrays, BC masks, optionally the block-ELL structure whose host
build is the expensive part for unstructured meshes) round-trips through
one compressed npz, so repeat runs skip meshing entirely:

    save_case("case.npz", mesh, bca, metadata=md, structure=st)
    mesh, bca, md, st = load_case("case.npz")

CLI: `--save-case PATH` after meshing, `--load-case PATH` instead of
geometry files.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .bc import BCArrays
from .config import ModelMetadata
from .errors import InputError
from .fem.assembly import EllStructure
from .meshing.core import Mesh

_FORMAT_VERSION = 1


def save_case(
    path: str,
    mesh: Mesh,
    bca: BCArrays,
    metadata: Optional[ModelMetadata] = None,
    structure: Optional[EllStructure] = None,
) -> None:
    data = {
        "format_version": np.int64(_FORMAT_VERSION),
        "coords": mesh.coords,
        "tris": mesh.tris,
        "grid_shape": np.asarray(
            mesh.grid_shape if mesh.grid_shape is not None else (-1, -1),
            dtype=np.int64,
        ),
        "wrap_cols": np.bool_(mesh.wrap_cols),
        "grid_local": np.bool_(mesh.grid_local),
        "canonical_grid": np.bool_(mesh.canonical_grid),
        "u_known": bca.u_known,
        "u_value": bca.u_value,
        "f_value": bca.f_value,
    }
    if metadata is not None:
        data["metadata"] = np.asarray(
            [
                metadata.youngs_modulus,
                metadata.poisson_ratio,
                metadata.part_thickness,
                metadata.characteristic_length_min,
                metadata.characteristic_length_max,
            ],
            dtype=np.float64,
        )
    if structure is not None:
        data["ell_cols"] = structure.cols
        data["ell_slot_ids"] = structure.slot_ids
    np.savez_compressed(path, **data)


def save_amg(path: str, setup) -> None:
    """Persist a fem/amg.AMGSetup (the ~50 s-at-1M host hierarchy build)
    next to its case checkpoint; CLI --save-case does this automatically
    when the solve used the AMG preconditioner."""
    from .fem.amg import setup_to_arrays

    np.savez_compressed(
        path, format_version=np.int64(_FORMAT_VERSION), **setup_to_arrays(setup)
    )


def load_amg(path: str):
    """Load an AMGSetup saved by `save_amg`."""
    from .fem.amg import setup_from_arrays

    try:
        with np.load(path) as z:
            data = {k: z[k] for k in z.files}
    except Exception as err:
        raise InputError(f"cannot read AMG cache {path}: {err}") from None
    version = int(data.get("format_version", -1))
    if version != _FORMAT_VERSION:
        raise InputError(
            f"AMG cache {path} has format version {version}, "
            f"expected {_FORMAT_VERSION}"
        )
    return setup_from_arrays(data)


def load_case(
    path: str,
) -> tuple[Mesh, BCArrays, Optional[ModelMetadata], Optional[EllStructure]]:
    try:
        with np.load(path) as z:
            data = {k: z[k] for k in z.files}
    except Exception as err:
        raise InputError(f"cannot read case file {path}: {err}") from None
    version = int(data.get("format_version", -1))
    if version != _FORMAT_VERSION:
        raise InputError(
            f"case file {path} has format version {version}, "
            f"expected {_FORMAT_VERSION}"
        )
    gs = data["grid_shape"]
    mesh = Mesh(
        coords=data["coords"],
        tris=data["tris"],
        grid_shape=None if gs[0] < 0 else (int(gs[0]), int(gs[1])),
        wrap_cols=bool(data["wrap_cols"]),
        grid_local=bool(data["grid_local"]),
        # absent in pre-round-3 checkpoints: default False (safe -- only
        # disables the scatter-free assembly / stencil-sweep fast paths)
        canonical_grid=bool(data.get("canonical_grid", False)),
    )
    mesh.validate()
    bca = BCArrays(
        u_known=data["u_known"],
        u_value=data["u_value"],
        f_value=data["f_value"],
    )
    metadata = None
    if "metadata" in data:
        m = data["metadata"]
        metadata = ModelMetadata(
            youngs_modulus=float(m[0]),
            poisson_ratio=float(m[1]),
            part_thickness=float(m[2]),
            characteristic_length_min=float(m[3]),
            characteristic_length_max=float(m[4]),
        )
    structure = None
    if "ell_cols" in data:
        cols = data["ell_cols"]
        structure = EllStructure(
            cols=cols,
            slot_ids=data["ell_slot_ids"],
            n_nodes=int(cols.shape[0]),
            width=int(cols.shape[1]),
        )
    return mesh, bca, metadata, structure
