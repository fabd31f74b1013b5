"""Independent dense NumPy oracle for parity testing.

A deliberately simple, separate implementation of the same plane-stress CST
formulation the reference implements in Rust (src/solver.rs), used as the
golden reference in tests: dense global matrix, boolean-index partitioning
(the reference's known/unknown row/col scheme, src/solver.rs:365-404), and a
direct `numpy.linalg.solve`. The JAX pipeline must agree with this to ~1e-10
on small meshes; agreement of two independent code paths stands in for the
Rust binary, which cannot run in this environment (no cargo toolchain).

Not a performance path -- O(N^2) memory by construction, like the reference.
"""

from __future__ import annotations

import numpy as np

from .bc import BCArrays
from .config import ModelMetadata


def d_matrix(e: float, nu: float) -> np.ndarray:
    return (e / (1.0 - nu * nu)) * np.array(
        [[1.0, nu, 0.0], [nu, 1.0, 0.0], [0.0, 0.0, (1.0 - nu) / 2.0]]
    )


def element_area(p: np.ndarray) -> float:
    """p [3,2] -> signed area."""
    return 0.5 * (
        p[0, 0] * (p[1, 1] - p[2, 1])
        + p[1, 0] * (p[2, 1] - p[0, 1])
        + p[2, 0] * (p[0, 1] - p[1, 1])
    )


def b_matrix(p: np.ndarray, area: float) -> np.ndarray:
    """p [3,2] -> B [3,6]."""
    beta = np.array([p[1, 1] - p[2, 1], p[2, 1] - p[0, 1], p[0, 1] - p[1, 1]])
    gamma = np.array([p[2, 0] - p[1, 0], p[0, 0] - p[2, 0], p[1, 0] - p[0, 0]])
    b = np.zeros((3, 6))
    b[0, 0::2] = beta
    b[1, 1::2] = gamma
    b[2, 0::2] = gamma
    b[2, 1::2] = beta
    return b / (2.0 * area)


def global_stiffness(
    coords: np.ndarray, tris: np.ndarray, e: float, nu: float, t: float
) -> np.ndarray:
    """Dense (2N)x(2N) global stiffness matrix."""
    n = coords.shape[0]
    k = np.zeros((2 * n, 2 * n))
    d = d_matrix(e, nu)
    for tri in tris:
        p = coords[tri]
        area = element_area(p)
        b = b_matrix(p, area)
        ke = b.T @ d @ b * area * t
        dof = np.empty(6, dtype=np.int64)
        dof[0::2] = 2 * np.asarray(tri)
        dof[1::2] = 2 * np.asarray(tri) + 1
        k[np.ix_(dof, dof)] += ke
    return k


def solve(
    coords: np.ndarray,
    tris: np.ndarray,
    bca: BCArrays,
    metadata: ModelMetadata,
):
    """Partition-and-solve exactly as the reference does.

    Returns (u [N,2], f [N,2], sigma [E,3]).
    """
    n = coords.shape[0]
    k = global_stiffness(
        coords,
        tris,
        metadata.youngs_modulus,
        metadata.poisson_ratio,
        metadata.part_thickness,
    )
    u_known = bca.u_known.reshape(-1)  # [2N]
    u_val = bca.u_value.reshape(-1)
    f_val = bca.f_value.reshape(-1)

    free = ~u_known
    # Reduced system: rows/cols of unknown displacements (== rows of known
    # forces, reference src/solver.rs:365-404).
    a = k[np.ix_(free, free)]
    rhs = f_val[free] - k[np.ix_(free, u_known)] @ u_val[u_known]
    u = u_val.copy()
    u[free] = np.linalg.solve(a, rhs)

    f = f_val.copy()
    f[u_known] = (k @ u)[u_known]

    d = d_matrix(metadata.youngs_modulus, metadata.poisson_ratio)
    sigma = np.zeros((tris.shape[0], 3))
    for i, tri in enumerate(tris):
        p = coords[tri]
        area = element_area(p)
        b = b_matrix(p, area)
        dof = np.empty(6, dtype=np.int64)
        dof[0::2] = 2 * np.asarray(tri)
        dof[1::2] = 2 * np.asarray(tri) + 1
        sigma[i] = d @ b @ u[dof]

    return u.reshape(-1, 2), f.reshape(-1, 2), sigma


def scalar_stress(sigma: np.ndarray, sign_threshold: float = 1.0) -> np.ndarray:
    """Reference scalar stress (src/solver.rs:524-533)."""
    mag = np.sqrt(sigma[:, 0] ** 2 + sigma[:, 1] ** 2)
    sign = np.where(sigma[:, 0] + sigma[:, 1] < sign_threshold, -1.0, 1.0)
    return sign * mag
