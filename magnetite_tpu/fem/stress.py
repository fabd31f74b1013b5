"""Element stress recovery, vmapped over all elements.

The reference loops elements recomputing D and B per element and reduces the
stress tensor to a scalar sign*sqrt(sx^2+sy^2) with sign = -1 iff
sx+sy < 1.0 (src/solver.rs:496-535) -- note tau_xy is excluded and the sign
threshold is 1.0, not 0.0. We reproduce that formula (default, for output
parity) and additionally offer true plane-stress von Mises.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .element import (
    element_areas,
    gather_element_coords,
    strain_displacement_matrices,
    stress_strain_matrix,
)


def element_stress_tensors(
    coords: jax.Array,
    tris: jax.Array,
    u: jax.Array,
    youngs_modulus,
    poisson_ratio,
) -> jax.Array:
    """sigma [E,3] = D @ B @ u_e  (components [sx, sy, txy])."""
    ecoords = gather_element_coords(coords, tris)
    areas = element_areas(ecoords)
    b = strain_displacement_matrices(ecoords, areas)  # [E,3,6]
    d = stress_strain_matrix(youngs_modulus, poisson_ratio, dtype=coords.dtype)
    ue = u[tris].reshape(tris.shape[0], 6)  # [E,6] interleaved [x0,y0,x1,...]
    strain = jnp.einsum("erj,ej->er", b, ue, precision="highest")  # [E,3]
    return jnp.einsum("rs,es->er", d, strain, precision="highest")


def scalar_stress(sigma: jax.Array, sign_threshold: float = 1.0) -> jax.Array:
    """The reference's scalar 'stress': sign * sqrt(sx^2 + sy^2).

    sign = -1 iff sx + sy < sign_threshold (reference uses 1.0,
    src/solver.rs:524-530; pass 0.0 for the physically-sensible rule).
    """
    sx, sy = sigma[:, 0], sigma[:, 1]
    mag = jnp.sqrt(sx * sx + sy * sy)
    sign = jnp.where(sx + sy < sign_threshold, -1.0, 1.0)
    return sign * mag


def von_mises_stress(sigma: jax.Array) -> jax.Array:
    """True plane-stress von Mises: sqrt(sx^2 - sx sy + sy^2 + 3 txy^2)."""
    sx, sy, txy = sigma[:, 0], sigma[:, 1], sigma[:, 2]
    return jnp.sqrt(sx * sx - sx * sy + sy * sy + 3.0 * txy * txy)
