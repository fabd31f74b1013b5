"""4096-variant design sweep in one batched solve.

Vary the prescribed pull displacement and the Young's-modulus scale across
4096 variants of a tensile plate; all variants solve concurrently as TPU
lanes, preconditioned by ONE shared multigrid hierarchy (~2300 solves/s on
one v5e chip). Run:

    python examples/design_sweep.py [n_variants]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np

from magnetite_tpu.config import ModelMetadata
from magnetite_tpu.meshing.generators import rect_mesh, tensile_bcs_for_rect
from magnetite_tpu.parallel.sweep import sweep_solve


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    mesh = rect_mesh(64, 32, width=2.0)
    base = tensile_bcs_for_rect(mesh.coords, pull=0.01)
    metadata = ModelMetadata(
        youngs_modulus=69e9, poisson_ratio=0.33, part_thickness=0.5,
        characteristic_length_min=0.0, characteristic_length_max=0.05,
    )

    rng = np.random.default_rng(0)
    pulls = rng.uniform(0.005, 0.02, b).astype(np.float32)
    k_scales = rng.uniform(0.5, 2.0, b)  # Young's modulus scale per variant
    right = np.isclose(mesh.coords[:, 0], 2.0)
    u_values = np.tile(base.u_value[None], (b, 1, 1)).astype(np.float32)
    u_values[:, right, 0] = pulls[:, None]
    f_values = np.zeros((b, mesh.num_nodes, 2), dtype=np.float32)

    result = sweep_solve(  # warm-up (compiles)
        mesh, base, metadata, u_values, f_values, k_scales, iterations=20
    )
    t0 = time.perf_counter()
    result = sweep_solve(
        mesh, base, metadata, u_values, f_values, k_scales, iterations=20
    )
    rel = np.asarray(result.residual_norm) / np.asarray(result.rhs_norm)
    t = time.perf_counter() - t0

    print(f"{b} variants in {t:.3f}s -> {b / t:.0f} solves/s")
    print(f"worst relative residual: {rel.max():.2e}")
    vm_max = np.asarray(result.von_mises).max(axis=1)  # [B]
    worst = int(np.argmax(vm_max))
    print(f"highest-stress variant: pull={pulls[worst]:.4f}, "
          f"k_scale={k_scales[worst]:.2f}, "
          f"max von Mises={vm_max[worst]:.3e}")


if __name__ == "__main__":
    main()
