"""Pallas windowed-one-hot AMG transfer kernel (pallas/transfer_kernel.py).

Interpreter-mode parity against the gather formulation the kernel replaces,
adjointness of the pair (the SPD-preconditioner contract), plan
applicability gating, and full V-cycle equivalence through
fem/amg.make_amg_preconditioner. The real-hardware timing/engagement checks
live in bench.py and scripts/profile_unstructured.py (the kernel itself is
exercised on TPU there); these tests pin the math.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from magnetite_tpu.bc import apply_boundary_conditions
from magnetite_tpu.config import BoundaryRegion, ModelMetadata
from magnetite_tpu.fem.amg import (
    amg_device_arrays,
    build_amg_setup,
    make_amg_preconditioner,
)
from magnetite_tpu.meshing.delaunay_backend import triangulate
from magnetite_tpu.pallas.transfer_kernel import (
    _BF,
    build_transfer_plan,
    make_plan_transfers,
    transfer_plan_host,
)
from tests.conftest import make_rule


def _synthetic_aggregation(n_rows=40, row_len=130):
    """Row-major node ordering + row-major 3x3 cell aggregation -- the
    structure fem/amg._aggregate_cells produces on geometrically sorted
    meshes (what makes the window bound hold)."""
    n0 = n_rows * row_len - 17
    rows_i = np.arange(n0) // row_len
    cols_i = np.arange(n0) % row_len
    ncx = -(-row_len // 3)
    key = (rows_i // 3) * ncx + (cols_i // 3)
    _, agg = np.unique(key, return_inverse=True)
    return agg, int(agg.max()) + 1


def test_plan_parity_and_adjoint_interpret():
    agg, n1 = _synthetic_aggregation()
    n0 = agg.shape[0]
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((n0, 2, 3)).astype(np.float32)

    plan = build_transfer_plan(agg, p0, n1, interpret=True)
    assert plan is not None
    assert plan.w % 128 == 0 and plan.n0p % _BF == 0

    prolong0, restrict0 = make_plan_transfers(plan, n1)
    ec = rng.standard_normal((n1, 3)).astype(np.float32)
    tmp = rng.standard_normal((2, n0)).astype(np.float32)

    uf_ref = np.einsum("nij,nj->in", p0, ec[agg])
    rc_ref = np.zeros((n1, 3))
    np.add.at(rc_ref, agg, np.einsum("nij,in->nj", p0, tmp))

    uf = np.asarray(prolong0(jnp.asarray(ec)))
    rc = np.asarray(restrict0(jnp.asarray(tmp)))
    np.testing.assert_allclose(
        uf, uf_ref, atol=2e-6 * np.abs(uf_ref).max()
    )
    np.testing.assert_allclose(
        rc, rc_ref, atol=2e-6 * np.abs(rc_ref).max()
    )

    # exact-adjoint contract: <P0 ec, tmp> == <ec, P0^T tmp>; CG with a
    # V-cycle preconditioner needs the pair symmetric
    lhs = float(np.sum(uf * np.asarray(tmp)))
    rhs = float(np.sum(np.asarray(ec) * rc))
    assert abs(lhs - rhs) <= 1e-5 * max(abs(lhs), abs(rhs), 1e-30)


def test_plan_rejects_incoherent_ordering():
    # big enough that a shuffled ordering cannot hide inside one window
    # (n1 must exceed the window cap for the bound to be violable)
    agg, n1 = _synthetic_aggregation(n_rows=300, row_len=400)
    assert n1 > 4096
    rng = np.random.default_rng(1)
    shuffled = agg[rng.permutation(agg.shape[0])]
    # a shuffled numbering breaks the bounded-window property
    assert transfer_plan_host(shuffled, n1) is None
    # the coherent ordering of the same problem is accepted
    assert transfer_plan_host(agg, n1) is not None
    # tiny problems are rejected too (the gather path costs nothing there)
    assert transfer_plan_host(agg[: _BF], n1) is None


def test_vcycle_with_plan_matches_gather_path():
    """make_amg_preconditioner must produce the same V-cycle through the
    kernel plan (interpret mode) as through the XLA gathers -- identical
    math up to f32 summation order."""
    from magnetite_tpu.fem.dia import (
        assemble_dia,
        block_jacobi_inverse_t,
        build_dia_structure,
        dia_diag_blocks,
        make_dia_operator,
    )
    from magnetite_tpu.fem.element import element_stiffness_matrices

    outer = np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [0.0, 1.0]])
    hole = np.array([[1.3, 0.35], [1.7, 0.35], [1.7, 0.65], [1.3, 0.65]])
    mesh = triangulate([outer, hole], 0.0, 0.03)
    assert mesh.num_nodes >= 2 * _BF  # plan applicability floor
    rules = (
        make_rule("left", BoundaryRegion(x_max=1e-6), ux=0.0, uy=0.0),
        make_rule("right", BoundaryRegion(x_min=3.0 - 1e-6), ux=0.01, fy=0.0),
    )
    bca = apply_boundary_conditions(mesh.coords, rules)
    md = ModelMetadata(69e9, 0.33, 0.5, 0.0, 0.03)
    free = (~bca.u_known).astype(np.float64)
    setup = build_amg_setup(
        mesh.coords, mesh.tris, md.youngs_modulus, md.poisson_ratio,
        md.part_thickness, free,
    )
    assert setup.fast0 is not None and setup.transfers

    amg_plan = amg_device_arrays(setup, jnp.float32, transfer_plan="interpret")
    amg_gather = amg_device_arrays(setup, jnp.float32, transfer_plan="off")
    assert len(amg_plan) == 6 and amg_plan[5]
    assert amg_gather[5] == ()
    # the plan upload drops the gather-form arrays
    assert amg_plan[3][0].size == 0 and amg_gather[3][0].size > 0

    n = mesh.num_nodes
    s = build_dia_structure(mesh.tris, n)
    ke = element_stiffness_matrices(
        jnp.asarray(mesh.coords, jnp.float32), jnp.asarray(mesh.tris),
        jnp.float32(md.youngs_modulus), jnp.float32(md.poisson_ratio),
        jnp.float32(md.part_thickness),
    )
    bands = assemble_dia(ke, s.slot_ids, n, s.n_diags)
    offsets = tuple(int(o) for o in s.offsets)
    matvec = make_dia_operator(bands, offsets)
    free_t = jnp.asarray(free.T, jnp.float32)

    def op(v):
        return free_t * matvec(free_t * v) + (1.0 - free_t) * v

    def a_op(v):
        return free_t * matvec(free_t * v)

    jac0 = block_jacobi_inverse_t(dia_diag_blocks(bands, offsets), free_t)

    m_plan = make_amg_preconditioner(
        amg_plan, op, jac0, layout="t", a_op=a_op
    )
    m_gather = make_amg_preconditioner(
        amg_gather, op, jac0, layout="t", a_op=a_op
    )
    rng = np.random.default_rng(2)
    r = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    zp = np.asarray(m_plan(r))
    zg = np.asarray(m_gather(r))
    np.testing.assert_allclose(zp, zg, atol=5e-5 * np.abs(zg).max())

    # symmetry of the full V-cycle through the kernel path
    r2 = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    lhs = float(jnp.sum(jnp.asarray(zp) * r2))
    rhs = float(jnp.sum(m_plan(r2) * r))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), abs(rhs))


def test_tl_layout_requires_gather_arrays():
    """A plan-bearing upload cannot serve the lane-batched sweep layout;
    the error must say how to fix it."""
    agg, n1 = _synthetic_aggregation()
    n0 = agg.shape[0]
    rng = np.random.default_rng(3)
    p0 = rng.standard_normal((n0, 2, 3)).astype(np.float32)
    plan = build_transfer_plan(agg, p0, n1, interpret=True)
    z = jnp.zeros((0,), jnp.int32)
    zv = jnp.zeros((0,), jnp.float32)
    fake = (
        ((z, zv, z, zv),),  # one placeholder transfer level
        ((jnp.zeros((n1, 1), jnp.int32), jnp.zeros((n1, 1, 3, 3), jnp.float32),
          jnp.zeros((n1, 3, 3), jnp.float32)),),
        (),
        (z, zv, z, zv, jnp.zeros((n0, 2, 2), jnp.float32)),
        (None,),
        (plan,),
    )
    with pytest.raises(ValueError, match="transfer_plan='off'"):
        make_amg_preconditioner(
            fake, lambda v: v, lambda v: v, layout="tl", a_op=lambda v: v
        )
