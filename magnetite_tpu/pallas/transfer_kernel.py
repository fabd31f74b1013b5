"""Pallas TPU kernel for the AMG level-0 tentative transfer pair.

The factored level-0 transfer (fem/amg.AMGSetup.fast0) reduced the V-cycle's
transfer cost to two band matvecs plus the tentative-prolongator applies

    prolong:   u0[:, i] = P0_i  @ ec[agg[i]]                (coarse -> fine)
    restrict:  rc[a]    = sum_{i in agg a} P0_i^T tmp[:, i]  (fine -> coarse)

whose XLA lowering is one unstructured gather each (`ec[agg]` and
`tmp[:, pt0_cols]`). Measured on v5e at 500k nodes those two gathers run at
~2.5 GB/s effective -- 4.5 ms of the 9.9 ms V-cycle, ~4x the Pallas band
matvec itself (scripts/profile_unstructured.py `transfer0_pair_ms`).

This kernel removes the gathers by exploiting the structure they have: node
numbering is spatially sorted (meshing/reorder.py geometric order -- the
same property the DIA bands ride) and aggregates are spatially compact
cells keyed row-major (fem/amg._aggregate_cells), so any BLOCK of `bf`
consecutive fine nodes references aggregate ids inside one bounded WINDOW
of the coarse vector. Per grid step the kernel streams that window (two
W-wide block operands selected by a scalar-prefetched per-block window
index) and applies the gather as a RADIX-FACTORED one-hot contraction:
with window-local ids lid and R = 128 (one vreg of lanes),

    onehot[j, i] = (lid[i] == j)  factors as  hi[j // R, i] * lo[j % R, i]

    P2[(q, k), i] = sum_r ec[k, q*R + r] * lo[r, i]    -- ONE [3*Q, R] @
                                                          [R, bf] MXU matmul
    g[k, i]       = sum_q hi[q, i] * P2[(q, k), i]     -- Q VPU FMAs

and the restriction is the exact transpose contraction. Products against
0/1 factors are exact in f32 and each (k, i) hits exactly one (q, r), so
both directions compute the same sums as the gather formulation and the
pair stays an exact adjoint: the V-cycle remains a valid SPD
preconditioner. Building the digit one-hots costs (R + 2W/R) * bf VPU
compares per block -- ~10x less than a direct [2W, bf] one-hot -- and the
lo digit spans exactly one vreg of lanes, so every reshape in the chain
keeps a 128-aligned minor dimension (sublane shuffles only, no
lane-crossing relayouts).

The per-node 2x3 tentative blocks ride along as six [bf] planes and fuse
into the same kernel, so each direction is one pallas_call streaming
p0 (24 B/node) and the fine vector exactly once.

Host-side `build_transfer_plan` validates the window bound (max aggregate
id range over any fine block) and emits the static plan; meshes whose
ordering breaks the bound (shuffled numbering with renumbering off) get no
plan and keep the XLA gather path.

Reference parity note: the reference has no multigrid at all -- its solver
is one dense-CSR CG loop (/root/reference/src/solver.rs:119-177); this
kernel accelerates the preconditioner that replaces brute-force iteration
counts on unstructured meshes.
Guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fine nodes per grid step; 8 x 128 vregs wide
_BF = 1024
# lo-digit radix: one vreg of lanes, keeps every reshape 128-aligned
_RADIX = 128
# windows above this mean the node ordering is not spatially coherent
# enough for bounded windows; callers fall back to the XLA gather path
_MAX_W = 4096
# VMEM cap for the restriction's resident coarse accumulator [3, n1p]
_MAX_N1P_BYTES = 6 * 1024 * 1024


@jax.tree_util.register_pytree_node_class
class TransferPlan:
    """Device arrays + static geometry for the kernel pair, riding jit
    argument pytrees (static fields live in the treedef, like
    fem/amg.BandedOp).

    children: lid [1, n0p] i32 (aggregate id relative to the block's
    window base), kwin [nblk] i32 (window block index per grid step), p06
    [6, n0p] f32 (tentative blocks as planes: p06[d*3+k, i] = P0_i[d, k]).
    static: (w, n0, n0p, n1p, interpret).
    """

    __slots__ = ("lid", "kwin", "p06", "w", "n0", "n0p", "n1p", "interpret")

    def __init__(self, lid, kwin, p06, w, n0, n0p, n1p, interpret=False):
        self.lid, self.kwin, self.p06 = lid, kwin, p06
        self.w, self.n0, self.n0p, self.n1p = (
            int(w), int(n0), int(n0p), int(n1p),
        )
        self.interpret = bool(interpret)

    def tree_flatten(self):
        return (self.lid, self.kwin, self.p06), (
            self.w, self.n0, self.n0p, self.n1p, self.interpret,
        )

    @classmethod
    def tree_unflatten(cls, static, children):
        obj = cls.__new__(cls)
        obj.lid, obj.kwin, obj.p06 = children
        obj.w, obj.n0, obj.n0p, obj.n1p, obj.interpret = static
        return obj


def transfer_plan_host(agg: np.ndarray, n1: int):
    """Window geometry from the aggregation map, or None when inapplicable.

    Returns (lid [n0p] i64-relative ids, kwin [nblk] i32, w, n0p, n1p).
    Applicability: every block of _BF consecutive fine nodes must reference
    aggregate ids spanning at most one 2W window with W <= _MAX_W (holds
    for spatially sorted numberings)."""
    n0 = int(agg.shape[0])
    if n0 < 2 * _BF or n1 < 2:
        return None
    nblk = -(-n0 // _BF)
    n0p = nblk * _BF
    agg_pad = np.empty(n0p, dtype=np.int64)
    agg_pad[:n0] = agg
    agg_pad[n0:] = agg[n0 - 1]  # padding reuses the last id (p0 rows are 0)
    blocks = agg_pad.reshape(nblk, _BF)
    lo = blocks.min(axis=1)
    hi = blocks.max(axis=1)
    span = int((hi - lo).max())
    # hi - (lo // w) * w <= 2w - 1 is guaranteed by w >= span + 1
    w = max(-(-(span + 1) // _RADIX) * _RADIX, _RADIX)
    if w > _MAX_W:
        return None
    kwin = (lo // w).astype(np.int32)
    n1p = int(kwin.max() + 2) * w
    if 3 * n1p * 4 > _MAX_N1P_BYTES:
        return None
    lid = (agg_pad - kwin.repeat(_BF).astype(np.int64) * w).astype(np.int32)
    return lid, kwin, w, n0p, n1p


def build_transfer_plan(
    agg: np.ndarray, p0_block: np.ndarray, n1: int, interpret: bool = False
):
    """Host plan (the children are plain host arrays; callers upload them
    through their own packing layer). None when inapplicable."""
    geom = transfer_plan_host(agg, n1)
    if geom is None:
        return None
    lid, kwin, w, n0p, n1p = geom
    n0 = int(agg.shape[0])
    p06 = np.zeros((6, n0p), dtype=np.float32)
    pb = np.asarray(p0_block, dtype=np.float32)
    for d in range(2):
        for k in range(3):
            p06[d * 3 + k, :n0] = pb[:, d, k]
    return TransferPlan(
        lid=lid.reshape(1, n0p),
        kwin=kwin,
        p06=p06,
        w=w,
        n0=n0,
        n0p=n0p,
        n1p=n1p,
        interpret=interpret,
    )


def _digit_onehots(lid_row, q2: int):
    """lid [1, bf] i32 -> (hi [q2, bf], lo [_RADIX, bf]) f32 digit one-hots
    for window-local ids in [0, q2 * _RADIX)."""
    bf = lid_row.shape[-1]
    hi_digit = jax.lax.div(lid_row, jnp.int32(_RADIX))  # [1, bf]
    lo_digit = jax.lax.rem(lid_row, jnp.int32(_RADIX))
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (q2, bf), 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (_RADIX, bf), 0)
    hi = (q_iota == hi_digit).astype(jnp.float32)
    lo = (r_iota == lo_digit).astype(jnp.float32)
    return hi, lo


def _prolong_kernel(
    kwin_ref, ec0_ref, ec1_ref, lid_ref, p06_ref, out_ref, *, w: int
):
    del kwin_ref  # consumed by the index maps
    q2 = 2 * w // _RADIX
    ec = jnp.concatenate([ec0_ref[:], ec1_ref[:]], axis=1)  # [3, 2w]
    # ec_flat[(q, k), r] = ec[k, q*R + r]; minor dim stays one lane vreg
    ec_flat = (
        ec.reshape(3, q2, _RADIX).transpose(1, 0, 2).reshape(3 * q2, _RADIX)
    )
    hi, lo = _digit_onehots(lid_ref[:], q2)
    # full f32: the default MXU path rounds operands to bf16, which would
    # perturb P and P^T differently per apply and break the exact adjoint
    p2 = jnp.dot(
        ec_flat, lo,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [(q, k), bf]
    bf = p2.shape[-1]
    g = jnp.sum(
        p2.reshape(q2, 3, bf) * hi[:, None, :], axis=0
    )  # [3, bf] = ec[:, lid]
    p = p06_ref[:]
    out_ref[:] = jnp.concatenate(
        [
            jnp.sum(p[0:3] * g, axis=0, keepdims=True),
            jnp.sum(p[3:6] * g, axis=0, keepdims=True),
        ],
        axis=0,
    )


def _restrict_kernel(kwin_ref, tmp_ref, lid_ref, p06_ref, rc_ref, *, w: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        rc_ref[:] = jnp.zeros_like(rc_ref)

    q2 = 2 * w // _RADIX
    p = p06_ref[:]
    t = tmp_ref[:]
    # y[k, i] = P0_i^T tmp = p[k] * t[0] + p[3+k] * t[1]
    y = p[0:3] * t[0:1] + p[3:6] * t[1:2]  # [3, bf]
    hi, lo = _digit_onehots(lid_ref[:], q2)
    yh = (hi[:, None, :] * y[None, :, :]).reshape(3 * q2, -1)  # [(q, k), bf]
    rc2 = jax.lax.dot_general(
        yh, lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [(q, k), r]
    rcw = (
        rc2.reshape(q2, 3, _RADIX)
        .transpose(1, 0, 2)
        .reshape(3, 2 * w)
    )  # rcw[k, q*R + r]
    off = pl.multiple_of(kwin_ref[b] * w, _RADIX)
    rc_ref[:, pl.ds(off, 2 * w)] += rcw


@partial(jax.jit, static_argnames=("w", "n0", "n0p", "n1p", "interpret"))
def _apply_prolong(lid, kwin, p06, ec_pad, w, n0, n0p, n1p, interpret=False):
    """ec_pad [3, n1p] f32 -> u0 [2, n0] f32 (= P0 ec, band layout)."""
    nblk = n0p // _BF
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(
                (3, w), lambda b, k: (k[b] * 0, k[b]), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, w), lambda b, k: (k[b] * 0, k[b] + 1), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _BF), lambda b, k: (b * 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (6, _BF), lambda b, k: (b * 0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, _BF), lambda b, k: (b * 0, b), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        partial(_prolong_kernel, w=w),
        out_shape=jax.ShapeDtypeStruct((2, n0p), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(kwin, ec_pad, ec_pad, lid, p06)
    return out[:, :n0]


@partial(jax.jit, static_argnames=("w", "n0", "n0p", "n1p", "interpret"))
def _apply_restrict(lid, kwin, p06, tmp_pad, w, n0, n0p, n1p, interpret=False):
    """tmp_pad [2, n0p] f32 -> rc [3, n1p] f32 (= P0^T tmp, coarse-major)."""
    nblk = n0p // _BF
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(
                (2, _BF), lambda b, k: (b * 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _BF), lambda b, k: (b * 0, b), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (6, _BF), lambda b, k: (b * 0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, n1p), lambda b, k: (b * 0, b * 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        partial(_restrict_kernel, w=w),
        out_shape=jax.ShapeDtypeStruct((3, n1p), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(kwin, tmp_pad, lid, p06)


def make_plan_transfers(plan: TransferPlan, n1: int, interpret=None):
    """(prolong0, restrict0) closures over a TransferPlan.

    prolong0(ec [n1, 3] f32) -> [2, n0] f32   (P0 ec, band layout)
    restrict0(tmp [2, n0] f32) -> [n1, 3] f32 (P0^T tmp)
    """
    w, n0, n0p, n1p = plan.w, plan.n0, plan.n0p, plan.n1p
    if interpret is None:
        interpret = plan.interpret

    def prolong0(ec):
        ec_pad = jnp.pad(ec.T, ((0, 0), (0, n1p - ec.shape[0])))
        return _apply_prolong(
            plan.lid, plan.kwin, plan.p06, ec_pad, w, n0, n0p, n1p,
            interpret=interpret,
        )

    def restrict0(tmp):
        tmp_pad = jnp.pad(tmp, ((0, 0), (0, n0p - tmp.shape[1])))
        rc = _apply_restrict(
            plan.lid, plan.kwin, plan.p06, tmp_pad, w, n0, n0p, n1p,
            interpret=interpret,
        )
        return rc[:, :n1].T

    return prolong0, restrict0
