"""Preconditioned conjugate gradient, jit/vmap-friendly.

The reference runs unpreconditioned CG from the argmin crate with an absolute
residual-norm stop of 1e-4 and a 1e7 iteration cap (src/solver.rs:17-19,
119-177). Here: Jacobi/block-Jacobi PCG in a `lax.while_loop` -- one compiled
loop on device, no host round-trips per iteration, usable under `vmap` for
batched design sweeps and under `shard_map` for multi-chip solves.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

MatVec = Callable[[jax.Array], jax.Array]


class CGResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array  # int32 scalar
    residual_norm: jax.Array  # final ||r||_2
    converged: jax.Array  # bool scalar
    # per-iteration ||r|| trace, shape [history] (0-size when not requested);
    # entries past `iterations` keep the init value 0
    history: jax.Array = None


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(a * b)


def default_progress_printer(k, rnorm, bnorm):
    """Host-side observer (the indicatif-observer analog of reference
    src/solver.rs:40-107): one log line per reporting interval."""
    print(
        f"info: cg iteration {int(k)}: residual {float(rnorm):.6e} "
        f"(relative {float(rnorm) / max(float(bnorm), 1e-300):.3e})",
        flush=True,
    )


def pcg(
    matvec: MatVec,
    b: jax.Array,
    *,
    preconditioner: Optional[MatVec] = None,
    x0: Optional[jax.Array] = None,
    rtol: float = 1e-10,
    atol: float = 0.0,
    maxiter: int = 10_000_000,
    dot: Callable[[jax.Array, jax.Array], jax.Array] = _dot,
    history: int = 0,
    progress_every: int = 0,
    progress_callback: Callable = None,
) -> CGResult:
    """Solve A x = b for SPD A.

    Stops when ||r|| <= max(rtol * ||b||, atol). `dot` is injectable so the
    sharded solver can psum partial reductions across the device mesh.
    `history` > 0 records ||r|| for the first `history` iterations.
    `progress_every` > 0 streams (iter, ||r||, ||b||) to `progress_callback`
    (default: a log-line printer) every N iterations via jax.debug.callback
    -- the device loop does not block on the host.
    """
    m = preconditioner if preconditioner is not None else (lambda r: r)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = m(r)
    p = z
    rz = dot(r, z)
    rnorm2 = dot(r, r)
    bnorm = jnp.sqrt(dot(b, b))
    threshold = jnp.maximum(rtol * bnorm, atol)
    thresh2 = threshold * threshold
    hist0 = jnp.zeros((history,), dtype=b.dtype)
    callback = (
        progress_callback if progress_callback is not None
        else default_progress_printer
    )

    def cond(state):
        _, _, _, _, rnorm2, k, _ = state
        return (rnorm2 > thresh2) & (k < maxiter)

    def body(state):
        x, r, p, rz, _, k, hist = state
        ap = matvec(p)
        pap = dot(p, ap)
        # Guard against breakdown (pap == 0 on an exactly-converged system).
        alpha = jnp.where(pap > 0, rz / jnp.where(pap == 0, 1.0, pap), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = m(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        rnorm2 = dot(r, r)
        if history:
            # no write once k >= history (arange never matches): the trace
            # holds the FIRST `history` residuals, per the CGResult contract
            hist = jnp.where(
                jnp.arange(history) == k, jnp.sqrt(rnorm2), hist
            )
        if progress_every:
            jax.lax.cond(
                (k + 1) % progress_every == 0,
                lambda: jax.debug.callback(
                    callback, k + 1, jnp.sqrt(rnorm2), bnorm
                ),
                lambda: None,
            )
        return x, r, p, rz_new, rnorm2, k + 1, hist

    x, r, p, rz, rnorm2, k, hist = jax.lax.while_loop(
        cond, body, (x, r, p, rz, rnorm2, jnp.int32(0), hist0)
    )
    rnorm = jnp.sqrt(rnorm2)
    return CGResult(
        x=x,
        iterations=k,
        residual_norm=rnorm,
        converged=rnorm2 <= thresh2,
        history=hist,
    )


def pcg_fixed_iterations(
    matvec: MatVec,
    b: jax.Array,
    *,
    preconditioner: Optional[MatVec] = None,
    x0: Optional[jax.Array] = None,
    iterations: int = 100,
    dot: Callable[[jax.Array, jax.Array], jax.Array] = _dot,
) -> CGResult:
    """Fixed-iteration PCG via `lax.scan` (fully unrollable/differentiable;
    the right shape for vmapped sweeps where per-sample stopping would
    serialize on the slowest sample anyway)."""
    m = preconditioner if preconditioner is not None else (lambda r: r)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = m(r)
    p = z
    rz = dot(r, z)

    def step(state, _):
        x, r, p, rz = state
        ap = matvec(p)
        pap = dot(p, ap)
        alpha = jnp.where(pap > 0, rz / jnp.where(pap == 0, 1.0, pap), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = m(r)
        rz_new = dot(r, z)
        beta = jnp.where(rz == 0, 0.0, rz_new / jnp.where(rz == 0, 1.0, rz))
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, r, p, rz), _ = jax.lax.scan(step, (x, r, p, rz), None, length=iterations)
    # TRUE final residual, not the recursion's r (which keeps shrinking
    # below the working precision's stagnation level and would overstate
    # convergence by orders of magnitude in f32 sweeps)
    r_true = b - matvec(x)
    rnorm = jnp.sqrt(dot(r_true, r_true))
    return CGResult(
        x=x,
        iterations=jnp.int32(iterations),
        residual_norm=rnorm,
        converged=jnp.bool_(True),
    )
