"""Preconditioned conjugate gradients as one fused lax.while_loop.

Replaces NGSolve's CGSolver (used for the inner mstar / projection inverses,
/root/reference/templates/NavierStokesSIMPLE_iterative.py:93,128).  The whole
iteration runs on device with fixed shapes; the error history is written into
a preallocated buffer so convergence curves can be reported without host
round-trips inside the loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..linalg.pytree import taxpy, tdot, tsub, tzeros_like


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "iterations", "errors", "err0", "converged"],
    meta_fields=[],
)
@dataclass
class SolverResult:
    """x: solution pytree; iterations: int scalar; errors: (maxsteps+1,)
    relative-error history (NaN past convergence); err0: initial error;
    converged: bool scalar (status contract of SURVEY.md section 5)."""

    x: object
    iterations: jax.Array
    errors: jax.Array
    err0: jax.Array
    converged: jax.Array


def cg(A, b, pre=None, x0=None, tol: float = 1e-8, maxsteps: int = 200,
       rel_err: bool = True) -> SolverResult:
    """Solve A x = b with PCG; A, pre are callables on pytree vectors."""
    if pre is None:
        pre = lambda v: v
    if x0 is None:
        x0 = tzeros_like(b)
        r = b
    else:
        r = tsub(b, A(x0))

    z = pre(r)
    rho = tdot(r, z)
    dtype = rho.dtype
    err0 = jnp.sqrt(jnp.abs(rho))
    errors = jnp.full(maxsteps + 1, jnp.nan, dtype)
    errors = errors.at[0].set(1.0)
    threshold = tol * jnp.where(rel_err, err0, 1.0)

    def cond(c):
        x, r, z, p, rho, it, errors = c
        return (jnp.sqrt(jnp.abs(rho)) > threshold) & (it < maxsteps)

    def body(c):
        x, r, z, p, rho, it, errors = c
        q = A(p)
        alpha = rho / tdot(p, q)
        x = taxpy(alpha, p, x)
        r = taxpy(-alpha, q, r)
        z = pre(r)
        rho_new = tdot(r, z)
        beta = rho_new / rho
        p = taxpy(beta, p, z)
        errors = errors.at[it + 1].set(jnp.sqrt(jnp.abs(rho_new)) / err0)
        return (x, r, z, p, rho_new, it + 1, errors)

    init = (x0, r, z, z, rho, jnp.zeros((), jnp.int32), errors)
    x, r, z, p, rho, it, errors = jax.lax.while_loop(cond, body, init)
    converged = jnp.sqrt(jnp.abs(rho)) <= threshold
    return SolverResult(x=x, iterations=it, errors=errors, err0=err0,
                        converged=converged)


def cg_solve(A, b, pre=None, tol=1e-8, maxsteps=200):
    """Convenience: just the solution (for inner inverses)."""
    return cg(A, b, pre=pre, tol=tol, maxsteps=maxsteps).x
