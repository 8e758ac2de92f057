"""Krylov-subspace exponential integrator for linear parabolic problems.

The reference's heat solver (/root/reference/heat.py:74-146) compresses each
large time step into a small Krylov subspace: 4 implicit-Euler-like substeps
build a 5-dim basis, the mass/diffusion operators are projected to 5x5, and
the reduced linear ODE is advanced by one s-stage Gauss IRK step (order 2s).

Here the whole large step is one jitted function: substeps use an inner CG
solve (lax.while_loop), the basis work is a handful of small matmuls, and the
time loop is a lax.scan — zero host round-trips per step, vs. the reference's
Python-driven loop with C++ calls per operation (SURVEY.md section 3.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..linalg.dense import dense_solve
from .orthonormalization import orthonormalize
from .runge_kutta import RungeKuttaWeights, linear_implicit_runge_kutta_step


def krylov_exponential_step(
    T: jnp.ndarray,
    diffusion_apply,
    mass_apply,
    heat_solve,
    weights: RungeKuttaWeights,
    time_step: float,
    subspace_dimension: int = 5,
) -> jnp.ndarray:
    """Advance T by one large ``time_step`` (heat.py:81-146 equivalent).

    ``heat_solve(r)`` applies (M + dt_sub K)^{-1} on free dofs (dt_sub =
    time_step / subspace_dimension); ``diffusion_apply``/``mass_apply`` are
    the unconstrained operators.
    """
    m = subspace_dimension
    dt_sub = time_step / m

    norm0 = jnp.linalg.norm(T)
    basis = [T]
    Tc = T
    for _ in range(1, m):
        r = diffusion_apply(Tc)
        Tc = Tc - dt_sub * heat_solve(r)
        basis.append(Tc)
    B = orthonormalize(jnp.stack(basis), tries=3)

    DB = jax.vmap(diffusion_apply)(B)  # (m, n)
    MB = jax.vmap(mass_apply)(B)
    D_small = B @ DB.T  # D_small[r, c] = <basis_r, D basis_c>
    M_small = B @ MB.T

    evolution = -dense_solve(M_small, D_small)

    y0 = jnp.zeros(m, T.dtype).at[0].set(norm0)
    y1 = linear_implicit_runge_kutta_step(weights, evolution, y0, time_step)
    return y1 @ B
