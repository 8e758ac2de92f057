"""Preconditioned Lanczos eigenvalue estimation (EigenValues_Preconditioner).

Estimates the spectrum of pre @ A (equivalently of A in the pre^{-1} inner
product), replacing NGSolve's ``EigenValues_Preconditioner`` used to compute
the Bramble-Pasciak scaling k = 1/lambda_min + 1e-3
(/root/reference/bramble_pasciak_cg.py:70-71,
/root/reference/solvers/bramblepasciak_new.py:115-119) and the Chebyshev
bounds.  Runs as a fixed-iteration ``lax.fori_loop`` on device; the tiny
tridiagonal eigenproblem is solved with jnp.linalg.eigh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pytree import taxpy, tdot, tscale, tzeros_like


def lanczos_eigenvalues(A, pre, example_vec, iterations: int = 40, key=None):
    """Eigenvalue estimates of pre @ A for SPD A and SPD preconditioner pre.

    Parameters: ``A`` and ``pre`` are callables on pytree vectors;
    ``example_vec`` fixes shapes/dtypes.  Returns a (iterations,) array of
    Ritz values (ascending); min/max are sharp after ~30-40 iterations.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    leaves, treedef = jax.tree_util.tree_flatten(example_vec)
    keys = jax.random.split(key, len(leaves))
    rnd = [
        jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)
    ]
    z0 = jax.tree_util.tree_unflatten(treedef, rnd)  # dual-space start

    v0 = pre(z0)
    beta0 = jnp.sqrt(jnp.abs(tdot(z0, v0)))
    v = tscale(1.0 / beta0, v0)
    z = tscale(1.0 / beta0, z0)  # z = pre^{-1} v

    m = iterations
    diag = jnp.zeros(m, beta0.dtype)
    offd = jnp.zeros(m, beta0.dtype)

    # statically unrolled with FULL reorthogonalization (m is small): plain
    # Lanczos loses orthogonality once Ritz values converge and can report
    # spurious (even negative) lambda_min — fatal for the Bramble-Pasciak
    # scaling k = 1/lambda_min.
    vs, zs = [v], [z]
    beta_prev = jnp.zeros((), beta0.dtype)
    z_old = tzeros_like(z)
    for j in range(m):
        w = A(v)
        alpha = tdot(v, w)
        w = taxpy(-alpha, z, w)
        w = taxpy(-beta_prev, z_old, w)
        # reorthogonalize the dual residual against all stored primal vectors
        for vi, zi in zip(vs, zs):
            w = taxpy(-tdot(w, vi), zi, w)
        v_new = pre(w)
        beta = jnp.sqrt(jnp.abs(tdot(w, v_new)))
        # breakdown guard: Krylov space exhausted -> freeze (duplicate Ritz
        # values are harmless for the min/max estimates)
        eps = jnp.asarray(1e-10, beta0.dtype) * (jnp.abs(alpha) + beta0)
        broke = beta < eps
        diag = diag.at[j].set(alpha)
        offd = offd.at[j].set(jnp.where(broke, 0.0, beta))
        safe = jnp.where(broke, 1.0, beta)
        z_old = z
        v = jax.tree_util.tree_map(
            lambda new, old: jnp.where(broke, old, new / safe), v_new, v
        )
        z = jax.tree_util.tree_map(
            lambda new, old: jnp.where(broke, old, new / safe), w, z
        )
        beta_prev = jnp.where(broke, 0.0, beta)
        if j < m - 1:
            vs.append(v)
            zs.append(z)

    T = (
        jnp.diag(diag)
        + jnp.diag(offd[: m - 1], 1)
        + jnp.diag(offd[: m - 1], -1)
    )
    return jnp.linalg.eigvalsh(T)


def condition_estimate(A, pre, example_vec, iterations: int = 40, key=None):
    """(lambda_min, lambda_max, cond) of pre @ A."""
    lams = lanczos_eigenvalues(A, pre, example_vec, iterations, key)
    lmin = jnp.min(lams)
    lmax = jnp.max(lams)
    return lmin, lmax, lmax / lmin
