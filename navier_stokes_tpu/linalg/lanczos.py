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

    def body(j, carry):
        v, z, z_old, beta_prev, diag, offd = carry
        w = A(v)
        alpha = tdot(v, w)
        w = taxpy(-alpha, z, w)
        w = taxpy(-beta_prev, z_old, w)
        v_new = pre(w)
        beta = jnp.sqrt(jnp.abs(tdot(w, v_new)))
        diag = diag.at[j].set(alpha)
        offd = offd.at[j].set(beta)
        safe = jnp.maximum(beta, jnp.finfo(beta.dtype).tiny)
        return (
            tscale(1.0 / safe, v_new),
            tscale(1.0 / safe, w),
            z,
            beta,
            diag,
            offd,
        )

    init = (v, z, tzeros_like(z), jnp.zeros((), beta0.dtype), diag, offd)
    _, _, _, _, diag, offd = jax.lax.fori_loop(0, m, body, init)

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
