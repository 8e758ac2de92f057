"""Pytree vector algebra: the BlockVector/BaseVector replacement.

The reference composes NGSolve BlockVectors (/root/reference/run.py:45-48,
bramble_pasciak_cg.py:87).  Here a "vector" is any JAX pytree of arrays
(e.g. a (u, p) tuple for saddle-point systems); these helpers give the
axpy/inner-product algebra the Krylov solvers need, jit- and vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tdot(x, y):
    """Global inner product sum_leaves <x_i, y_i> (real)."""
    leaves_x = jax.tree_util.tree_leaves(x)
    leaves_y = jax.tree_util.tree_leaves(y)
    return sum(jnp.vdot(a, b) for a, b in zip(leaves_x, leaves_y))


def tadd(x, y):
    return jax.tree_util.tree_map(jnp.add, x, y)


def tsub(x, y):
    return jax.tree_util.tree_map(jnp.subtract, x, y)


def tscale(a, x):
    return jax.tree_util.tree_map(lambda v: a * v, x)


def taxpy(a, x, y):
    """a*x + y"""
    return jax.tree_util.tree_map(lambda xv, yv: a * xv + yv, x, y)


def tzeros_like(x):
    return jax.tree_util.tree_map(jnp.zeros_like, x)


def tnorm(x):
    return jnp.sqrt(tdot(x, x))


def tmask(mask, x):
    """Zero out entries where mask is False (same pytree structure)."""
    return jax.tree_util.tree_map(lambda m, v: jnp.where(m, v, 0.0), mask, x)
