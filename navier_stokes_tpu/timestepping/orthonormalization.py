"""Gram-Schmidt orthonormalization of a small vector batch.

Replaces /root/reference/orthonormalization.py:5-16: `tries` full passes of
classical Gram-Schmidt with normalization.  The basis is a (k, n) matrix (k
small, e.g. 5 Krylov vectors), so each pass is a couple of small matmuls —
done on device, jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def orthonormalize(basis: jnp.ndarray, tries: int = 3) -> jnp.ndarray:
    """Orthonormalize the rows of ``basis`` (k, n) by repeated CGS."""
    k = basis.shape[0]
    for _ in range(tries):
        rows = []
        for i in range(k):  # k is small & static: unrolled at trace time
            v = basis[i]
            if rows:
                q = jnp.stack(rows)
                v = v - q.T @ (q @ v)
            v = v / jnp.linalg.norm(v)
            rows.append(v)
        basis = jnp.stack(rows)
    return basis
