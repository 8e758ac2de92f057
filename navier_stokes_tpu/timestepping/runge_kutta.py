"""Gauss-collocation implicit Runge-Kutta (arbitrary stage count).

Replaces /root/reference/runge_kutta_method.py: the Butcher tableau of the
s-stage Gauss method (order 2s) computed from Gauss-Legendre nodes, and the
linear-ODE stage solve.  Weight computation uses exact Gauss quadrature of
the Lagrange basis polynomials instead of adaptive scipy.integrate.quad; the
stage system is built with one kron + solved densely on device (the reference
builds it entry-by-entry in Python loops, runge_kutta_method.py:29-42 — a
hot spot SURVEY.md section 3.2 flags).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..linalg.dense import dense_solve


@dataclass(frozen=True)
class RungeKuttaWeights:
    """Butcher tableau (a, b, c) of the `stages`-stage Gauss method."""

    a: np.ndarray  # (s, s)
    b: np.ndarray  # (s,)
    c: np.ndarray  # (s,)

    @property
    def stages(self) -> int:
        return len(self.b)


def _lagrange_vals(c: np.ndarray, x: np.ndarray) -> np.ndarray:
    """ell_j(x) for the Lagrange basis over nodes c. Returns (len(x), s)."""
    s = len(c)
    out = np.ones((len(x), s))
    for j in range(s):
        for m in range(s):
            if m != j:
                out[:, j] *= (x - c[m]) / (c[j] - c[m])
    return out


def implicit_runge_kutta_weights(stages: int = 3) -> RungeKuttaWeights:
    """Gauss method tableau: c = mapped Gauss-Legendre nodes on [0,1],
    a_ij = int_0^{c_i} ell_j, b_j = int_0^1 ell_j (runge_kutta_method.py:10-23)."""
    nodes, _ = np.polynomial.legendre.leggauss(stages)
    c = (nodes + 1.0) / 2.0
    # exact integration of degree-(s-1) polynomials
    gx, gw = np.polynomial.legendre.leggauss(stages)
    gx01 = (gx + 1.0) / 2.0
    gw01 = gw / 2.0
    b = np.einsum("q,qj->j", gw01, _lagrange_vals(c, gx01))
    a = np.zeros((stages, stages))
    for i in range(stages):
        xs = c[i] * gx01
        ws = c[i] * gw01
        a[i] = np.einsum("q,qj->j", ws, _lagrange_vals(c, xs))
    return RungeKuttaWeights(a=a, b=b, c=c)


def linear_implicit_runge_kutta_step(
    weights: RungeKuttaWeights, matrix, value, step_width
):
    """One Gauss-IRK step for the linear ODE y' = M y (exact stage solve).

    Solves (I - h a (x) M) k = 1_s (x) (M y), then y+ = y + h sum_i b_i k_i.
    Equivalent to runge_kutta_method.py:26-59 but as dense device linalg.
    """
    M = jnp.asarray(matrix)
    y = jnp.asarray(value)
    s = weights.stages
    m = M.shape[0]
    a = jnp.asarray(weights.a, M.dtype)
    b = jnp.asarray(weights.b, M.dtype)
    lhs = jnp.eye(s * m, dtype=M.dtype) - step_width * jnp.kron(a, M)
    My = M @ y
    rhs = jnp.tile(My, s)
    k = dense_solve(lhs, rhs).reshape(s, m)
    return y + step_width * jnp.einsum("i,ij->j", b, k)
