"""Preconditioner tests: SPD properties, two-level iteration reduction,
h-robustness (the preconditioner-quality contract of SURVEY.md section 4
item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.fem.spaces import H1
from navier_stokes_tpu.mesh import unit_square_mesh
from navier_stokes_tpu.ops import assembly as asm
from navier_stokes_tpu.precond.twolevel import (
    p1_embedding,
    two_level_preconditioner,
    vertex_patch_blocks,
)
from navier_stokes_tpu.solvers.cg import cg


def _poisson(h, order=2):
    mesh = unit_square_mesh(h)
    V = H1(mesh, order, dirichlet="bottom|right|top|left")
    t = asm.make_tables(V)
    K = asm.stiffness_local(t)
    free = jnp.asarray(V.free_mask)

    def A(u):
        uf = jnp.where(free, u, 0.0)
        y = asm.apply_local_matrices(K, t.eldofs, V.ndof, uf)
        return jnp.where(free, y, u)

    rhs = jnp.where(free, 1.0, 0.0)
    return V, t, K, A, rhs, free


def test_p1_embedding_transpose():
    V, t, K, A, rhs, free = _poisson(0.2, 3)
    P, PT = p1_embedding(V)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal(V.mesh.nv))
    x = jnp.asarray(rng.standard_normal(V.ndof))
    lhs = float(jnp.vdot(P(c), x))
    rhs_ = float(jnp.vdot(c, PT(x)))
    assert abs(lhs - rhs_) < 1e-10 * (1 + abs(lhs))


def test_p1_embedding_reproduces_linears():
    """P1 functions are reproduced exactly in the fine space."""
    V, t, K, A, rhs, free = _poisson(0.25, 3)
    mesh = V.mesh
    c = jnp.asarray(1.0 + 2 * mesh.points[:, 0] - mesh.points[:, 1])
    fine = P = None
    P, PT = p1_embedding(V)
    u = np.asarray(P(c))
    u_ref = V.interpolate(lambda p: 1.0 + 2 * p[:, 0] - p[:, 1])
    assert np.abs(u - u_ref).max() < 1e-12


def test_patch_blocks_cover_free_dofs():
    V, *_ = _poisson(0.25, 3)  # P3: has cell dofs
    blocks = vertex_patch_blocks(V)
    covered = np.zeros(V.ndof, dtype=bool)
    for b in blocks:
        covered[b] = True
    assert np.array_equal(covered, V.free_mask)


def test_two_level_spd():
    V, t, K, A, rhs, free = _poisson(0.25, 2)
    pre = two_level_preconditioner(V, K, smoother="patch")
    rng = np.random.default_rng(1)
    x = jnp.where(free, jnp.asarray(rng.standard_normal(V.ndof)), 0.0)
    y = jnp.where(free, jnp.asarray(rng.standard_normal(V.ndof)), 0.0)
    assert float(jnp.vdot(x, pre(x))) > 0
    assert abs(float(jnp.vdot(x, pre(y))) - float(jnp.vdot(pre(x), y))) < 1e-9


@pytest.mark.parametrize("smoother", ["jacobi", "patch"])
def test_two_level_beats_jacobi_and_is_h_robust(smoother):
    iters = {}
    for h in [0.1, 0.05]:
        V, t, K, A, rhs, free = _poisson(h, 2)
        diag = asm.diagonal_of_local(K, t.eldofs, V.ndof)
        jac = lambda x, d=jnp.where(free, diag, 1.0): jnp.where(free, x / d, 0.0)
        r_j = cg(A, rhs, pre=jac, tol=1e-10, maxsteps=2000)
        pre = two_level_preconditioner(V, K, smoother=smoother)
        r_2 = cg(A, rhs, pre=pre, tol=1e-10, maxsteps=2000)
        assert int(r_2.iterations) < int(r_j.iterations) * 0.6
        iters[h] = int(r_2.iterations)
        # same solution
        assert np.abs(np.asarray(r_2.x) - np.asarray(r_j.x)).max() < 1e-7
    # h-robustness: iteration growth under refinement stays small
    assert iters[0.05] <= iters[0.1] + 6
