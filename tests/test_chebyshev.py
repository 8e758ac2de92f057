"""Chebyshev preconditioner: SPD, symmetric, accelerates CG."""

import jax.numpy as jnp
import numpy as np

from navier_stokes_tpu.fem.spaces import H1
from navier_stokes_tpu.mesh import unit_square_mesh
from navier_stokes_tpu.ops import assembly as asm
from navier_stokes_tpu.precond import chebyshev_preconditioner
from navier_stokes_tpu.solvers.cg import cg


def test_chebyshev_accelerates_and_is_spd():
    mesh = unit_square_mesh(0.05)
    V = H1(mesh, 2, dirichlet="bottom|right|top|left")
    t = asm.make_tables(V)
    K = asm.stiffness_local(t)
    free = jnp.asarray(V.free_mask)

    def A(u):
        uf = jnp.where(free, u, 0.0)
        y = asm.apply_local_matrices(K, t.eldofs, V.ndof, uf)
        return jnp.where(free, y, u)

    diag = jnp.where(free, asm.diagonal_of_local(K, t.eldofs, V.ndof), 1.0)
    jac = lambda x: jnp.where(free, x / diag, 0.0)
    rhs = jnp.where(free, 1.0, 0.0)
    rj = cg(A, rhs, pre=jac, tol=1e-10, maxsteps=3000)
    cheb = chebyshev_preconditioner(A, jac, rhs, degree=4)

    rng = np.random.default_rng(0)
    x = jnp.where(free, jnp.asarray(rng.standard_normal(V.ndof)), 0.0)
    y = jnp.where(free, jnp.asarray(rng.standard_normal(V.ndof)), 0.0)
    assert abs(float(jnp.vdot(x, cheb(y))) - float(jnp.vdot(cheb(x), y))) < 1e-8
    assert float(jnp.vdot(x, cheb(x))) > 0

    rc = cg(A, rhs, pre=cheb, tol=1e-10, maxsteps=3000)
    assert int(rc.iterations) < int(rj.iterations) / 2
    assert float(jnp.abs(rc.x - rj.x).max()) < 1e-7
