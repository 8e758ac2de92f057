"""3D (tetrahedral) support: meshes, assembly convergence, NavierStokes."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from navier_stokes_tpu.fem.spaces import H1
from navier_stokes_tpu.mesh.generators import (
    channel_with_cylinder_mesh_3d,
    unit_cube_mesh,
)
from navier_stokes_tpu.models.navier_stokes import NavierStokes
from navier_stokes_tpu.ops import assembly as asm


def test_unit_cube_mesh():
    cube = unit_cube_mesh(0.25)
    _, detJ, _ = cube.element_jacobians
    assert abs(detJ.sum() / 6 - 1.0) < 1e-12
    tagged = sum(len(v) for v in cube.boundary_tags.values())
    assert tagged == len(cube.boundary_facets)


def test_channel_3d_mesh():
    ch = channel_with_cylinder_mesh_3d(0.1)
    _, detJ, _ = ch.element_jacobians
    exact = (2.5 * 0.41 - np.pi * 0.05**2) * 0.41
    assert abs(detJ.sum() / 6 - exact) / exact < 5e-3
    for tag in ("inlet", "outlet", "wall", "cyl"):
        assert len(ch.boundary_tags[tag]) > 0


def _poisson_error_3d(h, order):
    mesh = unit_cube_mesh(h)
    V = H1(mesh, order, dirichlet="left|right|front|back|bottom|top")
    t = asm.make_tables(V)
    Kcsr = asm.assemble_csr(
        np.asarray(asm.stiffness_local(t)), V.element_dofs, V.ndof
    )
    sol = lambda p: np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1]) * np.sin(
        np.pi * p[:, 2]
    )
    f = lambda p: 3 * np.pi**2 * sol(p)
    fq = f(np.asarray(t.qpts).reshape(-1, 3)).reshape(t.qpts.shape[:2])
    rhs = np.asarray(
        asm.scatter_add(asm.linear_form_local(t, jnp.asarray(fq)), t.eldofs, V.ndof)
    )
    free = V.free_mask
    u = np.zeros(V.ndof)
    u[free] = spla.spsolve(Kcsr[free][:, free].tocsc(), rhs[free])
    uq = np.einsum("qi,ei->eq", np.asarray(t.val), u[V.element_dofs])
    sq = sol(np.asarray(t.qpts).reshape(-1, 3)).reshape(uq.shape)
    return np.sqrt(
        np.einsum("q,eq,e->", np.asarray(t.qw), (uq - sq) ** 2, np.asarray(t.detj))
    )


def test_poisson_3d_p1_converges():
    e1, e2 = _poisson_error_3d(0.25, 1), _poisson_error_3d(0.125, 1)
    assert np.log2(e1 / e2) > 1.5


def test_poisson_3d_p2_converges():
    e1, e2 = _poisson_error_3d(0.5, 2), _poisson_error_3d(0.25, 2)
    assert np.log2(e1 / e2) > 2.5


def test_p3_interpolation_exact_3d():
    """Cubic reproduced exactly: validates face/edge dof orientation logic."""
    mesh = unit_cube_mesh(0.34)
    V = H1(mesh, 3)
    f = lambda p: (p[:, 0] + 2 * p[:, 1] - p[:, 2]) ** 3
    u = V.interpolate(f)
    t = asm.make_tables(V)
    uq = np.einsum("qi,ei->eq", np.asarray(t.val), u[V.element_dofs])
    fq = f(np.asarray(t.qpts).reshape(-1, 3)).reshape(uq.shape)
    assert np.abs(uq - fq).max() < 1e-12


def uin3d(p):
    out = np.zeros((len(p), 3))
    out[:, 0] = (
        16 * p[:, 1] * (0.41 - p[:, 1]) * p[:, 2] * (0.41 - p[:, 2]) / 0.41**4
    )
    return out


def test_navier_stokes_3d():
    """3D NS (reference NavierStokesSIMPLE_test_3D.py): steady solve + step."""
    mesh = channel_with_cylinder_mesh_3d(0.2)
    ns = NavierStokes(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin3d, timestep=2e-3, order=2,
    )
    ns.SolveInitial(iterative=True, tol=1e-8)
    assert ns.stokes_bpcg_iterations > 0
    assert float(jnp.linalg.norm(ns.B_raw(ns.u))) < 1e-4
    umax = np.abs(ns.velocity).max()
    assert 0.5 < umax < 20.0
    ns.DoTimeStep()
    assert np.all(np.isfinite(np.asarray(ns.u)))
