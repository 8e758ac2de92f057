"""3D H(div) Navier-Stokes (HDG viscous + upwind-DG convection)."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.fem.hdiv3d import HDiv3D
from navier_stokes_tpu.fem.quadrature import tetrahedron_rule
from navier_stokes_tpu.mesh.generators import extrude_to_tets, rectangle_mesh
from navier_stokes_tpu.models.navier_stokes_hdg3d import NavierStokesHDG3D
from navier_stokes_tpu.ops.assembly import assemble_csr
from navier_stokes_tpu.ops.convection3d import build_upwind_convection_3d


def test_upwind_convection_3d_exact_on_linear_field():
    """With consistent boundary data, the DG convection functional equals
    -(u.grad)u tested against every basis function, exactly, for a global
    linear solenoidal field (see ops/convection.py for the identity)."""
    import scipy.sparse.linalg as spla

    base = rectangle_mesh(0.5, 1.0, 1.0)
    mesh = extrude_to_tets(base, np.linspace(0, 1.0, 3))
    V = HDiv3D(mesh, 2)

    ufn = lambda p: np.stack(
        [1.0 + p[:, 1], 2.0 + p[:, 2], 3.0 + p[:, 0]], axis=1
    )  # div-free linear
    # project onto V
    J, detJ, _ = mesh.element_jacobians
    q3 = tetrahedron_rule(6)
    vals_ref, _ = V.tabulate_elements(q3.points)
    val_p = np.einsum("ecA,eqiA->eqic", J, vals_ref) / detJ[:, None, None, None]
    qpts = mesh.points[mesh.elements[:, 0]][:, None, :] + np.einsum(
        "eab,qb->eqa", J, q3.points
    )
    fq = ufn(qpts.reshape(-1, 3)).reshape(qpts.shape)
    M_loc = np.einsum("q,eqic,eqjc,e->eij", q3.weights, val_p, val_p, detJ)
    rhs_loc = np.einsum("q,eqic,eqc,e->ei", q3.weights, val_p, fq, detJ)
    M = assemble_csr(M_loc, V.element_dofs, V.ndof)
    rhs = np.zeros(V.ndof)
    np.add.at(rhs, V.element_dofs.ravel(), rhs_loc.ravel())
    u = spla.spsolve(M.tocsc(), rhs)

    conv = build_upwind_convection_3d(V, uin=ufn)
    cu = np.asarray(conv(jnp.asarray(u)))
    # analytic: (u.grad)u = (u_y*1? ...) for u=(1+y, 2+z, 3+x):
    # (u.grad)u_x = u_y * d_y(1+y) = u_y; similarly _y = u_z, _z = u_x
    g = -np.stack([fq[..., 1], fq[..., 2], fq[..., 0]], axis=-1)
    fe = np.einsum("q,eqc,eqic,e->ei", q3.weights, g, val_p, detJ)
    ref = np.zeros(V.ndof)
    np.add.at(ref, V.element_dofs.ravel(), fe.ravel())
    assert np.abs(cu - ref).max() < 1e-10


@pytest.mark.parametrize("dummy", [0])
def test_ns_hdg3d_smoke(dummy):
    """Tiny 3D channel-like box: steady solve + stable stepping."""
    base = rectangle_mesh(0.5, 1.0, 1.0)
    mesh = extrude_to_tets(base, np.linspace(0, 0.5, 2))
    tol = 1e-9
    mesh.tag_boundary_by_predicate("inlet", lambda p: np.abs(p[:, :, 0]) < tol)
    mesh.tag_boundary_by_predicate(
        "outlet", lambda p: np.abs(p[:, :, 0] - 1.0) < tol
    )
    rest = np.setdiff1d(
        mesh.boundary_facets,
        np.concatenate([mesh.boundary_tags["inlet"], mesh.boundary_tags["outlet"]]),
    )
    mesh.boundary_tags["wall"] = rest.astype(np.int32)

    def uin(p):
        out = np.zeros((len(p), 3))
        out[:, 0] = 16 * p[:, 1] * (1 - p[:, 1]) * p[:, 2] * (0.5 - p[:, 2]) / 0.25
        return out

    ns = NavierStokesHDG3D(
        mesh, nu=0.01, inflow="inlet", outflow="outlet", wall="wall",
        uin=uin, timestep=2e-3, order=2,
    )
    res = ns.SolveInitial(iterative=True, tol=1e-9, maxsteps=60000)
    assert bool(res.converged)
    assert ns.stokes_bpcg_iterations > 0
    # divergence at the BP tolerance level; one projection pins it down
    assert float(jnp.linalg.norm(ns.B_raw(ns.u))) < 1e-4
    ns.Project()
    assert float(jnp.linalg.norm(ns.B_raw(ns.u))) < 1e-7
    ns.DoTimeStep()
    assert bool(jnp.all(jnp.isfinite(ns.u)))
