"""3D H(div) BDM tets + 3D hybrid-DG Stokes.

Decisive check: the Poiseuille-between-plates solution (u = (y(1-y),0,0),
p linear) lies in BDM_2 x facet x P1dc and the scheme is consistent, so the
direct solve must reproduce it to factorization precision — validating the
global-frame face dofs, orientation-combo bases, Piola mapping and the 3D
facet machinery in one shot."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from navier_stokes_tpu.fem.hdiv3d import HDiv3D, bdm_tet, face_frame
from navier_stokes_tpu.fem.quadrature import tetrahedron_rule, triangle_rule
from navier_stokes_tpu.fem.reference import triangle_modal
from navier_stokes_tpu.mesh.generators import (
    extrude_to_tets,
    rectangle_mesh,
    unit_cube_mesh,
)
from navier_stokes_tpu.models import stokes as st
from navier_stokes_tpu.models.stokes_hybrid3d import (
    assemble_hdg_stokes_3d,
    bdm_hybrid_3d,
    build_hybrid_stokes_system_3d,
)
from navier_stokes_tpu.ops.assembly import assemble_csr, assemble_csr_rect


@pytest.mark.parametrize("order", [1, 2])
def test_bdm_tet_delta_and_span(order):
    combo = ((0, 1, 2), (1, 0, 2), (2, 1, 0), (0, 2, 1))
    b = bdm_tet(order, combo)
    q2 = triangle_rule(2 * order + 2)
    fvals, _ = triangle_modal(q2.points, order)
    D = np.zeros((b.n_basis, 4 * b.n_face))
    for lf in range(4):
        origin, e1, e2, n = face_frame(combo[lf], lf)
        pts = (origin[None] + q2.points[:, :1] * e1[None]
               + q2.points[:, 1:2] * e2[None])
        vals, _ = b.tabulate(pts)
        vn = np.einsum("qnc,c->qn", vals, n)
        for j in range(b.n_face):
            D[:, lf * b.n_face + j] = np.einsum(
                "q,q,qn->n", q2.weights, fvals[:, j], vn
            )
    expect = np.zeros_like(D)
    expect[: 4 * b.n_face] = np.eye(4 * b.n_face)
    assert np.abs(D - expect).max() < 1e-8
    q3 = tetrahedron_rule(2 * order + 2)
    vals, _ = b.tabulate(q3.points)
    G = np.einsum("q,qic,qjc->ij", q3.weights, vals, vals)
    f = np.stack(
        [q3.points[:, 0] ** order, q3.points[:, 1] ** order - q3.points[:, 2],
         q3.points[:, 2] ** order], axis=1,
    )
    c = np.linalg.solve(G, np.einsum("q,qic,qc->i", q3.weights, vals, f))
    recon = np.einsum("qic,i->qc", vals, c)
    assert np.abs(recon - f).max() < 1e-7


def test_hdiv3d_interelement_continuity():
    """A globally linear field projected onto BDM_2-3D is reproduced exactly
    pointwise — only possible if shared face dofs agree across tets."""
    mesh = unit_cube_mesh(0.5)
    V = HDiv3D(mesh, 2)
    J, detJ, _ = mesh.element_jacobians
    q3 = tetrahedron_rule(6)
    vals_ref, _ = V.tabulate_elements(q3.points)
    val_p = np.einsum("ecA,eqiA->eqic", J, vals_ref) / detJ[:, None, None, None]
    qpts = mesh.points[mesh.elements[:, 0]][:, None, :] + np.einsum(
        "eab,qb->eqa", J, q3.points
    )
    ufn = lambda p: np.stack(
        [1 + p[:, 1] + p[:, 2], 2 + p[:, 0], 3 - p[:, 0] + p[:, 2]], axis=1
    )
    fq = ufn(qpts.reshape(-1, 3)).reshape(qpts.shape)
    M_loc = np.einsum("q,eqic,eqjc,e->eij", q3.weights, val_p, val_p, detJ)
    rhs_loc = np.einsum("q,eqic,eqc,e->ei", q3.weights, val_p, fq, detJ)
    M = assemble_csr(M_loc, V.element_dofs, V.ndof)
    rhs = np.zeros(V.ndof)
    np.add.at(rhs, V.element_dofs.ravel(), rhs_loc.ravel())
    u = spla.spsolve(M.tocsc(), rhs)
    uq = np.einsum("eqic,ei->eqc", val_p, u[V.element_dofs])
    assert np.abs(uq - fq).max() < 1e-9


def _plates_setup():
    base = rectangle_mesh(0.25, 1.0, 1.0)
    mesh = extrude_to_tets(base, np.linspace(0, 0.5, 3))
    tol = 1e-9
    mesh.tag_boundary_by_predicate(
        "outlet", lambda p: np.abs(p[:, :, 0] - 1.0) < tol
    )
    rest = np.setdiff1d(mesh.boundary_facets, mesh.boundary_tags["outlet"])
    mesh.boundary_tags["diri"] = rest.astype(np.int32)

    def uin(p):
        out = np.zeros((len(p), 3))
        out[:, 0] = p[:, 1] * (1.0 - p[:, 1])
        return out

    return mesh, uin


def test_hdg3d_poiseuille_exact_direct():
    mesh, uin = _plates_setup()
    disc, _ = bdm_hybrid_3d(2)
    system = build_hybrid_stokes_system_3d(
        mesh, disc, velocity_dirichlet="diri", uin=uin
    )
    V, Q = system.V, system.Q
    A_np, B_np, *_ = assemble_hdg_stokes_3d(V, Q)
    K = assemble_csr(A_np, V.element_dofs, V.ndof)
    Bg = assemble_csr_rect(B_np, Q.element_dofs, V.element_dofs, Q.ndof, V.ndof)
    idx = np.where(V.free_mask)[0]
    KK = sp.bmat(
        [[K[idx][:, idx], Bg[:, idx].T], [Bg[:, idx], None]]
    ).tocsc()
    rhs = np.concatenate([np.asarray(system.f)[idx], np.asarray(system.g)])
    sol = spla.spsolve(KK, rhs)
    du = np.zeros(V.ndof)
    du[idx] = sol[: len(idx)]
    u = du + np.asarray(system.u_bc)
    hd = V.hdiv
    q3 = tetrahedron_rule(6)
    vals_ref, _ = hd.tabulate_elements(q3.points)
    J, detJ, _ = mesh.element_jacobians
    val_p = np.einsum("ecA,eqiA->eqic", J, vals_ref) / detJ[:, None, None, None]
    uq = np.einsum(
        "eqic,ei->eqc", val_p, u[V.element_dofs[:, : hd.n_basis]]
    )
    qpts = mesh.points[mesh.elements[:, 0]][:, None, :] + np.einsum(
        "eab,qb->eqa", J, q3.points
    )
    ex = qpts[..., 1] * (1.0 - qpts[..., 1])
    assert np.abs(uq[..., 0] - ex).max() < 1e-8
    assert np.abs(uq[..., 1:]).max() < 1e-8


def test_hdg3d_bpcg_solves():
    mesh, uin = _plates_setup()
    disc, _ = bdm_hybrid_3d(2)
    system = build_hybrid_stokes_system_3d(
        mesh, disc, velocity_dirichlet="diri", uin=uin
    )
    u, p, errs, tm, nd = st.solve_with_bramble_pasciak_cg(
        system, tolerance=1e-8, max_steps=30000
    )
    assert errs[-1] < 1e-7
    assert np.all(np.isfinite(np.asarray(u)))


@pytest.mark.parametrize("order", [0, 1])
def test_rt_tet_delta_and_dim(order):
    from navier_stokes_tpu.fem.hdiv3d import rt_tet

    combo = ((0, 1, 2), (1, 0, 2), (2, 1, 0), (0, 2, 1))
    b = rt_tet(order, combo)
    k = order
    assert b.n_basis == (k + 1) * (k + 2) * (k + 3) // 2 + (k + 1) * (k + 2) // 2
    q2 = triangle_rule(2 * k + 4)
    fvals, _ = triangle_modal(q2.points, k)
    D = np.zeros((b.n_basis, 4 * b.n_face))
    for lf in range(4):
        origin, e1, e2, n = face_frame(combo[lf], lf)
        pts = (origin[None] + q2.points[:, :1] * e1[None]
               + q2.points[:, 1:2] * e2[None])
        vals, _ = b.tabulate(pts)
        vn = np.einsum("qnc,c->qn", vals, n)
        for j in range(b.n_face):
            D[:, lf * b.n_face + j] = np.einsum(
                "q,q,qn->n", q2.weights, fvals[:, j], vn
            )
    expect = np.zeros_like(D)
    expect[: 4 * b.n_face] = np.eye(4 * b.n_face)
    assert np.abs(D - expect).max() < 1e-7


def test_rt0_3d_space():
    from navier_stokes_tpu.fem.hdiv3d import HDiv3D, rt_tet

    mesh = unit_cube_mesh(0.5)
    V = HDiv3D(mesh, 0, RT=True)
    assert V.ndof == mesh.nface  # the classic one-dof-per-face RT0
    combo = tuple(V.bases[0].combo)
    b = rt_tet(0, combo)
    q3 = tetrahedron_rule(4)
    vals, _ = b.tabulate(q3.points)
    G = np.einsum("q,qic,qjc->ij", q3.weights, vals, vals)
    f = np.stack(
        [1 + 2 * q3.points[:, 0], 3 + 2 * q3.points[:, 1],
         -1 + 2 * q3.points[:, 2]], axis=1,
    )
    c = np.linalg.solve(G, np.einsum("q,qic,qc->i", q3.weights, vals, f))
    recon = np.einsum("qic,i->qc", vals, c)
    assert np.abs(recon - f).max() < 1e-8
