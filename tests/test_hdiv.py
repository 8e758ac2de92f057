"""H(div) elements (BDM/RT), tangential facet spaces, HDG Stokes.

Key validation: BDM_2 REPRODUCES Poiseuille flow exactly (the exact Stokes
solution (quadratic velocity, linear pressure) lies in the discrete space and
the HDG form is consistent), which exercises Piola mapping, orientation
signs, facet coupling, penalty and boundary conditions at once.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.fem.hdiv import (
    _EDGE_N_SCALED,
    HDiv,
    VectorFacet,
    bdm_triangle,
    edge_points,
    legendre_01,
    rt_triangle,
)
from navier_stokes_tpu.fem.quadrature import gauss_legendre_01, triangle_rule
from navier_stokes_tpu.mesh import channel_with_cylinder_mesh
from navier_stokes_tpu.mesh.generators import rectangle_mesh
from navier_stokes_tpu.models import stokes as st
from navier_stokes_tpu.models.discretizations import bdm_hybrid, rt_hybrid
from navier_stokes_tpu.models.stokes_hybrid import (
    build_hybrid_stokes_system,
    hybrid_h1_embedding,
)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_bdm_dof_delta_and_span(order):
    b = bdm_triangle(order)
    assert b.n_basis == (order + 1) * (order + 2)
    t, w = gauss_legendre_01(order + 3)
    D = np.zeros((b.n_basis, 3 * (order + 1)))
    for e in range(3):
        vals, _ = b.tabulate(edge_points(e, t))
        vn = vals @ _EDGE_N_SCALED[e]
        for j in range(order + 1):
            D[:, e * (order + 1) + j] = np.einsum(
                "q,q,qn->n", w, legendre_01(t, j), vn
            )
    expect = np.zeros_like(D)
    expect[: 3 * (order + 1)] = np.eye(3 * (order + 1))
    assert np.abs(D - expect).max() < 1e-9
    # span: L2-project a degree-k field and reproduce it exactly
    q = triangle_rule(2 * order + 2)
    vals, _ = b.tabulate(q.points)
    G = np.einsum("q,qic,qjc->ij", q.weights, vals, vals)
    f = np.stack(
        [q.points[:, 0] ** order, q.points[:, 1] ** order - q.points[:, 0]],
        axis=1,
    )
    c = np.linalg.solve(G, np.einsum("q,qic,qc->i", q.weights, vals, f))
    recon = np.einsum("qic,i->qc", vals, c)
    assert np.abs(recon - f).max() < 1e-8


def test_rt0_contains_rigid_fields():
    b = rt_triangle(0)
    assert b.n_basis == 3
    q = triangle_rule(4)
    vals, _ = b.tabulate(q.points)
    G = np.einsum("q,qic,qjc->ij", q.weights, vals, vals)
    f = np.stack([1 + 2 * q.points[:, 0], 3 + 2 * q.points[:, 1]], axis=1)
    c = np.linalg.solve(G, np.einsum("q,qic,qc->i", q.weights, vals, f))
    recon = np.einsum("qic,i->qc", vals, c)
    assert np.abs(recon - f).max() < 1e-9


def test_hdiv_space_structure():
    mesh = rectangle_mesh(0.2, 1.0, 0.4)
    V = HDiv(mesh, 2, dirichlet="wall")
    assert V.ndof == mesh.nedge * 3 + mesh.ne * V.basis.n_cell
    mask = V.boundary_dof_mask("wall")
    assert mask.sum() == 3 * len(mesh.boundary_tags["wall"])
    F = VectorFacet(mesh, 2, dirichlet="wall|inlet")
    assert F.ndof == mesh.nedge * 3


def _poiseuille_system(order=2):
    mesh = rectangle_mesh(0.1, length=1.0, height=0.41)
    disc, _ = bdm_hybrid(order, 10)

    def zero_force(p):
        return np.zeros((len(p), 2))

    return mesh, disc, build_hybrid_stokes_system(
        mesh, disc, velocity_dirichlet="wall|inlet",
        uin=st.default_inlet_profile(), volume_force=zero_force,
    )


def _eval_velocity(mesh, V, u, qdeg=4):
    hb = V.hdiv.basis
    q = triangle_rule(qdeg)
    vals_ref, _ = hb.tabulate(q.points)
    J, detJ, _ = mesh.element_jacobians
    u_np = np.asarray(u)
    ue = u_np[V.element_dofs[:, : hb.n_basis]] * V.element_signs[:, : hb.n_basis]
    val_p = np.einsum("ecA,qiA->eqic", J, vals_ref) / detJ[:, None, None, None]
    uq = np.einsum("eqic,ei->eqc", val_p, ue)
    qpts = mesh.points[mesh.elements[:, 0]][:, None, :] + np.einsum(
        "eab,qb->eqa", J, q.points
    )
    return uq, qpts


def test_hdg_bdm2_poiseuille_exact():
    mesh, disc, system = _poiseuille_system(2)
    u, p, errs, tm, nd = st.solve_with_bramble_pasciak_cg(
        system, tolerance=1e-11, max_steps=5000
    )
    uq, qpts = _eval_velocity(mesh, system.V, u)
    exact_x = 1.5 * 4 * qpts[..., 1] * (0.41 - qpts[..., 1]) / 0.41**2
    assert np.abs(uq[..., 0] - exact_x).max() < 1e-7
    assert np.abs(uq[..., 1]).max() < 1e-7


def test_hdg_cross_solver_agreement():
    mesh = channel_with_cylinder_mesh(0.15)
    disc, _ = bdm_hybrid(2, 10)
    system = build_hybrid_stokes_system(
        mesh, disc, uin=st.default_inlet_profile(), a_pre="vertexstar"
    )
    u1, p1, e1, _, _ = st.solve_with_bramble_pasciak_cg(
        system, tolerance=1e-9, max_steps=30000
    )
    u2, p2, e2, _, _ = st.solve_with_min_res(
        system, tolerance=1e-9, max_steps=30000
    )
    assert np.abs(np.asarray(u1) - np.asarray(u2)).max() < 1e-4
    assert e1[-1] < 1e-8


def test_rt_hybrid_solves():
    mesh = rectangle_mesh(0.15, 1.0, 0.41)
    disc, _ = rt_hybrid(1, 10)

    def zero_force(p):
        return np.zeros((len(p), 2))

    system = build_hybrid_stokes_system(
        mesh, disc, velocity_dirichlet="wall|inlet",
        uin=st.default_inlet_profile(), volume_force=zero_force,
        a_pre="vertexstar",
    )
    u, p, errs, tm, nd = st.solve_with_bramble_pasciak_cg(
        system, tolerance=1e-9, max_steps=20000
    )
    assert errs[-1] < 1e-8
    assert np.all(np.isfinite(np.asarray(u)))


def test_auxspace_embedding():
    mesh = channel_with_cylinder_mesh(0.15)
    disc, _ = bdm_hybrid(2, 10)
    system = build_hybrid_stokes_system(
        mesh, disc, uin=st.default_inlet_profile(), a_pre="jacobi"
    )
    V = system.V
    T, TT = hybrid_h1_embedding(V)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal(2 * mesh.nv))
    x = jnp.asarray(rng.standard_normal(V.ndof))
    # exact transpose pair
    assert abs(float(jnp.vdot(T(c), x)) - float(jnp.vdot(c, TT(x)))) < 1e-10
    # exact reproduction of linear fields
    wfn = lambda p: np.stack(
        [1 + 2 * p[:, 0] - p[:, 1], 3 - p[:, 0] + 4 * p[:, 1]], axis=1
    )
    wv = wfn(mesh.points)
    u = np.asarray(T(jnp.asarray(np.concatenate([wv[:, 0], wv[:, 1]]))))
    uq, qpts = _eval_velocity(mesh, V, u)
    wq = wfn(qpts.reshape(-1, 2)).reshape(uq.shape)
    assert np.abs(uq - wq).max() < 1e-10


def test_auxspace_beats_plain_blocks():
    mesh = channel_with_cylinder_mesh(0.1)
    disc, _ = bdm_hybrid(2, 10)
    iters = {}
    for pre in ["vertexstar", "auxspace"]:
        system = build_hybrid_stokes_system(
            mesh, disc, uin=st.default_inlet_profile(), a_pre=pre
        )
        _, _, errs, _, _ = st.solve_with_bramble_pasciak_cg(
            system, tolerance=1e-8, max_steps=30000
        )
        iters[pre] = len(errs) - 1
    assert iters["auxspace"] < iters["vertexstar"]


@pytest.mark.parametrize("make,order", [("bdm", 2), ("rt", 2)])
def test_hodivfree_element_reduction(make, order):
    """hodivfree (reference discretizations.py:59-78): edge functions keep
    constant divergence, interior dofs restrict to the div-free subspace,
    the edge-moment delta property survives."""
    from navier_stokes_tpu.fem.hdiv import _hodivfree_reduce

    b0 = bdm_triangle(order) if make == "bdm" else rt_triangle(order)
    b = _hodivfree_reduce(b0)
    assert b.n_edge == b0.n_edge and b.n_cell < b0.n_cell
    q = triangle_rule(2 * b.modal_order)
    _, grads = b.tabulate(q.points)
    div = grads[:, :, 0, 0] + grads[:, :, 1, 1]
    ne_tot = 3 * b.n_edge
    assert np.abs(div[:, :ne_tot] - div[:, :ne_tot].mean(0)).max() < 1e-12
    assert np.abs(div[:, ne_tot:]).max() < 1e-12
    t, w = gauss_legendre_01(order + 3)
    D = np.zeros((b.n_basis, ne_tot))
    for e in range(3):
        v, _ = b.tabulate(edge_points(e, t))
        vn = v @ _EDGE_N_SCALED[e]
        for j in range(b.n_edge):
            D[:, e * b.n_edge + j] = np.einsum(
                "q,q,qn->n", w, legendre_01(t, j), vn
            )
    expect = np.vstack([np.eye(ne_tot), np.zeros((b.n_cell, ne_tot))])
    assert np.abs(D - expect).max() < 1e-12


def test_hodivfree_hdg_divergence_free_and_pressure_robust():
    """bdm_hybrid(hodivfree=True) + P0 pressure: the discrete velocity is
    pointwise divergence-free (up to solver tolerance) and — the method
    being pressure-robust — still reproduces Poiseuille exactly even though
    the linear exact pressure is NOT in the P0 pressure space."""
    mesh = rectangle_mesh(0.15, length=1.0, height=0.41)
    disc, _ = bdm_hybrid(2, 10, hodivfree=True)

    def zero_force(p):
        return np.zeros((len(p), 2))

    system = build_hybrid_stokes_system(
        mesh, disc, velocity_dirichlet="wall|inlet",
        uin=st.default_inlet_profile(), volume_force=zero_force,
    )
    assert system.Q.ndof == mesh.ne  # L2(order=0)
    u, p, errs, tm, nd = st.solve_with_bramble_pasciak_cg(
        system, tolerance=1e-11, max_steps=8000
    )
    assert errs[-1] < 1e-10
    V = system.V
    hb = V.hdiv.basis
    uq, qpts = _eval_velocity(mesh, V, u)
    exact_x = 1.5 * 4 * qpts[..., 1] * (0.41 - qpts[..., 1]) / 0.41**2
    assert np.abs(uq[..., 0] - exact_x).max() < 1e-6
    assert np.abs(uq[..., 1]).max() < 1e-6
    q = triangle_rule(4)
    _, grads_ref = hb.tabulate(q.points)
    _, detJ, _ = mesh.element_jacobians
    ue = (np.asarray(u)[V.element_dofs[:, : hb.n_basis]]
          * V.element_signs[:, : hb.n_basis])
    divhat = grads_ref[:, :, 0, 0] + grads_ref[:, :, 1, 1]
    divq = np.einsum("qi,ei->eq", divhat, ue, optimize=True) / detJ[:, None]
    # bounded by solver tolerance amplified by 1/detJ, not by discretization
    assert np.abs(divq).max() < 5e-6
