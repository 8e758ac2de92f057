"""MCS (H(div) x H(curl,div) x L2) Stokes tests.

Poiseuille exactness is the decisive check: (quadratic u, linear
sigma = grad u, linear p) lie in the order-2 MCS spaces and the method is
consistent, so the discrete solution must be exact to solver precision."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.fem.hcurldiv import (
    HCurlDiv,
    hcurldiv_triangle,
)
from navier_stokes_tpu.fem.hdiv import _EDGE_N_SCALED, _EDGE_TAU, edge_points, legendre_01
from navier_stokes_tpu.fem.quadrature import gauss_legendre_01, triangle_rule
from navier_stokes_tpu.mesh import channel_with_cylinder_mesh
from navier_stokes_tpu.mesh.generators import rectangle_mesh
from navier_stokes_tpu.models import stokes as st
from navier_stokes_tpu.models.stokes_mcs import (
    assemble_mcs_stokes,
    mcs_discretization,
    solve_mcs_direct,
    solve_mcs_minres,
)


@pytest.mark.parametrize("order", [1, 2])
def test_hcurldiv_dof_delta(order):
    b = hcurldiv_triangle(order)
    M = (order + 1) * (order + 2) // 2
    assert b.n_basis == 3 * M
    t, w = gauss_legendre_01(order + 3)
    D = np.zeros((b.n_basis, 3 * (order + 1)))
    for e in range(3):
        vals, _ = b.tabulate(edge_points(e, t))
        snt = np.einsum("qnij,j,i->qn", vals, _EDGE_N_SCALED[e], _EDGE_TAU[e])
        for j in range(order + 1):
            D[:, e * (order + 1) + j] = np.einsum(
                "q,q,qn->n", w, legendre_01(t, j), snt
            )
    expect = np.zeros_like(D)
    expect[: 3 * (order + 1)] = np.eye(3 * (order + 1))
    assert np.abs(D - expect).max() < 1e-9
    # trace-free
    q = triangle_rule(2 * order)
    vals, _ = b.tabulate(q.points)
    assert np.abs(np.einsum("qnii->qn", vals)).max() < 1e-12


def _poiseuille_mcs(order=2):
    mesh = rectangle_mesh(0.1, length=1.0, height=0.41)
    disc, _ = mcs_discretization(order)
    V, S, Q = disc(mesh, velocity_dirichlet="wall|inlet",
                   velocity_neumann="outlet")

    def zero_force(p):
        return np.zeros((len(p), 2))

    system = assemble_mcs_stokes(
        mesh, V, S, Q, zero_force, st.default_inlet_profile()
    )
    return mesh, system


def _eval_hdiv(mesh, V, u, qdeg=6):
    hb = V.basis
    q = triangle_rule(qdeg)
    vals_ref, _ = hb.tabulate(q.points)
    J, detJ, _ = mesh.element_jacobians
    ue = u[V.element_dofs] * V.element_signs
    val_p = np.einsum("ecA,qiA->eqic", J, vals_ref) / detJ[:, None, None, None]
    uq = np.einsum("eqic,ei->eqc", val_p, ue)
    qpts = mesh.points[mesh.elements[:, 0]][:, None, :] + np.einsum(
        "eab,qb->eqa", J, q.points
    )
    return uq, qpts


def test_mcs_poiseuille_exact():
    mesh, system = _poiseuille_mcs(2)
    x, t = solve_mcs_direct(system)
    o1, o2 = system.offsets
    uq, qpts = _eval_hdiv(mesh, system.V, x[:o1])
    exact_x = 1.5 * 4 * qpts[..., 1] * (0.41 - qpts[..., 1]) / 0.41**2
    assert np.abs(uq[..., 0] - exact_x).max() < 1e-10
    assert np.abs(uq[..., 1]).max() < 1e-10
    # pressure exactly linear with the analytic gradient
    p = x[o2:]
    qv, _ = system.Q.basis.tabulate(triangle_rule(6).points)
    pq = np.einsum("qi,ei->eq", qv, p[system.Q.element_dofs])
    A_ = np.stack([qpts[..., 0].ravel(), np.ones(pq.size)], axis=1)
    coef, *_ = np.linalg.lstsq(A_, pq.ravel(), rcond=None)
    assert np.abs(A_ @ coef - pq.ravel()).max() < 1e-8
    assert abs(abs(coef[0]) - 1.5 * 8 / 0.41**2) < 1e-8


def test_mcs_minres_matches_direct():
    mesh, system = _poiseuille_mcs(2)
    x1, _ = solve_mcs_direct(system)
    x2, res = solve_mcs_minres(system, tol=1e-11, maxsteps=60000)
    o1, _ = system.offsets
    assert np.abs(x1[:o1] - x2[:o1]).max() < 1e-5


def test_mcs_channel_solves():
    mesh = channel_with_cylinder_mesh(0.15)
    disc, order = mcs_discretization(2)
    V, S, Q = disc(mesh, velocity_dirichlet="wall|inlet|cyl",
                   velocity_neumann="outlet")
    system = assemble_mcs_stokes(
        mesh, V, S, Q, st.default_volume_force, st.default_inlet_profile()
    )
    x, t = solve_mcs_direct(system)
    assert np.all(np.isfinite(x))
    o1, o2 = system.offsets
    uq, _ = _eval_hdiv(mesh, V, x[:o1])
    umax = np.abs(uq).max()
    assert 1.0 < umax < 20.0
    # mass conservation: divergence is pointwise ~0 (the MCS hallmark)
    from navier_stokes_tpu.fem.quadrature import triangle_rule as tr

    q = tr(4)
    _, vg = V.basis.tabulate(q.points)
    J, detJ, _ = mesh.element_jacobians
    ue = x[:o1][V.element_dofs] * V.element_signs
    div_ref = np.einsum("qnaa->qn", vg)
    divq = np.einsum("qn,en,e->eq", div_ref, ue, 1.0 / detJ)
    # slivers near the cylinder limit the attainable conditioning; still
    # pointwise-divergence-free at ~1e-6 (vs O(1e-2) for Taylor-Hood)
    assert np.abs(divq).max() < 1e-4
