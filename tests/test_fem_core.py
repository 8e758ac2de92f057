"""Unit tests for quadrature, reference bases, meshes, spaces, assembly.

Test strategy follows SURVEY.md section 4: integrate polynomials exactly,
compare assembly on tiny meshes against dense numpy computations, and check
analytic-solution convergence.
"""

from math import factorial

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.fem.quadrature import (
    interval_rule,
    tetrahedron_rule,
    triangle_rule,
)
from navier_stokes_tpu.fem import reference as ref
from navier_stokes_tpu.fem.spaces import H1, L2, Nonconforming, VectorH1
from navier_stokes_tpu.mesh import channel_with_cylinder_mesh, unit_square_mesh
from navier_stokes_tpu.ops import assembly as asm


# -- quadrature -------------------------------------------------------------


@pytest.mark.parametrize("a,b", [(0, 0), (3, 4), (6, 6), (12, 0)])
def test_triangle_quadrature_exact(a, b):
    q = triangle_rule(a + b)
    exact = factorial(a) * factorial(b) / factorial(a + b + 2)
    got = np.sum(q.weights * q.points[:, 0] ** a * q.points[:, 1] ** b)
    assert abs(got - exact) < 1e-14


@pytest.mark.parametrize("abc", [(0, 0, 0), (2, 3, 4), (9, 0, 0)])
def test_tet_quadrature_exact(abc):
    a, b, c = abc
    q = tetrahedron_rule(a + b + c)
    exact = factorial(a) * factorial(b) * factorial(c) / factorial(a + b + c + 3)
    got = np.sum(
        q.weights * q.points[:, 0] ** a * q.points[:, 1] ** b * q.points[:, 2] ** c
    )
    assert abs(got - exact) < 1e-13


def test_interval_quadrature():
    q = interval_rule(7)
    assert abs(np.sum(q.weights * q.points[:, 0] ** 7) - 1 / 8) < 1e-15


# -- modal bases ------------------------------------------------------------


@pytest.mark.parametrize("order", [1, 3, 6, 10])
def test_triangle_modal_orthonormal(order):
    q = triangle_rule(2 * order + 2)
    V, _ = ref.triangle_modal(q.points, order)
    gram = np.einsum("q,qi,qj->ij", q.weights, V, V)
    assert np.abs(gram - np.eye(V.shape[1])).max() < 1e-12


@pytest.mark.parametrize("order", [1, 3, 5])
def test_tet_modal_orthonormal(order):
    q = tetrahedron_rule(2 * order + 2)
    V, _ = ref.tet_modal(q.points, order)
    gram = np.einsum("q,qi,qj->ij", q.weights, V, V)
    assert np.abs(gram - np.eye(V.shape[1])).max() < 1e-11


def test_triangle_modal_gradients_fd():
    rng = np.random.default_rng(0)
    pts = rng.random((20, 2))
    pts = pts[pts.sum(1) < 0.95] * 0.9 + 0.02
    _, G = ref.triangle_modal(pts, 5)
    h = 1e-6
    for d in range(2):
        pp, pm = pts.copy(), pts.copy()
        pp[:, d] += h
        pm[:, d] -= h
        fd = (ref.triangle_modal(pp, 5)[0] - ref.triangle_modal(pm, 5)[0]) / (2 * h)
        assert np.abs(fd - G[:, :, d]).max() < 1e-6


def test_tet_modal_gradients_fd():
    rng = np.random.default_rng(1)
    pts = rng.random((30, 3))
    pts = pts[pts.sum(1) < 0.9] * 0.9 + 0.02
    _, G = ref.tet_modal(pts, 4)
    h = 1e-6
    for d in range(3):
        pp, pm = pts.copy(), pts.copy()
        pp[:, d] += h
        pm[:, d] -= h
        fd = (ref.tet_modal(pp, 4)[0] - ref.tet_modal(pm, 4)[0]) / (2 * h)
        assert np.abs(fd - G[:, :, d]).max() < 1e-5


@pytest.mark.parametrize("order", [1, 2, 4, 10])
def test_lagrange_triangle_delta_and_unity(order):
    eb = ref.lagrange_triangle(order)
    vn, _ = eb.tabulate(eb.nodes)
    assert np.abs(vn - np.eye(eb.n_basis)).max() < 1e-7
    v, _ = eb.tabulate(np.array([[0.3, 0.2], [0.1, 0.7]]))
    assert np.abs(v.sum(1) - 1).max() < 1e-9


def test_lagrange_tet_delta():
    eb = ref.lagrange_tet(3)
    vn, _ = eb.tabulate(eb.nodes)
    assert np.abs(vn - np.eye(eb.n_basis)).max() < 1e-9


def test_crouzeix_raviart():
    cr = ref.crouzeix_raviart_triangle()
    vn, _ = cr.tabulate(cr.nodes)
    assert np.abs(vn - np.eye(3)).max() < 1e-14


def test_bubble_enrichment():
    be = ref.bubble_enriched_triangle(1)
    v, _ = be.tabulate(np.array([[1 / 3, 1 / 3]]))
    assert abs(v[0, -1] - 1.0) < 1e-14  # bubble = 1 at barycenter
    # bubble vanishes on the boundary
    v, _ = be.tabulate(np.array([[0.5, 0.0], [0.0, 0.3], [0.6, 0.4]]))
    assert np.abs(v[:, -1]).max() < 1e-14


# -- meshes -----------------------------------------------------------------


def test_unit_square_mesh():
    m = unit_square_mesh(0.1)
    assert m.nv == 121 and m.ne == 200
    _, detJ, _ = m.element_jacobians
    assert abs(detJ.sum() / 2 - 1.0) < 1e-12
    tagged = sum(len(v) for v in m.boundary_tags.values())
    assert tagged == len(m.boundary_facets)


def test_channel_mesh():
    c = channel_with_cylinder_mesh(0.1)
    _, detJ, _ = c.element_jacobians
    exact = 2 * 0.41 - np.pi * 0.05**2
    assert abs(detJ.sum() / 2 - exact) / exact < 5e-3  # polygonal circle
    allt = np.concatenate([v for v in c.boundary_tags.values()])
    assert len(np.unique(allt)) == len(allt) == len(c.boundary_facets)
    assert len(c.boundary_tags["cyl"]) >= 12


# -- spaces + assembly ------------------------------------------------------


@pytest.mark.parametrize("order", [1, 2, 3])
def test_h1_continuity_via_interpolation(order):
    """Interpolating a polynomial of degree <= order is exact everywhere,
    which exercises shared-edge dof consistency between elements."""
    mesh = unit_square_mesh(0.34)
    V = H1(mesh, order)
    f = lambda p: (1.0 + p[:, 0] + p[:, 1]) ** order
    u = V.interpolate(f)
    t = asm.make_tables(V)
    uq = np.einsum("qi,eiq->eq", np.asarray(t.val), u[V.element_dofs][..., None])
    fq = f(np.asarray(t.qpts).reshape(-1, 2)).reshape(uq.shape)
    assert np.abs(uq - fq).max() < 1e-10


@pytest.mark.parametrize("order", [1, 2, 4])
def test_poisson_convergence(order):
    """Analytic-solution test: -lap u = f with u = sin(pi x) sin(pi y)."""
    import scipy.sparse.linalg as spla

    errs = []
    for h in [0.34, 0.17]:
        mesh = unit_square_mesh(h)
        V = H1(mesh, order, dirichlet="bottom|right|top|left")
        t = asm.make_tables(V)
        K = asm.stiffness_local(t)
        Kcsr = asm.assemble_csr(K, V.element_dofs, V.ndof)
        f = lambda p: 2 * np.pi**2 * np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])
        uex = lambda p: np.sin(np.pi * p[:, 0]) * np.sin(np.pi * p[:, 1])
        fq = f(np.asarray(t.qpts).reshape(-1, 2)).reshape(t.qpts.shape[:2])
        rhs = np.asarray(
            asm.scatter_add(asm.linear_form_local(t, jnp.asarray(fq)), t.eldofs, V.ndof)
        )
        free = V.free_mask
        u = np.zeros(V.ndof)
        u[free] = spla.spsolve(Kcsr[free][:, free].tocsc(), rhs[free])
        uq = np.asarray(t.val) @ u[V.element_dofs].T
        uexq = uex(np.asarray(t.qpts).reshape(-1, 2)).reshape(t.qpts.shape[:2]).T
        err = np.sqrt(
            np.einsum("q,qe,e->", np.asarray(t.qw), (uq - uexq) ** 2, np.asarray(t.detj))
        )
        errs.append(err)
    rate = np.log2(errs[0] / errs[1])
    assert rate > order + 0.5  # expect order+1


def test_matrix_free_matches_csr():
    mesh = unit_square_mesh(0.2)
    V = H1(mesh, 3)
    t = asm.make_tables(V)
    K = asm.stiffness_local(t)
    Kcsr = asm.assemble_csr(K, V.element_dofs, V.ndof)
    rng = np.random.default_rng(3)
    u = rng.standard_normal(V.ndof)
    y1 = np.asarray(asm.apply_local_matrices(K, t.eldofs, V.ndof, jnp.asarray(u)))
    y2 = Kcsr @ u
    assert np.abs(y1 - y2).max() < 1e-11
    d1 = np.asarray(asm.diagonal_of_local(K, t.eldofs, V.ndof))
    assert np.abs(d1 - Kcsr.diagonal()).max() < 1e-11


def test_l2_and_nonconforming_spaces():
    mesh = unit_square_mesh(0.25)
    Q = L2(mesh, 1)
    assert Q.ndof == mesh.ne * 3
    CR = Nonconforming(mesh, dirichlet="bottom")
    assert CR.ndof == mesh.nedge
    mask = CR.boundary_dof_mask("bottom")
    assert mask.sum() == len(mesh.boundary_tags["bottom"])


def test_vector_space_layout():
    mesh = unit_square_mesh(0.25)
    V = VectorH1(mesh, 2, dirichlet="left")
    assert V.ndof == 2 * V.scalar.ndof
    u = V.interpolate(lambda p: np.stack([p[:, 0], 2 * p[:, 1]], axis=1))
    n = V.scalar.ndof
    # component-major layout
    ux = V.scalar.interpolate(lambda p: p[:, 0])
    assert np.abs(u[:n] - ux).max() < 1e-14
