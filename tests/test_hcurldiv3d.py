"""Unit tests for the 3D H(curl,div) tet stress element (fem/hcurldiv3d).

The element backs the dimension-generic MCS NavierStokes — the reference's
``HCurlDiv(mesh, order=k-1, orderinner=k, discontinuous=True)`` on tets
(/root/reference/templates/NavierStokesSIMPLE_iterative.py:27).
"""

import numpy as np
import pytest

from navier_stokes_tpu.fem.hcurldiv3d import hcurldiv_tet
from navier_stokes_tpu.fem.quadrature import triangle_rule
from navier_stokes_tpu.fem.reference import (
    TET_FACES,
    TET_VERTICES,
    triangle_modal,
    triangle_modal_indices,
)


def _face_moment_matrix(basis, kt):
    """All face nt-moment rows of the basis, split (kept, constrained)."""
    k = basis.order
    q2 = triangle_rule(2 * k + 2)
    fv, _ = triangle_modal(q2.points, k)
    deg = [i + j for (i, j) in triangle_modal_indices(k)]
    kept, constrained = [], []
    for lf in range(4):
        verts = [TET_VERTICES[v] for v in TET_FACES[lf]]
        e1, e2 = verts[1] - verts[0], verts[2] - verts[0]
        nsc = np.cross(e1, e2)
        pts = (
            verts[0][None]
            + q2.points[:, 0:1] * e1[None]
            + q2.points[:, 1:2] * e2[None]
        )
        vals, _ = basis.tabulate(pts)
        sn = np.einsum("qnij,j->qni", vals, nsc)
        for tang in (e1, e2):
            snt = sn @ tang
            for j in range(fv.shape[1]):
                row = np.einsum("q,q,qn->n", q2.weights, fv[:, j], snt)
                (kept if deg[j] <= kt else constrained).append(row)
    return np.stack(kept), (
        np.stack(constrained) if constrained else np.zeros((0, basis.n_basis))
    )


@pytest.mark.parametrize("k,kt", [(1, 1), (2, 1), (2, 2)])
def test_dimensions(k, kt):
    b = hcurldiv_tet(k, kt)
    M = (k + 1) * (k + 2) * (k + 3) // 6
    n_con = 8 * ((k + 1) * (k + 2) // 2 - (kt + 1) * (kt + 2) // 2)
    assert b.n_basis == 8 * M - n_con
    assert b.n_face == 2 * (kt + 1) * (kt + 2) // 2
    assert b.n_cell == b.n_basis - 4 * b.n_face


def test_trace_free():
    b = hcurldiv_tet(2, 1)
    rng = np.random.default_rng(3)
    pts = rng.random((40, 3)) * 0.3
    vals, _ = b.tabulate(pts)
    assert np.abs(np.einsum("qnii->qn", vals)).max() < 1e-12


@pytest.mark.parametrize("k,kt", [(2, 1), (3, 2)])
def test_reduced_nt_trace_degree(k, kt):
    """Every basis function's (sigma n)_t has degree <= kt on each face —
    the orderinner trick that matches the tangential facet space degree."""
    b = hcurldiv_tet(k, kt)
    kept, constrained = _face_moment_matrix(b, kt)
    assert np.abs(constrained).max() < 1e-12


def test_face_moment_duality():
    """Face dofs are dual to the kept nt-moments; cell dofs kill them."""
    b = hcurldiv_tet(2, 1)
    kept, _ = _face_moment_matrix(b, 1)
    nk = 4 * b.n_face
    assert np.abs(kept[:, :nk] - np.eye(nk)).max() < 1e-12
    assert np.abs(kept[:, nk:]).max() < 1e-12


def test_gradient_consistency():
    """tabulate()'s grads match finite differences of its vals."""
    b = hcurldiv_tet(2, 1)
    rng = np.random.default_rng(5)
    pts = 0.1 + 0.15 * rng.random((10, 3))
    h = 1e-6
    _, grads = b.tabulate(pts)
    for d in range(3):
        dp = pts.copy()
        dp[:, d] += h
        dm = pts.copy()
        dm[:, d] -= h
        fd = (b.tabulate(dp)[0] - b.tabulate(dm)[0]) / (2 * h)
        assert np.abs(fd - grads[..., d]).max() < 1e-6
