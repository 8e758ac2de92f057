"""Auxiliary-space P1 coarse correction for 3D [H(div) | facet] systems.

3D counterpart of the 2D transfer in models/stokes_hybrid.py (the
reference's MypreA structure): embed a continuous vector-P1 field into the
BDM+facet space by
  * face dofs: moments of the linear field (exact),
  * facet dofs: frame coefficients of its tangential trace (exact),
  * interior dofs: per-element L2-optimal completion (reproduces vector
    linears exactly, so the Galerkin coarse operator is exactly the vector
    P1 Laplacian),
plus the exact transpose, combined additively with a face-block smoother.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.quadrature import tetrahedron_rule, triangle_rule
from ..fem.reference import triangle_modal
from ..fem.spaces import H1
from ..ops import assembly as asm
from ..precond.twolevel import coarse_p1_solver


def hybrid_h1_embedding_3d(V, dtype=jnp.float64):
    """(T, TT) for a HybridVelocitySpace3D; coarse vectors are (3*nv,)
    component-major."""
    mesh = V.mesh
    hd = V.hdiv
    k = hd.order
    nfd_v = hd.n_face_dofs
    nss = V.facet.n_scalar
    nfd_f = V.facet.n_face
    nv = mesh.nv
    nV = V.ndof

    # c_{j,v} = int_T phi_j lambda_v over the unit triangle.  Tabulated
    # separately per order: triangle_modal's mode ordering means the first
    # columns of a higher-order tabulation are NOT the lower-order modes.
    rule2 = triangle_rule(2 * max(k, V.facet.order) + 2)
    phi_v, _ = triangle_modal(rule2.points, k)
    phi_f, _ = triangle_modal(rule2.points, V.facet.order)
    lam2 = np.concatenate(
        [1 - rule2.points.sum(1, keepdims=True), rule2.points], axis=1
    )
    cjv = np.einsum("q,qj,qv->jv", rule2.weights, phi_v, lam2)  # (nphi, 3)
    cjv_fac = np.einsum("q,qj,qv->jv", rule2.weights, phi_f, lam2)

    pts = mesh.points
    faces = mesh.faces  # sorted vertices
    fv = pts[faces]
    E1 = fv[:, 1] - fv[:, 0]
    E2 = fv[:, 2] - fv[:, 0]
    nsc = np.cross(E1, E2)  # (nface, 3) scaled normal (Piola moment normal)
    G = np.stack(
        [
            np.stack([np.einsum("fc,fc->f", E1, E1), np.einsum("fc,fc->f", E1, E2)], -1),
            np.stack([np.einsum("fc,fc->f", E2, E1), np.einsum("fc,fc->f", E2, E2)], -1),
        ],
        axis=1,
    )  # (nface, 2, 2)
    Ginv = np.linalg.inv(G)
    nhat = nsc / np.linalg.norm(nsc, axis=1, keepdims=True)

    faces_j = jnp.asarray(faces, jnp.int32)
    nsc_j = jnp.asarray(nsc, dtype)
    E_j = jnp.asarray(np.stack([E1, E2], axis=1), dtype)  # (nface, 2, 3)
    Ginv_j = jnp.asarray(Ginv, dtype)
    nhat_j = jnp.asarray(nhat, dtype)
    cjv_v = jnp.asarray(cjv[:nfd_v], dtype)  # hdiv face moments
    cjv_f = jnp.asarray(cjv_fac[:nss], dtype)  # facet scalar moments

    # ---- interior completion tables ----------------------------------
    n_int = hd.bases[0].n_cell
    nbv = hd.n_basis
    n_face_tot = 4 * nfd_v
    J, detJ, _ = mesh.element_jacobians
    vol = tetrahedron_rule(2 * k + 2)
    vals_ref, _ = hd.tabulate_elements(vol.points)  # (ne, nq, nb, 3)
    M_e = np.einsum("eca,ecb->eab", J, J) / detJ[:, None, None]
    Gm = np.einsum(
        "q,eqia,eab,eqjb->eij", vol.weights, vals_ref, M_e, vals_ref,
        optimize=True,
    )
    lam3 = np.concatenate(
        [1 - vol.points.sum(1, keepdims=True), vol.points], axis=1
    )  # (nq, 4)
    t_mat = np.einsum(
        "q,eqia,eca,qv->eicv", vol.weights, vals_ref, J, lam3, optimize=True
    ).reshape(mesh.ne, nbv, 12)  # (c, v) flattened c*4+v

    # S[e, local-face-dof, (c,v)]: global face moments from element vertex
    # values (vertex positions of each face's sorted-global vertices)
    els = mesh.elements
    S = np.zeros((mesh.ne, n_face_tot, 12))
    for lf in range(4):
        fid = mesh.element_faces[:, lf]
        gvert = faces[fid]  # (ne, 3) sorted global ids
        # position of each face vertex among the element's vertices
        pos = np.argmax(els[:, :, None] == gvert[:, None, :], axis=1)  # (ne,3)
        for j in range(nfd_v):
            for v in range(3):
                for c in range(3):
                    S[np.arange(mesh.ne), lf * nfd_v + j, c * 4 + pos[:, v]] += (
                        cjv[j, v] * nsc[fid, c]
                    )
    G_ii = Gm[:, n_face_tot:, n_face_tot:]
    G_ie = Gm[:, n_face_tot:, :n_face_tot]
    rhs_int = t_mat[:, n_face_tot:, :] - np.einsum(
        "eij,ejv->eiv", G_ie, S, optimize=True
    )
    M_int = np.linalg.solve(G_ii, rhs_int)  # (ne, n_int, 12)
    M_int_j = jnp.asarray(M_int, dtype)
    elverts = jnp.asarray(els, jnp.int32)
    off_c = mesh.nface * nfd_v
    int_dofs = jnp.asarray(
        off_c + np.arange(mesh.ne)[:, None] * n_int + np.arange(n_int)[None, :],
        jnp.int32,
    )
    nface = mesh.nface

    def T(c):
        c2 = c.reshape(3, nv)
        wf = c2[:, faces_j]  # (3, nface, 3verts)
        out = jnp.zeros(nV, c.dtype)
        # hdiv face moments
        wn = jnp.einsum("cfv,fc->fv", wf, nsc_j)  # (nface, 3)
        mom = jnp.einsum("jv,fv->fj", cjv_v, wn)
        idx = (jnp.arange(nface)[:, None] * nfd_v + jnp.arange(nfd_v)[None, :])
        out = out.at[idx.reshape(-1)].set(mom.reshape(-1))
        # facet tangential frame coefficients
        wE = jnp.einsum("cfv,fdc->fdv", wf, E_j)  # (nface, 2, 3v)
        mE = jnp.einsum("jv,fdv->fjd", cjv_f, wE)  # (nface, nss, 2)
        coef = jnp.einsum("fde,fje->fjd", Ginv_j, mE)  # (nface, nss, 2)
        base = hd.ndof + jnp.arange(nface)[:, None, None] * nfd_f
        idx_f = base + (jnp.arange(nss)[None, :, None] * 2
                        + jnp.arange(2)[None, None, :])
        out = out.at[idx_f.reshape(-1)].set(coef.reshape(-1))
        # interior completion
        wv = c2[:, elverts]  # (3, ne, 4)
        wv12 = jnp.concatenate([wv[0], wv[1], wv[2]], axis=1)  # (ne, 12)
        ci = jnp.einsum("eiv,ev->ei", M_int_j, wv12)
        out = out.at[int_dofs].set(ci)
        return out

    def TT(x):
        out = jnp.zeros((3, nv), x.dtype)
        idx = (jnp.arange(nface)[:, None] * nfd_v + jnp.arange(nfd_v)[None, :])
        mom = x[idx]  # (nface, nfd_v)
        wn_adj = jnp.einsum("jv,fj->fv", cjv_v, mom)  # (nface, 3v)
        contrib = jnp.einsum("fv,fc->cfv", wn_adj, nsc_j)
        out = out.at[:, faces_j].add(contrib)
        base = hd.ndof + jnp.arange(nface)[:, None, None] * nfd_f
        idx_f = base + (jnp.arange(nss)[None, :, None] * 2
                        + jnp.arange(2)[None, None, :])
        coef = x[idx_f]  # (nface, nss, 2)
        mE_adj = jnp.einsum("fde,fjd->fje", Ginv_j, coef)  # Ginv symmetric
        wE_adj = jnp.einsum("jv,fje->fev", cjv_f, mE_adj)  # (nface, 2, 3v)
        contrib2 = jnp.einsum("fev,fec->cfv", wE_adj, E_j)
        out = out.at[:, faces_j].add(contrib2)
        xi = x[int_dofs]
        gv = jnp.einsum("eiv,ei->ev", M_int_j, xi)  # (ne, 12)
        out = out.at[0, elverts].add(gv[:, :4])
        out = out.at[1, elverts].add(gv[:, 4:8])
        out = out.at[2, elverts].add(gv[:, 8:])
        return out.reshape(-1)

    return T, TT


def build_auxspace_preconditioner_3d(
    V, A_np, velocity_dirichlet: str, dtype=jnp.float64,
    coarse_coefficient: float = 1.0,
):
    """Face-block smoother + vector-P1 coarse correction (additive)."""
    from .stokes_hybrid3d import build_faceblock_preconditioner_3d

    smooth = build_faceblock_preconditioner_3d(V, A_np, dtype)
    T, TT = hybrid_h1_embedding_3d(V, dtype)
    mesh = V.mesh
    space = H1(mesh, 1, dirichlet=velocity_dirichlet)
    solve1 = coarse_p1_solver(space, coarse_coefficient, dtype)
    nv = mesh.nv
    free = jnp.asarray(V.free_mask)

    def coarse(r):
        r3 = r.reshape(3, nv)
        return jnp.stack([solve1(r3[c]) for c in range(3)]).reshape(-1)

    def preA(u):
        uf = jnp.where(free, u, 0.0)
        y = smooth(uf) + T(coarse(TT(uf)))
        return jnp.where(free, y, u)

    return preA
