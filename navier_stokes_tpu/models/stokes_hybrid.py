"""Hybrid-DG Stokes on H(div) x tangential-facet spaces (BDM/RT).

The reference's ACTIVE benchmark configuration (run.py:277-282, "HDG BDM 2")
and its solve family ``solve_hybrid`` (/root/reference/run.py:114-172):

  a(u, v) = int grad u : grad v
          + sum_T int_dT (grad u n) . tang(vhat - v)
          + sum_T int_dT (grad v n) . tang(uhat - u)
          + sum_T int_dT (alpha k^2 / h) tang(uhat - u) . tang(vhat - v)
  b(u, q) = int div(u) q

with u in BDM_k (normal-continuous, Piola-mapped), uhat the tangential
facet field, q in discontinuous P_{k-1}.  Element-local matrices over the
combined [volume | facet] dof block are assembled host-side in float64 as
batched einsum chains, orientation signs folded in, then shipped to device
and applied matrix-free with the standard gather-einsum-scatter machinery.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.hdiv import (
    HDivSpace,
    TangentialFacetSpace,
    legendre_01,
)
from ..fem.spaces import FunctionSpace
from ..ops import assembly as asm
from ..ops.facets import facet_geometry
from ..fem.quadrature import triangle_rule
from .stokes import StokesSystem, default_volume_force


@dataclass
class HybridVelocitySpace:
    """Combined [HDiv | tangential facet] velocity space
    (the reference's FESpace([V, Vhat]), discretizations.py:66)."""

    hdiv: HDivSpace
    facet: TangentialFacetSpace

    @property
    def mesh(self):
        return self.hdiv.mesh

    @property
    def ndof(self) -> int:
        return self.hdiv.ndof + self.facet.ndof

    @property
    def order(self) -> int:
        return self.hdiv.order

    @cached_property
    def free_mask(self) -> np.ndarray:
        return np.concatenate([self.hdiv.free_mask, self.facet.free_mask])

    @cached_property
    def element_dofs(self) -> np.ndarray:
        """(ne, nb_v + 3*nf) combined dof table."""
        mesh = self.mesh
        nfd = self.facet.n_edge
        fac = np.zeros((mesh.ne, 3 * nfd), dtype=np.int32)
        for le in range(3):
            base = self.hdiv.ndof + mesh.element_edges[:, le] * nfd
            for j in range(nfd):
                fac[:, le * nfd + j] = base + j
        return np.concatenate([self.hdiv.element_dofs, fac], axis=1)

    @cached_property
    def element_signs(self) -> np.ndarray:
        signs_f = np.ones((self.mesh.ne, 3 * self.facet.n_edge))
        return np.concatenate([self.hdiv.element_signs, signs_f], axis=1)


def interpolate_hybrid_boundary(V: HybridVelocitySpace, uin, names: str,
                                nq1: int = 8) -> np.ndarray:
    """Boundary interpolation of a velocity field onto (normal moments,
    tangential facet moments) of the named edges — the GridFunction.Set
    equivalent for the hybrid pair (run.py:162-164)."""
    from ..fem.quadrature import gauss_legendre_01

    mesh = V.mesh
    t, w = gauss_legendre_01(nq1)
    u = np.zeros(V.ndof)
    ne_d, nf_d = V.hdiv.basis.n_edge, V.facet.n_edge
    fids = mesh.boundary_facet_ids(names)
    ev = mesh.points[mesh.edges[fids]]  # (nb, 2, 2)
    pa, pb = ev[:, 0], ev[:, 1]
    # quad points along the global direction
    pts = pa[:, None, :] + t[None, :, None] * (pb - pa)[:, None, :]
    vals = uin(pts.reshape(-1, 2)).reshape(len(fids), nq1, 2)
    dvec = pb - pa  # scaled tangent (length = edge length)
    nvec = np.stack([dvec[:, 1], -dvec[:, 0]], axis=1)  # scaled normal
    tau_unit = dvec / np.linalg.norm(dvec, axis=1, keepdims=True)
    for j in range(max(ne_d, nf_d)):
        Lj = legendre_01(t, j)
        if j < ne_d:
            # c = int (u . n_scaled) L_j dt  (Piola-invariant moment)
            mom = np.einsum("q,bqc,bc,q->b", w, vals, nvec, Lj, optimize=True)
            u[fids * ne_d + j] = mom
        if j < nf_d:
            mom = np.einsum("q,bqc,bc,q->b", w, vals, tau_unit, Lj, optimize=True)
            u[V.hdiv.ndof + fids * nf_d + j] = mom
    return u


def assemble_hdg_stokes(
    V: HybridVelocitySpace,
    Q: FunctionSpace,
    alpha: float = 10.0,
    nu: float = 1.0,
):
    """(A_loc, B_loc, eldofs, quality) for the HDG Stokes forms.

    Host-side float64 batched assembly; orientation signs folded into the
    local matrices.  Returns also the volume-force local vectors builder.
    """
    mesh = V.mesh
    hb = V.hdiv.basis
    k = hb.order
    nbv = hb.n_basis
    nfd = V.facet.n_edge
    nloc = nbv + 3 * nfd

    J, detJ, Jinv = mesh.element_jacobians
    vol = triangle_rule(2 * k + 2)
    fg = facet_geometry(mesh, k + 3)

    # --- volume term: int grad u : grad v (Piola gradients) --------------
    vhat, ghat = hb.tabulate(vol.points)  # (nq,nb,2), (nq,nb,2,2)
    # grad_phys[e,q,i,c,d] = (J ghat Jinv)[c,d]/detJ
    gp = np.einsum("ecA,qiAB,eBd->eqicd", J, ghat, Jinv, optimize=True) / detJ[:, None, None, None, None]
    A = np.zeros((mesh.ne, nloc, nloc))
    A[:, :nbv, :nbv] = nu * np.einsum(
        "q,eqicd,eqjcd,e->eij", vol.weights, gp, gp, detJ
    , optimize=True)

    # --- facet terms ------------------------------------------------------
    nq1 = len(fg.t)
    for le in range(3):
        pts = fg.ref_points[le]  # (nq1, 2)
        tv, tg = hb.tabulate(pts)
        # physical traces: value (Piola), gradient
        val_p = np.einsum("ecA,qiA->eqic", J, tv, optimize=True) / detJ[:, None, None, None]
        grad_p = np.einsum("ecA,qiAB,eBd->eqicd", J, tg, Jinv, optimize=True) / detJ[:, None, None, None, None]
        n = fg.normal[:, le]  # (ne, 2)
        # gn[e,q,i,c] = (grad u_i n)_c
        gn_v = np.einsum("eqicd,ed->eqic", grad_p, n, optimize=True)
        # tang(trace): v - (v.n)n
        vn = np.einsum("eqic,ec->eqi", val_p, n, optimize=True)
        tang_v = val_p - vn[..., None] * n[:, None, None, :]
        # facet basis values: L_j(t_global) * tau_global (already tangential)
        tgl = fg.t_global[:, le]  # (ne, nq1)
        leg = np.stack([legendre_01(tgl, j) for j in range(nfd)], axis=2)
        # (ne, nq1, nfd)
        fvals = leg[..., None] * fg.tau_global[:, le][:, None, None, :]
        # embed this edge's facet dofs in the full 3*nfd facet block
        fall = np.zeros((mesh.ne, nq1, 3 * nfd, 2))
        fall[:, :, le * nfd: (le + 1) * nfd, :] = fvals
        # jump basis [nloc]: facet dofs +, volume dofs -
        jump = np.concatenate([-tang_v, fall], axis=2)  # (ne,nq1,nloc,2)
        gn = np.concatenate(
            [gn_v, np.zeros_like(fall)], axis=2
        )  # (ne,nq1,nloc,2)
        ds = fg.elen[:, le]  # weight scale per element
        # sliver-robust interior-penalty scaling alpha k^2 |e|/|T| (the
        # 1/h form of run.py:138 loses coercivity on thin Delaunay
        # triangles near the curved boundary; |e|/|T| ~ 1/h on shape-
        # regular elements but tracks the true inverse-trace constant)
        pen = alpha * k * k * fg.elen[:, le] / detJ
        wq = fg.w
        A += nu * (
            np.einsum("q,eqic,eqjc,e->eij", wq, jump, gn, ds, optimize=True)
            + np.einsum("q,eqic,eqjc,e->eij", wq, gn, jump, ds, optimize=True)
            + np.einsum("q,eqic,eqjc,e,e->eij", wq, jump, jump, ds, pen, optimize=True)
        )

    # --- b-form: int div(u) q --------------------------------------------
    tp = Q.basis.tabulate(vol.points)[0]  # (nq, nbp)
    divhat = np.einsum("qicc->qi", ghat)  # reference divergence
    div_p = divhat[None] / detJ[:, None, None]  # (ne, nq, nbv)
    B = np.zeros((mesh.ne, tp.shape[1], nloc))
    B[:, :, :nbv] = np.einsum(
        "q,qp,eqi,e->epi", vol.weights, tp, div_p, detJ
    , optimize=True)

    # fold orientation signs
    s = V.element_signs
    A = A * s[:, :, None] * s[:, None, :]
    B = B * s[:, None, :]

    # volume-force local vectors: int f . v (Piola values)
    qpts_phys = mesh.points[mesh.elements[:, 0]][:, None, :] + np.einsum(
        "eab,qb->eqa", J, vol.points
    , optimize=True)

    def force_local(force):
        fq = force(qpts_phys.reshape(-1, 2)).reshape(mesh.ne, -1, 2)
        vv = np.einsum("ecA,qiA->eqic", J, vhat, optimize=True) / detJ[:, None, None, None]
        fe = np.zeros((mesh.ne, nloc))
        fe[:, :nbv] = np.einsum("q,eqc,eqic,e->ei", vol.weights, fq, vv, detJ, optimize=True)
        return fe * s

    return A, B, force_local


def assemble_hdg_stokes_curved(
    V: HybridVelocitySpace,
    Q: FunctionSpace,
    geometry,
    alpha: float = 10.0,
    nu: float = 1.0,
):
    """Curved-geometry (isoparametric) HDG Stokes assembly.

    The reference curves the cylinder to order 3 for every benchmark
    (/root/reference/run.py:28); straight-sided Piola elements solve a
    perturbed geometry (VERDICT.md round-2 item 5).  With a non-affine map
    x(xhat) the Piola value is u = J(xhat) uhat / detJ(xhat) and its
    gradient picks up geometry-curvature terms

      du_c/dx_d = [ (H_cAB uhat_A + J_cA ghat_AB)/detJ
                    - u_c d_B(detJ) / detJ ] (Jinv)_Bd,

    with H the geometry Hessian; ``div u = divhat uhat / detJ`` stays exact
    (Piola identity), so the divergence coupling B is unchanged.  Facet
    integrals use the exact curved scaled normal detJ J^{-T} nhat (whose
    length IS the curved surface measure).  Interior edges of a
    boundary-curved mesh remain straight (only cylinder-edge geometry
    nodes move), so the facet-space parametrization is unchanged; the
    curved cylinder edges carry Dirichlet facet dofs.
    """
    from ..mesh.curved import geometry_hessian, geometry_tables

    mesh = V.mesh
    hb = V.hdiv.basis
    k = hb.order
    nbv = hb.n_basis
    nfd = V.facet.n_edge
    nloc = nbv + 3 * nfd
    ne = mesh.ne

    vol = triangle_rule(2 * k + 4)
    w = vol.weights
    J, detJ, Jinv, xq = geometry_tables(geometry, vol.points)
    H = geometry_hessian(geometry, vol.points)
    # d_B detJ (2D cofactor expansion)
    ddet = (
        H[..., 0, 0, :] * J[..., 1, 1, None]
        + J[..., 0, 0, None] * H[..., 1, 1, :]
        - H[..., 0, 1, :] * J[..., 1, 0, None]
        - J[..., 0, 1, None] * H[..., 1, 0, :]
    )  # (ne, nq, 2B)

    vhat, ghat = hb.tabulate(vol.points)

    def piola(Jq, detq, Hq, ddetq, Jinvq, vh, gh):
        """(val_p, grad_p) for per-qp geometry tables."""
        val = np.einsum("eqcA,qiA->eqic", Jq, vh, optimize=True) / detq[..., None, None]
        t1 = (
            np.einsum("eqcAB,qiA->eqicB", Hq, vh, optimize=True)
            + np.einsum("eqcA,qiAB->eqicB", Jq, gh, optimize=True)
        ) / detq[..., None, None, None]
        t1 -= val[..., None] * (ddetq / detq[..., None])[:, :, None, None, :]
        grad = np.einsum("eqicB,eqBd->eqicd", t1, Jinvq, optimize=True)
        return val, grad

    val_p, grad_p = piola(J, detJ, H, ddet, Jinv, vhat, ghat)
    A = np.zeros((ne, nloc, nloc))
    A[:, :nbv, :nbv] = nu * np.einsum(
        "q,eqicd,eqjcd,eq->eij", w, grad_p, grad_p, detJ, optimize=True
    )

    # --- facet terms -----------------------------------------------------
    fg = facet_geometry(mesh, k + 4)
    from ..fem.reference import TRI_EDGES

    _, detJ_aff, _ = mesh.element_jacobians
    ref_n_sc = {
        0: np.array([0.0, -1.0]),
        1: np.array([1.0, 1.0]),
        2: np.array([-1.0, 0.0]),
    }
    for le in range(3):
        pts = fg.ref_points[le]
        nq1 = len(pts)
        Jf, detf, Jinvf, xf = geometry_tables(geometry, pts)
        Hf = geometry_hessian(geometry, pts)
        ddetf = (
            Hf[..., 0, 0, :] * Jf[..., 1, 1, None]
            + Jf[..., 0, 0, None] * Hf[..., 1, 1, :]
            - Hf[..., 0, 1, :] * Jf[..., 1, 0, None]
            - Jf[..., 0, 1, None] * Hf[..., 1, 0, :]
        )
        tv, tg = hb.tabulate(pts)
        v_tp, g_tp = piola(Jf, detf, Hf, ddetf, Jinvf, tv, tg)
        # curved scaled outward normal: detJ J^{-T} nhat_sc; |.| = ds/dt
        nsc = np.einsum(
            "eq,eqBc,B->eqc", detf, Jinvf, ref_n_sc[le], optimize=True
        )
        dsq = np.linalg.norm(nsc, axis=-1)  # (ne, nq1)
        n_unit = nsc / dsq[..., None]
        gn_v = np.einsum("eqicd,eqd->eqic", g_tp, n_unit, optimize=True)
        vn = np.einsum("eqic,eqc->eqi", v_tp, n_unit, optimize=True)
        tang_v = v_tp - vn[..., None] * n_unit[:, :, None, :]
        tgl = fg.t_global[:, le]
        leg = np.stack([legendre_01(tgl, j) for j in range(nfd)], axis=2)
        fvals = leg[..., None] * fg.tau_global[:, le][:, None, None, :]
        fall = np.zeros((ne, nq1, 3 * nfd, 2))
        fall[:, :, le * nfd: (le + 1) * nfd, :] = fvals
        jump = np.concatenate([-tang_v, fall], axis=2)
        gn = np.concatenate([gn_v, np.zeros_like(fall)], axis=2)
        pen = alpha * k * k * fg.elen[:, le] / detJ_aff
        A += nu * (
            np.einsum("q,eqic,eqjc,eq->eij", fg.w, jump, gn, dsq, optimize=True)
            + np.einsum("q,eqic,eqjc,eq->eij", fg.w, gn, jump, dsq, optimize=True)
            + np.einsum("q,eqic,eqjc,eq,e->eij", fg.w, jump, jump, dsq, pen, optimize=True)
        )

    # --- b-form: int div(u) q = int_ref divhat qhat (Piola identity) -----
    tp = Q.basis.tabulate(vol.points)[0]
    divhat = np.einsum("qicc->qi", ghat)
    B = np.zeros((ne, tp.shape[1], nloc))
    B[:, :, :nbv] = np.einsum("q,qp,qi->pi", w, tp, divhat)[None]

    s = V.element_signs
    A = A * s[:, :, None] * s[:, None, :]
    B = B * s[:, None, :]

    def force_local(force):
        fq = force(xq.reshape(-1, 2)).reshape(ne, -1, 2)
        fe = np.zeros((ne, nloc))
        fe[:, :nbv] = np.einsum(
            "q,eqc,eqic,eq->ei", w, fq, val_p, detJ, optimize=True
        )
        return fe * s

    return A, B, force_local


def hybrid_h1_embedding(V: HybridVelocitySpace, dtype=jnp.float64,
                        interior: bool = True):
    """(T, T^T): embed a vector P1 field (2, nv) -> hybrid dofs.

    Edge dofs: normal/tangential moments (exact for linears).  Interior
    dofs (``interior=True``): per-element L2-best completion given the edge
    moments — the role of the reference's facet-block ``einv`` transfer
    solve (NavierStokesSIMPLE_iterative.py:249-291): without it the
    embedded function's tangential trace is uncontrolled and the HDG
    penalty term destroys the auxiliary-space stability.  Vector linears
    are reproduced exactly.
    """
    mesh = V.mesh
    ne_d, nf_d = V.hdiv.basis.n_edge, V.facet.n_edge
    edges = jnp.asarray(mesh.edges, jnp.int32)
    ev = mesh.points[mesh.edges]
    dvec = ev[:, 1] - ev[:, 0]
    nvec = np.stack([dvec[:, 1], -dvec[:, 0]], axis=1)  # scaled normal
    tau = dvec / np.linalg.norm(dvec, axis=1, keepdims=True)
    nvec_j = jnp.asarray(nvec, dtype)
    tau_j = jnp.asarray(tau, dtype)
    # int (1-t) L_j dt, int t L_j dt for orthonormal Legendre on [0,1]
    c0 = np.array([0.5, -np.sqrt(3.0) / 6.0])  # weight of endpoint a, j=0,1
    c1 = np.array([0.5, np.sqrt(3.0) / 6.0])
    nV = V.ndof
    nv = mesh.nv
    njmax = min(2, ne_d)
    njmax_f = min(2, nf_d)

    # -- interior completion: M_int[e] maps the element's 6 vertex-velocity
    # values to the interior BDM coefficients minimizing the element-L2
    # distance to the linear field, given the (already set) edge moments.
    n_int = V.hdiv.basis.n_cell
    if interior and n_int > 0:
        hb = V.hdiv.basis
        nbv = hb.n_basis
        n_edge_tot = 3 * ne_d
        q = triangle_rule(2 * hb.order + 2)
        vals_ref, _ = hb.tabulate(q.points)  # (nq, nbv, 2)
        J, detJ, _ = mesh.element_jacobians
        # metric for the physical L2 norm of Piola-mapped fields
        M_e = np.einsum("eca,ecb->eab", J, J, optimize=True) / detJ[:, None, None]
        G = np.einsum("q,qia,eab,qjb->eij", q.weights, vals_ref, M_e, vals_ref, optimize=True)
        # t_mat[e, i, (c,v)] = int uhat_i^T J^T e_c lambda_v
        lam = np.concatenate(
            [1.0 - q.points.sum(1, keepdims=True), q.points], axis=1
        )  # (nq, 3)
        t_mat = np.einsum(
            "q,qia,eca,qv->eicv", q.weights, vals_ref, J, lam
        , optimize=True).reshape(mesh.ne, nbv, 6)
        # S[e, edge-local-dof, (c,v)]: local edge coefficients from the
        # element's vertex values (local = sign * global edge formula)
        S = np.zeros((mesh.ne, n_edge_tot, 6))
        from ..fem.reference import TRI_EDGES

        glob_edges = mesh.edges  # (nedge, 2) sorted: global direction a->b
        for le in range(3):
            eid = mesh.element_edges[:, le]
            ga, gb = glob_edges[eid, 0], glob_edges[eid, 1]
            nsc = nvec[eid]  # (ne, 2) scaled normal of the global edge
            # position of ga, gb among element's vertices
            els = mesh.elements
            pos_a = np.argmax(els == ga[:, None], axis=1)
            pos_b = np.argmax(els == gb[:, None], axis=1)
            sgn = V.hdiv.element_signs[:, le * ne_d: (le + 1) * ne_d]
            for j in range(njmax):
                for c in range(2):
                    S[np.arange(mesh.ne), le * ne_d + j, c * 3 + pos_a] += (
                        sgn[:, j] * c0[j] * nsc[:, c]
                    )
                    S[np.arange(mesh.ne), le * ne_d + j, c * 3 + pos_b] += (
                        sgn[:, j] * c1[j] * nsc[:, c]
                    )
        G_ii = G[:, n_edge_tot:, n_edge_tot:]
        G_ie = G[:, n_edge_tot:, :n_edge_tot]
        rhs_int = t_mat[:, n_edge_tot:, :] - np.einsum("eij,ejv->eiv", G_ie, S, optimize=True)
        M_int = np.linalg.solve(G_ii, rhs_int)  # (ne, n_int, 6)
        M_int_j = jnp.asarray(M_int, dtype)
        elverts = jnp.asarray(mesh.elements, jnp.int32)
        off_c = mesh.nedge * ne_d
        int_dofs = jnp.asarray(
            off_c
            + np.arange(mesh.ne)[:, None] * n_int
            + np.arange(n_int)[None, :],
            jnp.int32,
        )
    else:
        M_int_j = None

    def T(c):
        c2 = c.reshape(2, nv)
        wa = c2[:, edges[:, 0]].T  # (nedge, 2)
        wb = c2[:, edges[:, 1]].T
        out = jnp.zeros(nV, c.dtype)
        for j in range(njmax):
            mom = (c0[j] * wa + c1[j] * wb)
            out = out.at[jnp.arange(mesh.nedge) * ne_d + j].set(
                jnp.einsum("ec,ec->e", mom, nvec_j, optimize=True)
            )
        for j in range(njmax_f):
            mom = (c0[j] * wa + c1[j] * wb)
            out = out.at[
                V.hdiv.ndof + jnp.arange(mesh.nedge) * nf_d + j
            ].set(jnp.einsum("ec,ec->e", mom, tau_j, optimize=True))
        if M_int_j is not None:
            wv = c2[:, elverts]  # (2, ne, 3)
            wv6 = jnp.concatenate([wv[0], wv[1]], axis=1)  # (ne, 6) c-major
            ci = jnp.einsum("eiv,ev->ei", M_int_j, wv6, optimize=True)
            out = out.at[int_dofs].set(ci)
        return out

    def TT(x):
        out = jnp.zeros((2, nv), x.dtype)
        for j in range(njmax):
            g = x[jnp.arange(mesh.nedge) * ne_d + j]
            va = c0[j] * g[:, None] * nvec_j
            vb = c1[j] * g[:, None] * nvec_j
            out = out.at[:, edges[:, 0]].add(va.T)
            out = out.at[:, edges[:, 1]].add(vb.T)
        for j in range(njmax_f):
            g = x[V.hdiv.ndof + jnp.arange(mesh.nedge) * nf_d + j]
            va = c0[j] * g[:, None] * tau_j
            vb = c1[j] * g[:, None] * tau_j
            out = out.at[:, edges[:, 0]].add(va.T)
            out = out.at[:, edges[:, 1]].add(vb.T)
        if M_int_j is not None:
            xi = x[int_dofs]  # (ne, n_int)
            gv = jnp.einsum("eiv,ei->ev", M_int_j, xi, optimize=True)  # (ne, 6)
            out = out.at[0, elverts].add(gv[:, :3])
            out = out.at[1, elverts].add(gv[:, 3:])
        return out.reshape(-1)

    return T, TT


def _vector_p1_coarse(mesh, dirichlet: str, dtype=jnp.float64,
                      coefficient: float = 1.0):
    """Exact per-component P1 Laplacian solve (the reference's per-component
    aH1_i + h1amg, NavierStokesSIMPLE_iterative.py:310-357)."""
    from ..precond.twolevel import coarse_p1_solver
    from ..fem.spaces import H1

    space = H1(mesh, 1, dirichlet=dirichlet)
    solve1 = coarse_p1_solver(space, coefficient, dtype)

    def solve(r):
        r2 = r.reshape(2, mesh.nv)
        return jnp.stack([solve1(r2[0]), solve1(r2[1])]).reshape(-1)

    return solve


def hybrid_blocks(V: HybridVelocitySpace, kind: str) -> list[np.ndarray]:
    """Smoother block index sets (free dofs only) for a 2D [HDiv | facet]
    space: ``edgeblock`` = disjoint per-edge + per-cell blocks,
    otherwise overlapping vertex-star patches (all hdiv+facet dofs of
    edges incident to the vertex plus interior dofs of touching
    elements)."""
    mesh = V.mesh
    ne_d, nf_d = V.hdiv.basis.n_edge, V.facet.n_edge
    nc_d = V.hdiv.basis.n_cell
    off_c = mesh.nedge * ne_d
    fmask = V.free_mask
    blocks: list = []
    if kind == "edgeblock":
        for f in range(mesh.nedge):
            blk = list(range(f * ne_d, (f + 1) * ne_d)) + list(
                range(V.hdiv.ndof + f * nf_d, V.hdiv.ndof + (f + 1) * nf_d)
            )
            blocks.append(blk)
        for e in range(mesh.ne):
            blocks.append(list(range(off_c + e * nc_d, off_c + (e + 1) * nc_d)))
    else:
        vblocks: list[list[int]] = [[] for _ in range(mesh.nv)]
        for f, (a, b) in enumerate(mesh.edges.tolist()):
            dofs_f = list(range(f * ne_d, (f + 1) * ne_d)) + list(
                range(V.hdiv.ndof + f * nf_d, V.hdiv.ndof + (f + 1) * nf_d)
            )
            vblocks[a].extend(dofs_f)
            vblocks[b].extend(dofs_f)
        for e, verts in enumerate(mesh.elements.tolist()):
            dofs_e = list(range(off_c + e * nc_d, off_c + (e + 1) * nc_d))
            for v in verts:
                vblocks[v].extend(dofs_e)
        blocks = vblocks
    blocks = [
        np.asarray([d for d in blk if fmask[d]], np.int32) for blk in blocks
    ]
    return [b for b in blocks if len(b)]


def build_hybrid_preconditioner(
    V: HybridVelocitySpace,
    A_loc_np: np.ndarray,
    a_pre: str,
    velocity_dirichlet: str,
    dtype=jnp.float64,
    coarse_coefficient: float = 1.0,
    gs: bool = False,
    A_apply=None,
):
    """A-block preconditioner for [HDiv | facet] systems (shared by the HDG
    Stokes and the condensed MCS Navier-Stokes operator).

    ``jacobi`` | ``edgeblock`` (disjoint per-edge + per-cell blocks) |
    ``vertexstar`` (overlapping vertex patches) | ``auxspace``
    (vertexstar + vector-P1 coarse correction — the reference's MypreA
    structure, NavierStokesSIMPLE_iterative.py:211-391).

    ``gs=True`` switches the block smoother from additive to symmetric
    multi-color block Gauss-Seidel (forward sweep, coarse, backward sweep
    — MypreA.Mult with GS=True, reference :375-381); requires ``A_apply``,
    the masked operator, for the per-color residual updates.
    """
    mesh = V.mesh
    nV = V.ndof
    free = jnp.asarray(V.free_mask)

    if a_pre == "jacobi":
        diag = asm.diagonal_of_local(
            jnp.asarray(A_loc_np, dtype), jnp.asarray(V.element_dofs), nV
        )
        diag = jnp.where(free, diag, 1.0)

        def preA(u):
            return jnp.where(free, u / diag, u)

        return preA

    from ..precond.jacobi import block_jacobi, extract_blocks_from_local

    blocks = hybrid_blocks(V, a_pre)
    dofs, mats = extract_blocks_from_local(
        A_loc_np, V.element_dofs, blocks, nV
    )

    if a_pre == "auxspace":
        T, TT = hybrid_h1_embedding(V, dtype)
        coarse = _vector_p1_coarse(
            mesh, velocity_dirichlet, dtype, coefficient=coarse_coefficient
        )
        coarse_fn = lambda r: T(coarse(TT(r)))
    else:
        coarse_fn = None

    if gs:
        from ..precond.multicolor import (
            MulticolorGS,
            color_blocks,
            damped_coarse,
            symmetric_gs_preconditioner,
        )

        assert A_apply is not None, "gs=True needs the masked operator"
        colors = color_blocks(blocks, nV, V.element_dofs)
        mgs = MulticolorGS(dofs, mats, colors, nV, dtype)
        if coarse_fn is not None:
            rng = np.random.default_rng(7)
            example = jnp.asarray(rng.standard_normal(nV), dtype) * free
            coarse_fn, _, _ = damped_coarse(coarse_fn, A_apply, example)
        return symmetric_gs_preconditioner(mgs, A_apply, coarse_fn, free)

    smooth = block_jacobi(dofs, jnp.asarray(mats, dtype), nV)

    if coarse_fn is not None:

        def preA(u):
            uf = jnp.where(free, u, 0.0)
            y = smooth(uf) + coarse_fn(uf)
            return jnp.where(free, y, u)

    else:

        def preA(u):
            uf = jnp.where(free, u, 0.0)
            return jnp.where(free, smooth(uf), u)

    return preA


def build_hybrid_stokes_system(
    mesh,
    discretization,
    velocity_dirichlet: str = "wall|inlet|cyl",
    uin=None,
    volume_force=default_volume_force,
    alpha: float = 10.0,
    dtype=jnp.float64,
    a_pre: str = "edgeblock",
    geometry=None,
) -> StokesSystem:
    """run.py:114-172 equivalent system builder for the HDG families.

    ``geometry``: optional CurvedGeometry (mesh.Curve(order) equivalent,
    run.py:28) — switches to the isoparametric Piola assembly."""
    V, Q = discretization(mesh, velocity_dirichlet)
    assert isinstance(V, HybridVelocitySpace)
    if geometry is not None:
        A_loc_np, B_loc_np, force_local = assemble_hdg_stokes_curved(
            V, Q, geometry, alpha=alpha
        )
    else:
        A_loc_np, B_loc_np, force_local = assemble_hdg_stokes(V, Q, alpha=alpha)

    eldofs_v = jnp.asarray(V.element_dofs)
    eldofs_p = jnp.asarray(Q.element_dofs)
    A_loc = jnp.asarray(A_loc_np, dtype)
    B_loc = jnp.asarray(B_loc_np, dtype)
    nV, nQ = V.ndof, Q.ndof
    free = jnp.asarray(V.free_mask)

    def A_raw(u):
        return asm.apply_local_matrices(A_loc, eldofs_v, nV, u)

    def A(u):
        uf = jnp.where(free, u, 0.0)
        return jnp.where(free, A_raw(uf), u)

    def B_raw(u):
        ue = u[eldofs_v]
        pe = jnp.einsum("epi,ei->ep", B_loc, ue, optimize=True)
        return asm.scatter_add(pe, eldofs_p, nQ)

    def B(u):
        return B_raw(jnp.where(free, u, 0.0))

    def BT(p):
        pe = p[eldofs_p]
        ue = jnp.einsum("epi,ep->ei", B_loc, pe, optimize=True)
        y = asm.scatter_add(ue, eldofs_v, nV)
        return jnp.where(free, y, 0.0)

    preA = build_hybrid_preconditioner(
        V, A_loc_np, a_pre, velocity_dirichlet, dtype
    )

    # Schur preconditioner: pressure-mass Jacobi ('local', run.py:62)
    tq = asm.make_tables(Q, 2 * max(Q.order, 1), dtype)
    diag_Mp = asm.diagonal_of_local(asm.mass_local(tq), tq.eldofs, nQ)
    preM = lambda p: p / diag_Mp

    # rhs + BC lifting
    f_full = jnp.asarray(force_local(volume_force), dtype)
    f_vec = asm.scatter_add(f_full, eldofs_v, nV)
    if uin is None:
        u_bc = jnp.zeros(nV, dtype)
    else:
        u_bc = jnp.asarray(
            interpolate_hybrid_boundary(V, uin, "inlet"), dtype
        )
    f_mod = jnp.where(free, f_vec - A_raw(u_bc), 0.0)
    g_mod = -B_raw(u_bc)

    return StokesSystem(
        V=V, Q=Q, A=A, B=B, BT=BT, preA=preA, preM=preM,
        f=f_mod, g=g_mod, u_bc=u_bc, ndofs=nV + nQ,
    )


def solve_hybrid(mesh, discretization, solver, **kwargs):
    """run.py:114-172 equivalent driver."""
    from .stokes import default_inlet_profile

    if "uin" not in kwargs:
        kwargs["uin"] = default_inlet_profile()
    system = build_hybrid_stokes_system(mesh, discretization, **kwargs)
    u, p, errors, time, ndofs = solver(system)
    return u, p, errors, time, ndofs
